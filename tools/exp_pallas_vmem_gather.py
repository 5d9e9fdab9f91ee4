"""Experiment: vectorized gather from a VMEM-resident image in Pallas.

The integrate loop's dominant cost (trace: ~4.8 ms/frame) is a random
gather of ~65k depth values per chunk from a 1.2 MB image in HBM —
latency-bound at ~10 ns/element.  The image fits in VMEM; if Mosaic can
lower a vectorized dynamic gather from a VMEM ref, the same access costs
VMEM latency instead.

Variants tried (any may fail to lower — that is the data we want):
  A. flat 1D ref, vector index:           out = img_ref[idx]  (via jnp.take)
  B. take_along_axis on a 2D ref
  C. per-row loop of dynamic slices (fori + pl.ds)  — known-lowerable
     baseline, possibly slow
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 480, 640
N = 128 * 512


def _sync(x):
    """Value fetch: jax.block_until_ready is a NO-OP on the axon tunnel."""
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "ravel"):
        leaf = leaf.ravel()[0]  # device-side slice: O(1) transfer
    return float(np.asarray(leaf))


def timeit(name, fn, *args, n=20):
    try:
        _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H * W,), dtype=jnp.float32)
idx = jax.random.randint(key, (N,), 0, H * W)
idx2d = idx.reshape(N // 128, 128)


# XLA baseline
timeit("XLA gather 65k from 307k", jax.jit(lambda i: img[i]), idx)


# A: jnp.take inside kernel, whole image + whole index block in VMEM
def kernel_take(img_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(img_ref[:], idx_ref[:], axis=0)


def pallas_take(i):
    return pl.pallas_call(
        kernel_take,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, i)


timeit("pallas jnp.take flat 65k", jax.jit(pallas_take), idx)


# A2: 2D-shaped output, gather via take on flattened ref
def kernel_take2(img_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(img_ref[:], idx_ref[:], axis=0)


def pallas_take2(i):
    return pl.pallas_call(
        kernel_take2,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, i)


timeit("pallas jnp.take (512,128) idx", jax.jit(pallas_take2), idx2d)


# B: take_along_axis row-gather from (H, W) image: for each output row,
# gather one element per lane — needs 2D indices; try lane-dim gather
img2 = img.reshape(H, W)
r = (idx // W).reshape(N // 128, 128)
c = (idx % W).reshape(N // 128, 128)


def kernel_taa(img_ref, r_ref, c_ref, out_ref):
    flat = r_ref[:] * W + c_ref[:]
    out_ref[:] = jnp.take(img_ref[:].reshape(-1), flat.reshape(-1),
                          axis=0).reshape(out_ref.shape)


def pallas_taa(rr, cc):
    return pl.pallas_call(
        kernel_taa,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img2, rr, cc)


timeit("pallas 2D->flat take", jax.jit(pallas_taa), r, c)

print("\ndevice:", jax.devices()[0].device_kind)
