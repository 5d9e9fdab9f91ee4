"""Which 2D gather forms does Mosaic lower, and how fast?

Probe take_along_axis on axis 0 (sublane gather) and axis 1 (lane gather)
inside Pallas TPU kernels, at the shapes the fused integrate kernel needs:
per active block, 512 voxels reading a (R, 256) window of the depth image.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 480, 640


def _sync(x):
    """Value fetch: jax.block_until_ready is a NO-OP on the axon tunnel."""
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "ravel"):
        leaf = leaf.ravel()[0]  # device-side slice: O(1) transfer
    return float(np.asarray(leaf))


def timeit(name, fn, *args, n=50):
    try:
        _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:56s} FAILED: {type(e).__name__}: {str(e)[:100]}")
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W), dtype=jnp.float32)


# ---- form 1: take_along_axis axis=0, indices (512, 256) ----
def k_axis0(img_ref, v_ref, out_ref):
    patch = img_ref[0:256, 0:256]
    out_ref[:] = jnp.take_along_axis(patch, v_ref[:], axis=0)


v_idx = jax.random.randint(key, (512, 256), 0, 256)


def f_axis0(v):
    return pl.pallas_call(
        k_axis0,
        out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, v)


timeit("taa axis=0 (512,256) from (256,256)", jax.jit(f_axis0), v_idx)


# ---- form 2: take_along_axis axis=1 (lane gather), indices (512, 128) ----
def k_axis1(src_ref, u_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], u_ref[:], axis=1)


src = jax.random.uniform(key, (512, 128), dtype=jnp.float32)
u_idx = jax.random.randint(key, (512, 128), 0, 128)


def f_axis1(s, u):
    return pl.pallas_call(
        k_axis1,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, u)


timeit("taa axis=1 (512,128) lanes", jax.jit(f_axis1), src, u_idx)


# ---- form 2b: axis=1 with 256 lanes ----
src256 = jax.random.uniform(key, (512, 256), dtype=jnp.float32)
u256 = jax.random.randint(key, (512, 256), 0, 256)


def k_axis1b(src_ref, u_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], u_ref[:], axis=1)


def f_axis1b(s, u):
    return pl.pallas_call(
        k_axis1b,
        out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, u)


timeit("taa axis=1 (512,256) lanes", jax.jit(f_axis1b), src256, u256)


# ---- form 3: the full two-step per-block gather, 128-block grid ----
# per grid step: window slice (dynamic rows), axis=0 row gather into
# (512, 256), then one lane-gather column pick -> (512,) results.
NB = 128
v0s = jax.random.randint(key, (NB,), 0, H - 256)
u0s = jax.random.randint(key, (NB,), 0, W - 256)
dv = jax.random.randint(key, (NB, 512, 256), 0, 256)
du = jax.random.randint(key, (NB, 512, 256), 0, 256)


def f_full(v0, u0, dvv, duu):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((H, W), lambda b, v0, u0: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 256), lambda b, v0, u0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 256), lambda b, v0, u0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 512, 128), lambda b, v0, u0: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def k(v0_ref, u0_ref, img_ref, dv_ref, du_ref, out_ref):
        b = pl.program_id(0)
        patch = img_ref[pl.ds(v0_ref[b], 256), pl.ds(u0_ref[b], 256)]
        rows = jnp.take_along_axis(patch, dv_ref[0], axis=0)
        out_ref[0] = jnp.take_along_axis(rows, du_ref[0], axis=1)[:, :128]

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((NB, 512, 128), jnp.float32),
        grid_spec=grid_spec,
    )(v0, u0, img, dvv, duu)


timeit("full per-block 2-step gather x128 blocks",
       jax.jit(f_full), v0s, u0s, dv, du, n=20)

print("\ndevice:", jax.devices()[0].device_kind)
