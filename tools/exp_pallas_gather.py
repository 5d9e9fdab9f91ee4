"""Experiment: per-element dynamic gather from a VMEM-resident image.

The SLAM frame is random-gather-bound (tools/bench_micro.py: ~8-10 ns/elem
from HBM), but the depth image is 1.2 MB — VMEM-resident.  This probes
whether Mosaic supports the dynamic row-gather (jnp.take along axis 0)
needed to move those gathers on-chip, and times it against the XLA gather.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 480, 640
R = H * W // 128          # 2400 rows of 128 lanes
M = 1 << 19               # 524288 gathers (the integrate workload)
TILE = 2048               # gathers per grid step


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1000:9.3f} ms")
    return out


key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H * W,), dtype=jnp.float32)
idx = jax.random.randint(key, (M,), 0, H * W)

ref = timeit("XLA gather 524k from 1.2MB (HBM)", jax.jit(lambda i: img[i]), idx)


def gather_kernel(img_ref, idx_ref, out_ref):
    flat = idx_ref[:].reshape(-1)           # (TILE,)
    row = flat // 128
    lane = flat % 128
    rows = jnp.take_along_axis(
        img_ref[:], jnp.broadcast_to(row[:, None], (TILE, 128)), axis=0
    )                                                # (TILE, 128) dyn gather
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1) == lane[:, None]
    )
    out_ref[:] = jnp.sum(
        jnp.where(onehot, rows, 0.0), axis=1
    ).reshape(out_ref.shape)


@jax.jit
def pallas_gather(img, idx):
    img2d = img.reshape(R, 128)
    idx2d = idx.reshape(M // 128, 128)
    return pl.pallas_call(
        gather_kernel,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // 128, 128), jnp.float32),
    )(img2d, idx2d).reshape(-1)


try:
    got = timeit("pallas VMEM gather 524k", pallas_gather, img, idx)
    ok = bool(jnp.all(got == ref[: got.shape[0]]))
    print("correct:", ok)
except Exception as e:
    print("pallas take FAILED:", type(e).__name__, str(e)[:500])
