"""Experiment: Pallas TSDF-integrate chunk kernel with VMEM-resident depth.

The integrate stage's cost is one random depth-image gather per voxel of
every active block (~10 ns/element from HBM, tools/bench_micro.py) plus
row reads/writes.  The whole depth image is 1.2 MB — VMEM-resident — so a
Pallas kernel that keeps it in VMEM and gathers per-block should beat the
HBM latency bound IF Mosaic lowers a vectorized dynamic gather.

Variants (run on TPU; correctness is also checked in interpret mode on
CPU via --interpret):
  A. whole-chunk jnp.take from the flat VMEM image
  B. grid-per-block, (4, 128)-shaped take
  full: complete integrate-chunk kernel (project + gather + fuse) vs the
        XLA `hash_ops._integrate_rows` reference

Usage:  python tools/exp_pallas_integrate.py [--interpret]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

H, W = 480, 640
C = 128          # blocks per chunk
V = 512          # voxels per block
BS = 8
VOXEL = 0.02


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "ravel"):
        leaf = leaf.ravel()[0]  # device-side slice: O(1) transfer
    return float(np.asarray(leaf))


def timeit(name, fn, *args, n=20):
    try:
        sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return False
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return True


# --------------------------------------------------------------------------
# data: a realistic chunk (blocks on a wall at ~1.5-2.5 m)
# --------------------------------------------------------------------------
key = jax.random.PRNGKey(0)
depth = jax.random.uniform(key, (H, W), dtype=jnp.float32) + 1.5
blocks = jnp.stack(
    [
        jax.random.randint(key, (C,), -20, 20),
        jax.random.randint(jax.random.fold_in(key, 1), (C,), -15, 15),
        jax.random.randint(jax.random.fold_in(key, 2), (C,), 8, 15),
    ],
    axis=-1,
).astype(jnp.int32)
tsdf_rows = jnp.zeros((C, V), jnp.float32)
w_rows = jnp.zeros((C, V), jnp.float32)
FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3
TRUNC = 0.1


def _local_offsets():
    i = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0).squeeze(-1)
    return jnp.stack(
        [i % BS, (i // BS) % BS, i // (BS * BS)], axis=-1
    )


def project_indices(blocks):
    """(C, V) clamped flat pixel indices + validity, pure XLA (shared by
    both implementations so only the gather differs)."""
    local = _local_offsets()
    vox = blocks[:, None, :] * BS + local[None]
    world = vox.astype(jnp.float32) * VOXEL
    z = world[..., 2]
    u = jnp.round(world[..., 0] / jnp.maximum(z, 1e-6) * FX + CX).astype(
        jnp.int32
    )
    v = jnp.round(world[..., 1] / jnp.maximum(z, 1e-6) * FY + CY).astype(
        jnp.int32
    )
    in_img = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    flat = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)
    return flat, in_img, z


# --------------------------------------------------------------------------
# XLA reference gather
# --------------------------------------------------------------------------
@jax.jit
def xla_gather(depth, blocks):
    flat, in_img, _ = project_indices(blocks)
    d = depth.reshape(-1)[flat]
    return jnp.where(in_img, d, 0.0)


# --------------------------------------------------------------------------
# A: whole-chunk take inside one kernel invocation
# --------------------------------------------------------------------------
def kernel_take_all(depth_ref, flat_ref, out_ref):
    out_ref[:] = jnp.take(
        depth_ref[:].reshape(-1), flat_ref[:].reshape(-1), axis=0,
        mode="clip" if not INTERPRET else None,
    ).reshape(out_ref.shape)


@jax.jit
def pallas_take_all(depth, blocks):
    flat, in_img, _ = project_indices(blocks)
    d = pl.pallas_call(
        kernel_take_all,
        out_shape=jax.ShapeDtypeStruct((C, V), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(depth, flat)
    return jnp.where(in_img, d, 0.0)


# --------------------------------------------------------------------------
# B: grid over blocks, (4, 128) take per program
# --------------------------------------------------------------------------
def kernel_take_block(depth_ref, flat_ref, out_ref):
    idx = flat_ref[:].reshape(4, 128)
    out_ref[:] = jnp.take(
        depth_ref[:].reshape(-1), idx.reshape(-1), axis=0,
        mode="clip" if not INTERPRET else None,
    ).reshape(1, V)


@jax.jit
def pallas_take_block(depth, blocks):
    flat, in_img, _ = project_indices(blocks)
    d = pl.pallas_call(
        kernel_take_block,
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((C, V), jnp.float32),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, V), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(depth, flat)
    return jnp.where(in_img, d, 0.0)


# --------------------------------------------------------------------------
# full integrate-chunk kernel: project + gather + fuse in one kernel
# --------------------------------------------------------------------------
def kernel_integrate(depth_ref, flatw_ref, tsdf_ref, w_ref,
                     tsdf_out, w_out):
    # flatw packs [flat_idx (int bits); z; valid] prepared outside —
    # here only the gather + fuse run in-kernel
    flat = flatw_ref[0].astype(jnp.int32)
    z = flatw_ref[1].reshape(C, V)
    valid = flatw_ref[2].reshape(C, V) > 0
    d = jnp.take(depth_ref[:].reshape(-1), flat,
                 mode="clip" if not INTERPRET else None).reshape(C, V)
    sdf = d - z
    ok = valid & (d > 0) & (sdf > -TRUNC)
    sdf = jnp.clip(sdf, -TRUNC, TRUNC)
    w_new = jnp.where(ok, 1.0, 0.0)
    old_t, old_w = tsdf_ref[:], w_ref[:]
    w_sum = old_w + w_new
    fused = jnp.where(
        w_new > 0, (old_t * old_w + sdf * w_new) / jnp.maximum(w_sum, 1e-12),
        old_t,
    )
    tsdf_out[:] = fused
    w_out[:] = jnp.minimum(w_sum, 255.0)


@jax.jit
def pallas_integrate(depth, blocks, tsdf_rows, w_rows):
    flat, in_img, z = project_indices(blocks)
    flatw = jnp.stack(
        [flat.astype(jnp.float32).reshape(C * V),
         z.reshape(C * V),
         in_img.astype(jnp.float32).reshape(C * V)]
    )
    return pl.pallas_call(
        kernel_integrate,
        out_shape=(
            jax.ShapeDtypeStruct((C, V), jnp.float32),
            jax.ShapeDtypeStruct((C, V), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
    )(depth, flatw.reshape(3, C, V).reshape(3, C * V), tsdf_rows, w_rows)


@jax.jit
def xla_integrate(depth, blocks, tsdf_rows, w_rows):
    flat, in_img, z = project_indices(blocks)
    d = depth.reshape(-1)[flat]
    sdf = d - z
    ok = in_img & (d > 0) & (sdf > -TRUNC)
    sdf = jnp.clip(sdf, -TRUNC, TRUNC)
    w_new = jnp.where(ok, 1.0, 0.0)
    w_sum = w_rows + w_new
    fused = jnp.where(
        w_new > 0,
        (tsdf_rows * w_rows + sdf * w_new) / jnp.maximum(w_sum, 1e-12),
        tsdf_rows,
    )
    return fused, jnp.minimum(w_sum, 255.0)


def main():
    print("device:", jax.devices()[0].device_kind)
    ref = xla_gather(depth, blocks)
    timeit("XLA gather (C*V from image)", xla_gather, depth, blocks)

    for name, fn in [("pallas take whole-chunk", pallas_take_all),
                     ("pallas take per-block grid", pallas_take_block)]:
        ok = timeit(name, fn, depth, blocks)
        if ok:
            got = fn(depth, blocks)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"  max |err| vs XLA: {err:.2e}")

    r1, r2 = xla_integrate(depth, blocks, tsdf_rows, w_rows)
    timeit("XLA integrate chunk", xla_integrate, depth, blocks, tsdf_rows,
           w_rows)
    ok = timeit("pallas integrate chunk", pallas_integrate, depth, blocks,
                tsdf_rows, w_rows)
    if ok:
        p1, p2 = pallas_integrate(depth, blocks, tsdf_rows, w_rows)
        print("  max |err| tsdf:",
              float(jnp.max(jnp.abs(p1 - r1))),
              " weight:", float(jnp.max(jnp.abs(p2 - r2))))


if __name__ == "__main__":
    main()
