"""Pallas VMEM-window depth gather for TSDF integration.

The integrate stage's dominant cost is one random depth-image gather per
voxel of every active block.  XLA's gather pays full HBM latency
(~8.4 ns/elem) even though the 640x480 image (1.2 MB) fits in VMEM
(BENCH_NOTES.md).  Mosaic lowers 2D ``take_along_axis`` (sublane / lane
gathers) but NOT 1D ``jnp.take`` ("Only 2D gather is supported"), so the
kernel decomposes each block's 512 pixel reads into:

    1. slice a (WIN, WIN) window of the VMEM-resident image around the
       block's projected footprint (dynamic ``pl.ds`` both dims);
    2. sublane gather: rows = take_along_axis(window, dv, axis=0);
    3. lane gather:    out  = take_along_axis(rows,   du, axis=1).

Voxels whose projection falls outside their block's window (only possible
for blocks closer than ~0.4 m, where the footprint exceeds WIN px) are
masked invalid by the caller via the returned ``in_win``; the XLA path
integrates them, so the Pallas path trades exactness at extreme close
range for the VMEM gather — callers keep the XLA path when
``cfg.use_pallas_gather`` is off (default).

Reference lineage: the depth lookup in integrateDepthMapKernel
(VoxelUtils.cu:799-806), re-expressed for the TPU memory hierarchy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 256        # max image window per block (px); footprint bound z >~ 0.4 m
GROUP = 8        # blocks per grid step (sublane tiling of the index arrays)


def _win(height, width):
    """Window dims: WIN capped by the image (small/test cameras)."""
    return min(WIN, height), min(WIN, width)


def window_origins(v, u, valid, height, width):
    """Per-block window origins + in-window index decomposition.

    v, u: (C, V) int32 pixel coords (already clamped in-image); valid:
    (C, V) bool.  Returns (v0, u0, dv, du, in_win) with dv/du inside the
    window and in_win marking voxels the window covers.  Origins anchor
    the window at the footprint of the VALID voxels (invalid ones carry
    clamped garbage coords that must not stretch the window).
    """
    wh, ww = _win(height, width)
    big_v = jnp.where(valid, v, height)
    big_u = jnp.where(valid, u, width)
    v0 = jnp.clip(jnp.min(big_v, axis=1), 0, max(height - wh, 0))
    u0 = jnp.clip(jnp.min(big_u, axis=1), 0, max(width - ww, 0))
    dv = v - v0[:, None]
    du = u - u0[:, None]
    in_win = (dv >= 0) & (dv < wh) & (du >= 0) & (du < ww)
    dv = jnp.clip(dv, 0, wh - 1)
    du = jnp.clip(du, 0, ww - 1)
    return v0, u0, dv, du, in_win


def _kernel_group(v0_ref, u0_ref, img_ref, dv_ref, du_ref, out_ref):
    """One grid step: GROUP blocks; window slice + 2x take_along_axis per
    block.  dv/du blocks are (GROUP, V); out block is (GROUP, V)."""
    g = pl.program_id(0)
    V = out_ref.shape[-1]
    wh, ww = _win(*img_ref.shape)
    for b in range(GROUP):
        i = g * GROUP + b
        patch = img_ref[pl.ds(v0_ref[i], wh), pl.ds(u0_ref[i], ww)]
        # (1, V) row -> (V, 1) column (relayout), broadcast across lanes
        dv_col = dv_ref[b : b + 1, :].reshape(V, 1)
        du_col = du_ref[b : b + 1, :].reshape(V, 1)
        rows = jnp.take_along_axis(
            patch, jnp.broadcast_to(dv_col, (V, ww)), axis=0
        )
        picked = jnp.take_along_axis(
            rows, jnp.broadcast_to(du_col, (V, ww)), axis=1
        )
        out_ref[b : b + 1, :] = picked[:, 0:1].reshape(1, V)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_depth_window(depth_m, v, u, valid, *, interpret=False):
    """depth_m[v, u] with the image held in VMEM.

    depth_m: (H, W) f32; v, u: (C, V) int32 clamped in-image; valid (C, V)
    bool.  Returns (values (C, V) f32, covered (C, V) bool): ``covered`` is
    ``valid`` minus the (rare, near-range) voxels outside their block's
    window; values are 0 where not covered.
    """
    H, W = depth_m.shape
    C, V = v.shape
    assert C % GROUP == 0, (C, GROUP)
    v0, u0, dv, du, in_win = window_origins(v, u, valid, H, W)

    vals = pl.pallas_call(
        _kernel_group,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C // GROUP,),
            in_specs=[
                pl.BlockSpec((H, W), lambda g, v0, u0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP, V), lambda g, v0, u0: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP, V), lambda g, v0, u0: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((GROUP, V), lambda g, v0, u0: (g, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, V), jnp.float32),
        interpret=interpret,
    )(v0, u0, depth_m, dv, du)

    covered = valid & in_win
    return jnp.where(covered, vals, 0.0), covered


# --------------------------------------------------------------------------
# fallback variant: indices pre-broadcast outside (known-lowerable 3D
# block pattern; ~2x the HBM traffic of the compact kernel, kept for
# hardware where the relayout in _kernel_group does not lower)
# --------------------------------------------------------------------------

def _kernel_streamed(v0_ref, u0_ref, img_ref, dv_ref, du_ref, out_ref):
    b = pl.program_id(0)
    wh, ww = _win(*img_ref.shape)
    patch = img_ref[pl.ds(v0_ref[b], wh), pl.ds(u0_ref[b], ww)]
    rows = jnp.take_along_axis(patch, dv_ref[0], axis=0)
    picked = jnp.take_along_axis(rows, du_ref[0], axis=1)
    # keep V on sublanes (no relayout): lane 0 carries the result, the
    # remaining 127 lanes are redundant copies sliced off by the caller
    out_ref[0] = picked[:, : out_ref.shape[-1]]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_depth_window_streamed(depth_m, v, u, valid, *, interpret=False):
    """Same contract as gather_depth_window; per-block (V, WIN) broadcast
    index arrays are built in XLA and streamed to the kernel."""
    H, W = depth_m.shape
    C, V = v.shape
    v0, u0, dv, du, in_win = window_origins(v, u, valid, H, W)
    wh, ww = _win(H, W)
    dv_b = jnp.broadcast_to(dv[:, :, None], (C, V, ww))
    du_b = jnp.broadcast_to(du[:, :, None], (C, V, ww))

    vals3 = pl.pallas_call(
        _kernel_streamed,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((H, W), lambda b, v0, u0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V, ww), lambda b, v0, u0: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V, ww), lambda b, v0, u0: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, V, min(128, ww)), lambda b, v0, u0: (b, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, V, min(128, ww)), jnp.float32),
        interpret=interpret,
    )(v0, u0, depth_m, dv_b, du_b)
    vals = vals3[..., 0]

    covered = valid & in_win
    return jnp.where(covered, vals, 0.0), covered
