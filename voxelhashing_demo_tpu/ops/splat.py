"""Splat raycasting: surface prediction by voxel projection, not marching.

The reference's renderer design rasterizes visible-block cubes into
front/back depth textures and then DDA-marches per fragment
(reference: notes.md:3-16, raycastSDF.frag:121-177) — and never worked
(README.md:4-5).  A per-step marcher is also the wrong shape for TPU: every
sampling step is a random HBM gather pass (~10 ns/element, measured), so
96 steps x 8 trilinear corners over 307k rays costs seconds.

This module replaces marching with **projective splatting**, the
rasterization idea taken to its TPU-native conclusion:

1. gather the visible blocks' TSDF rows (contiguous row gather — fast);
2. for every voxel in the surface band (weight > 0, |sdf| < band), project
   its center into the camera and compute the *exact* surface depth along
   that pixel's ray: the TSDF is projective (sdf = depth - z, see
   ops/tsdf.py), so the surface under the voxel sits at  z_surf = z + sdf —
   sub-voxel accuracy from a single value, no interpolation;
3. ``scatter-min`` the estimates into the depth buffer (one deterministic
   scatter pass — the TPU analog of depth-test rasterization);
4. close residual pinholes with a valid-aware 3x3 min fill + one
   edge-preserving smoothing pass (pure VPU image ops);
5. normals by central differences on the vertex map, exactly like the
   depth frontend (ops/preprocess.py), so model normals and frame normals
   share one convention for ICP.

Cost: one row gather + one scatter pass + elementwise — ~25 ms at
640x480 with 4k visible blocks, vs ~8 s for the trilinear marcher.
The dense marcher (ops/raycast.py) remains the high-quality offline
renderer and the semantics reference in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import CameraConfig, FusionConfig, HashConfig, RaycastConfig
from ..geometry import coords, se3
from .hash_ops import ActiveSet, HashMap, FREE_PTR, _local_offsets
from .preprocess import compute_normals
from .raycast import RaycastOutput
from ..geometry import camera as cam_geom


def _min_fill(depth: jnp.ndarray, rounds: int) -> jnp.ndarray:
    """Fill invalid (0) pixels with the 3x3 neighborhood minimum of valid
    ones; ``rounds`` dilation passes.  Valid pixels are left untouched."""
    for _ in range(rounds):
        big = jnp.where(depth > 0, depth, jnp.inf)
        neigh = -jax.lax.reduce_window(
            -big,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding="SAME",
        )
        fill = jnp.where(jnp.isfinite(neigh), neigh, 0.0)
        depth = jnp.where(depth > 0, depth, fill)
    return depth


def _edge_preserving_smooth(
    depth: jnp.ndarray, sigma_z: float
) -> jnp.ndarray:
    """One 3x3 averaging pass over valid neighbors within ``sigma_z`` of the
    center depth — knocks down splat quantization noise without blurring
    across depth discontinuities.  Pure shifted adds (VPU)."""
    acc = jnp.zeros_like(depth)
    cnt = jnp.zeros_like(depth)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            n = jnp.roll(depth, (dy, dx), axis=(0, 1))
            ok = (n > 0) & (jnp.abs(n - depth) < sigma_z)
            acc = acc + jnp.where(ok, n, 0.0)
            cnt = cnt + ok.astype(depth.dtype)
    return jnp.where((depth > 0) & (cnt > 0), acc / jnp.maximum(cnt, 1.0),
                     depth)


def splat_depth_estimates(
    blocks: jnp.ndarray,      # (A, 3) block coords
    sdf_rows: jnp.ndarray,    # (A, V)
    w_rows: jnp.ndarray,      # (A, V)
    row_valid: jnp.ndarray,   # (A,)
    cfg: HashConfig,
    T_wc: jnp.ndarray,
    cam: CameraConfig,
    rc: RaycastConfig,
    fusion: FusionConfig,
    count: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scatter per-voxel surface-depth estimates into a (H, W) z-buffer.

    Exposed on explicit rows so the multi-chip path can splat each device's
    shard locally and ``pmin`` the depth buffers (parallel/sharded.py).
    With ``count`` given, rows are processed in fixed-size chunks inside a
    dynamic-trip-count loop (cost follows real occupancy, not padding —
    same trick as hash_ops.integrate).  Returns raw splat depth (0 = none).
    """
    A = blocks.shape[0]
    C = min(cfg.integrate_chunk, A)
    while A % C:
        C //= 2
    if count is not None and C < A:
        # the buffer and index derive from device-varying inputs so the
        # while_loop carry has a consistent varying type under shard_map
        zbuf = jnp.full((cam.height * cam.width + 1,), jnp.inf,
                        dtype=jnp.float32) + 0.0 * sdf_rows[0, 0]

        def cond(carry):
            i, _ = carry
            return i * C < count

        def body(carry):
            i, zb = carry
            b = jax.lax.dynamic_slice(blocks, (i * C, 0), (C, 3))
            s = jax.lax.dynamic_slice(sdf_rows, (i * C, 0),
                                      (C, sdf_rows.shape[1]))
            w = jax.lax.dynamic_slice(w_rows, (i * C, 0),
                                      (C, w_rows.shape[1]))
            v = jax.lax.dynamic_slice(row_valid, (i * C,), (C,))
            zb = _splat_rows_into(zb, b, s, w, v, cfg, T_wc, cam, rc,
                                  fusion)
            return (i + 1, zb)

        _, zbuf = jax.lax.while_loop(cond, body, (count * 0, zbuf))
        depth = zbuf[:-1].reshape(cam.height, cam.width)
        return jnp.where(jnp.isfinite(depth), depth, 0.0)

    zbuf = jnp.full((cam.height * cam.width + 1,), jnp.inf, dtype=jnp.float32)
    zbuf = _splat_rows_into(zbuf, blocks, sdf_rows, w_rows, row_valid, cfg,
                            T_wc, cam, rc, fusion)
    depth = zbuf[:-1].reshape(cam.height, cam.width)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)


def splat_depth_from_map(
    hmap: HashMap,
    active: ActiveSet,
    cfg: HashConfig,
    T_wc: jnp.ndarray,
    cam: CameraConfig,
    rc: RaycastConfig,
    fusion: FusionConfig,
) -> jnp.ndarray:
    """Chunked splat that gathers TSDF rows per chunk — only
    ceil(count/chunk) chunks' worth of rows are ever read from HBM, not the
    whole max_active padding."""
    A = active.ptrs.shape[0]
    C = min(cfg.integrate_chunk, A)
    while A % C:
        C //= 2
    if C == A:
        safe = jnp.clip(active.ptrs, 0, hmap.tsdf.shape[0] - 1)
        return splat_depth_estimates(
            active.blocks, hmap.tsdf[safe], hmap.weight[safe],
            active.ptrs != FREE_PTR, cfg, T_wc, cam, rc, fusion,
        )

    zbuf = jnp.full((cam.height * cam.width + 1,), jnp.inf,
                    dtype=jnp.float32) + 0.0 * hmap.tsdf[0, 0]

    def cond(carry):
        i, _ = carry
        return i * C < active.count

    def body(carry):
        i, zb = carry
        b = jax.lax.dynamic_slice(active.blocks, (i * C, 0), (C, 3))
        ptrs = jax.lax.dynamic_slice(active.ptrs, (i * C,), (C,))
        safe = jnp.clip(ptrs, 0, hmap.tsdf.shape[0] - 1)
        zb = _splat_rows_into(
            zb, b, hmap.tsdf[safe], hmap.weight[safe], ptrs != FREE_PTR,
            cfg, T_wc, cam, rc, fusion,
        )
        return (i + 1, zb)

    _, zbuf = jax.lax.while_loop(cond, body, (active.count * 0, zbuf))
    depth = zbuf[:-1].reshape(cam.height, cam.width)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)


def _splat_rows_into(
    zbuf: jnp.ndarray,        # (H*W + 1,) running min buffer (+inf init)
    blocks: jnp.ndarray,
    sdf_rows: jnp.ndarray,
    w_rows: jnp.ndarray,
    row_valid: jnp.ndarray,
    cfg: HashConfig,
    T_wc: jnp.ndarray,
    cam: CameraConfig,
    rc: RaycastConfig,
    fusion: FusionConfig,
) -> jnp.ndarray:
    local = _local_offsets(cfg.block_size)                      # (V, 3)
    vox = coords.block2voxel(blocks, cfg.block_size)[:, None, :] + local
    world = coords.voxel2world(vox, fusion.voxel_size)          # (A, V, 3)
    T_cw = se3.inverse(T_wc)
    pc = world @ T_cw[:3, :3].T + T_cw[:3, 3]                   # (A, V, 3)

    z = pc[..., 2]
    band = rc.splat_band * fusion.voxel_size
    surf = (
        row_valid[:, None]
        & (w_rows > 0)
        & (jnp.abs(sdf_rows) < band)
        & (z > rc.near)
        & (z < rc.far)
    )

    # the TSDF is projective (sdf = depth - z): the measured surface along
    # this voxel's viewing ray is exactly at z + sdf
    z_surf = z + sdf_rows

    ij, in_img = cam_geom.project_nearest(pc, cam)
    ok = surf & in_img & (z_surf > rc.near) & (z_surf < rc.far)
    flat = ij[..., 1] * cam.width + ij[..., 0]
    flat = jnp.where(ok, flat, cam.height * cam.width)          # OOB -> drop

    return zbuf.at[flat.reshape(-1)].min(
        jnp.where(ok, z_surf, jnp.inf).reshape(-1), mode="drop"
    )


def finalize_depth(
    depth: jnp.ndarray,
    cam: CameraConfig,
    rc: RaycastConfig,
    fusion: FusionConfig,
) -> RaycastOutput:
    """Hole fill + smoothing + vertex/normal maps from a raw splat buffer."""
    depth = _min_fill(depth, rc.splat_fill_rounds)
    depth = _edge_preserving_smooth(
        depth, rc.splat_smooth_sigma * fusion.voxel_size
    )
    rays = cam_geom.pixel_rays(cam)
    points = rays * depth[..., None]
    normals = compute_normals(points)
    hit = depth > 0
    return RaycastOutput(
        depth=depth,
        points=jnp.where(hit[..., None], points, 0.0),
        normals=normals,
        hit=hit,
    )


def surface_filter(
    hmap: HashMap, active: ActiveSet, band: float
) -> ActiveSet:
    """Compact the active set down to blocks that contain at least one
    surface-band voxel (``hmap.band_min`` < band, maintained by
    integrate/insert/restore).

    Bit-exact for splatting: a filtered-out block has no voxel satisfying
    ``weight > 0 & |sdf| < band``, so it contributes zero scatter updates
    either way — the filter only removes their (masked but still paid,
    ~12 ns/update) scatter traffic and row gathers."""
    A = active.ptrs.shape[0]
    safe = jnp.clip(active.ptrs, 0, hmap.band_min.shape[0] - 1)
    live = (active.ptrs != FREE_PTR) & (hmap.band_min[safe] < band)
    rank = jnp.cumsum(live.astype(jnp.int32)) - 1
    idx = jnp.where(live, rank, A)
    blocks = jnp.zeros_like(active.blocks).at[idx].set(
        active.blocks, mode="drop"
    )
    ptrs = jnp.full_like(active.ptrs, FREE_PTR).at[idx].set(
        active.ptrs, mode="drop"
    )
    return ActiveSet(blocks=blocks, ptrs=ptrs,
                     count=jnp.sum(live.astype(jnp.int32)))


@partial(jax.jit, static_argnames=("cfg", "cam", "rc", "fusion"))
def splat_raycast(
    hmap: HashMap,
    active: ActiveSet,
    cfg: HashConfig,
    T_wc: jnp.ndarray,
    cam: CameraConfig,
    rc: RaycastConfig,
    fusion: FusionConfig,
) -> RaycastOutput:
    """Surface prediction of the hashed TSDF from pose ``T_wc`` (the fast
    frame-to-model path; chunked row gathers + scatter, no marching)."""
    surf = surface_filter(hmap, active, rc.splat_band * fusion.voxel_size)
    depth = splat_depth_from_map(hmap, surf, cfg, T_wc, cam, rc, fusion)
    return finalize_depth(depth, cam, rc, fusion)
