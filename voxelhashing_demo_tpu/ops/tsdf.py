"""Dense TSDF volume: Curless-Levoy depth fusion on a regular grid.

This is the config-1 map backend (SURVEY.md section 7 step 4): a plain
dense grid, built before the voxel hash so fusion/raycast numerics are
validated independently of the hash machinery.  The fusion math matches the
reference's ``integrateDepthMapKernel`` (reference: VoxelUtils.cu:789-842):

    sdf   = depth(project(voxel)) - voxel_camera.z
    fuse if sdf > -truncation, clamped to [-truncation, +truncation]
    voxel.sdf    = (old.sdf * old.w + sdf * w_new) / (old.w + w_new)
    voxel.weight = min(max_weight, old.w + w_new)       (VoxelUtils.cu:779-787)

with two deliberate upgrades: the depth-dependent truncation band
(truncation + trunc_scale * depth — declared in the reference at
VoxelUtils.cu:261-264 but dropped in the kernel at :815) and the Niessner
depth-falloff sample weight (commented out in the reference at
VoxelUtils.cu:827, hard-coded 0.1 at :829).

One grid step integrates all voxels in a single fused XLA computation —
there is no occupancy logic here (that's the hash backend, hash_ops.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..config import CameraConfig, DenseGridConfig, FusionConfig
from ..geometry import se3
from ..geometry import camera as cam_geom


class DenseTSDF(NamedTuple):
    """Functional dense TSDF volume state."""

    sdf: jnp.ndarray      # (X, Y, Z) float32, truncated signed distance
    weight: jnp.ndarray   # (X, Y, Z) float32, accumulated confidence
    origin: jnp.ndarray   # (3,) world position of voxel (0,0,0) center
    voxel_size: jnp.ndarray  # () float32


def create_dense(grid: DenseGridConfig, fusion: FusionConfig) -> DenseTSDF:
    dims = grid.dims
    return DenseTSDF(
        sdf=jnp.full(dims, fusion.truncation, dtype=jnp.float32),
        weight=jnp.zeros(dims, dtype=jnp.float32),
        origin=jnp.array(grid.origin, dtype=jnp.float32),
        voxel_size=jnp.float32(fusion.voxel_size),
    )


def voxel_world_positions(state: DenseTSDF) -> jnp.ndarray:
    """World-space centers of every voxel, (X, Y, Z, 3)."""
    X, Y, Z = state.sdf.shape
    ix = jnp.arange(X, dtype=jnp.float32)[:, None, None]
    iy = jnp.arange(Y, dtype=jnp.float32)[None, :, None]
    iz = jnp.arange(Z, dtype=jnp.float32)[None, None, :]
    grid = jnp.stack(jnp.broadcast_arrays(ix, iy, iz), axis=-1)
    return state.origin + grid * state.voxel_size


def sample_weight(
    depth: jnp.ndarray, cam: CameraConfig, fusion: FusionConfig
) -> jnp.ndarray:
    """Per-observation fusion weight.

    With depth_weight_falloff, implements the Niessner noise model the
    reference left commented (VoxelUtils.cu:827): closer depth -> higher
    confidence, floored at 1.
    """
    if not fusion.depth_weight_falloff:
        return jnp.full_like(depth, fusion.weight_sample)
    depth01 = jnp.clip(
        (depth - cam.depth_min) / (cam.depth_max - cam.depth_min), 0.0, 1.0
    )
    return jnp.maximum(fusion.weight_sample * 1.5 * (1.0 - depth01), 1.0)


def integrate_dense(
    state: DenseTSDF,
    depth_m: jnp.ndarray,
    T_wc: jnp.ndarray,
    cam: CameraConfig,
    fusion: FusionConfig,
) -> DenseTSDF:
    """Fuse one metric depth map taken at camera-to-world pose ``T_wc``.

    Vectorized over the whole volume; replaces the reference's
    one-CUDA-block-per-visible-block launch (VoxelUtils.cu:844-852) for the
    dense backend.
    """
    world = voxel_world_positions(state)                  # (X, Y, Z, 3)
    pc = se3.apply(se3.inverse(T_wc), world)              # camera frame
    ij, in_img = cam_geom.project_nearest(pc, cam)

    u = jnp.clip(ij[..., 0], 0, cam.width - 1)
    v = jnp.clip(ij[..., 1], 0, cam.height - 1)
    depth = depth_m[v, u]                                 # (X, Y, Z) gather

    z = pc[..., 2]
    sdf = depth - z
    trunc = fusion.truncation + fusion.trunc_scale * depth
    valid = in_img & (depth > 0) & (z > 0) & (sdf > -trunc)
    sdf = jnp.clip(sdf, -trunc, trunc)

    w_new = jnp.where(valid, sample_weight(depth, cam, fusion), 0.0)
    w_old = state.weight
    w_sum = w_old + w_new
    fused = jnp.where(
        w_sum > 0, (state.sdf * w_old + sdf * w_new) / jnp.maximum(w_sum, 1e-12),
        state.sdf,
    )
    return state._replace(
        sdf=jnp.where(valid, fused, state.sdf),
        weight=jnp.where(valid, jnp.minimum(w_sum, fusion.max_weight), w_old),
    )


def trilinear_sample(
    state: DenseTSDF, pos_world: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinearly interpolated (sdf, weight) at world positions (..., 3).

    Out-of-volume samples return weight 0 (unknown).  The reference's GLSL
    raycaster sampled nearest-neighbor (raycastSDF.frag:91-118); trilinear
    is required for sub-voxel surface localization.
    """
    g = (pos_world - state.origin) / state.voxel_size     # continuous voxel
    base = jnp.floor(g).astype(jnp.int32)                 # (..., 3)
    frac = g - base

    dims = jnp.array(state.sdf.shape, dtype=jnp.int32)
    inside = jnp.all((base >= 0) & (base + 1 <= dims - 1), axis=-1)
    b = jnp.clip(base, 0, dims - 2)

    def gather(dx, dy, dz):
        i = b[..., 0] + dx
        j = b[..., 1] + dy
        k = b[..., 2] + dz
        return state.sdf[i, j, k], state.weight[i, j, k]

    acc_s = 0.0
    acc_w = 0.0
    min_w = jnp.inf
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                s, w = gather(dx, dy, dz)
                wt = (
                    (frac[..., 0] if dx else 1 - frac[..., 0])
                    * (frac[..., 1] if dy else 1 - frac[..., 1])
                    * (frac[..., 2] if dz else 1 - frac[..., 2])
                )
                acc_s = acc_s + wt * s
                acc_w = acc_w + wt * w
                min_w = jnp.minimum(min_w, w)

    # a corner with zero weight means the interpolation crosses unknown
    # space; report weight 0 so the raycaster treats it as unobserved
    known = inside & (min_w > 0)
    return jnp.where(known, acc_s, 0.0), jnp.where(known, acc_w, 0.0)


def sdf_gradient(state: DenseTSDF, pos_world: jnp.ndarray) -> jnp.ndarray:
    """Central-difference SDF gradient (world frame) at (..., 3) positions."""
    h = state.voxel_size
    grads = []
    for axis in range(3):
        e = jnp.zeros((3,), dtype=jnp.float32).at[axis].set(h)
        sp, _ = trilinear_sample(state, pos_world + e)
        sm, _ = trilinear_sample(state, pos_world - e)
        grads.append((sp - sm) / (2.0 * h))
    return jnp.stack(grads, axis=-1)
