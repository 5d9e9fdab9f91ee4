"""Pinhole camera projection / back-projection.

Replaces the reference's constant-memory K / K_inv and per-thread
``cam2screenPos`` (reference: CameraTrackingUtils.cu:41-42,122-129) with
vectorized jnp over whole images.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraConfig


def intrinsic_matrix(cam: CameraConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def inv_intrinsic_matrix(cam: CameraConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array(
        [
            [1.0 / cam.fx, 0.0, -cam.cx / cam.fx],
            [0.0, 1.0 / cam.fy, -cam.cy / cam.fy],
            [0.0, 0.0, 1.0],
        ],
        dtype=dtype,
    )


def pixel_rays(cam: CameraConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Unnormalized camera-space ray directions K^-1 [u, v, 1] for every
    pixel; shape (H, W, 3).  Multiplying by depth z gives the camera-space
    vertex (reference: CameraTrackingUtils.cu:69-72)."""
    u = jnp.arange(cam.width, dtype=dtype)
    v = jnp.arange(cam.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    x = (uu - cam.cx) / cam.fx
    y = (vv - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def project(points: jnp.ndarray, cam: CameraConfig):
    """Camera-space points (..., 3) -> continuous pixel coords (..., 2) and
    a validity mask (z > 0, inside image).

    Matches reference cam2screenPos's +0.5 rounding when the result is cast
    to int (CameraTrackingUtils.cu:128); we return floats and let callers
    round.
    """
    z = points[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = points[..., 0] / safe_z * cam.fx + cam.cx
    v = points[..., 1] / safe_z * cam.fy + cam.cy
    valid = (
        (z > 0)
        & (u >= 0)
        & (u <= cam.width - 1)
        & (v >= 0)
        & (v <= cam.height - 1)
    )
    return jnp.stack([u, v], axis=-1), valid


def project_nearest(points: jnp.ndarray, cam: CameraConfig):
    """Like project() but returning int pixel coords by round-to-nearest
    (the reference's ``sp + 0.5`` int cast, CameraTrackingUtils.cu:128)."""
    uv, valid = project(points, cam)
    ij = jnp.round(uv).astype(jnp.int32)
    valid = (
        valid
        & (ij[..., 0] >= 0)
        & (ij[..., 0] < cam.width)
        & (ij[..., 1] >= 0)
        & (ij[..., 1] < cam.height)
    )
    return ij, valid
