"""Synthetic depth-sequence generation with exact ground truth.

The reference ships no test data (its two hard-coded assets T0/T1.png are
not even in the repo, reference: Application.cpp:28-29) and no tests.  This
module renders depth maps of an analytic SDF scene by sphere tracing, giving
sequences with *exact* ground-truth trajectories and geometry for:

- golden tests of ICP (recover a known transform),
- golden tests of fusion + raycast (reconstruct an analytic scene),
- end-to-end ATE-checked pipeline tests,
- the benchmark workload (TUM-format 640x480 @ 5000 units/m).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig
from ..geometry import se3
from ..geometry import camera as cam_geom


def scene_sdf(p: jnp.ndarray) -> jnp.ndarray:
    """Analytic scene: a sphere, a box, and a back wall, in the world frame
    (= first camera frame; +z into the scene, +y down).  (..., 3) -> (...)."""
    # sphere
    d_sphere = jnp.linalg.norm(p - jnp.array([0.0, 0.1, 1.6]), axis=-1) - 0.35
    # axis-aligned box at the right
    q = jnp.abs(p - jnp.array([0.55, 0.25, 1.9])) - jnp.array([0.22, 0.3, 0.22])
    d_box = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )
    # back wall at z = 2.6 and floor at y = 0.62
    d_wall = 2.6 - p[..., 2]
    d_floor = 0.62 - p[..., 1]
    return jnp.minimum(jnp.minimum(d_sphere, d_box), jnp.minimum(d_wall, d_floor))


def room_sdf(p: jnp.ndarray) -> jnp.ndarray:
    """Room-scale analytic scene: a 4 x 2 x 4 m room interior (+y down,
    camera starts inside looking +z) furnished with a pillar, spheres and
    boxes on every side — enough structure that a full 360-degree sweep
    keeps ICP well-conditioned while the map grows to thousands of blocks
    (the workload BASELINE configs 3/5 imply).  (..., 3) -> (...)."""

    def box(center, half):
        q = jnp.abs(p - jnp.array(center)) - jnp.array(half)
        return jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
            jnp.max(q, axis=-1), 0.0
        )

    def sphere(center, r):
        return jnp.linalg.norm(p - jnp.array(center), axis=-1) - r

    d_room = -box([0.0, -0.2, 1.0], [2.0, 1.0, 2.0])   # interior
    d = jnp.minimum(d_room, box([1.45, 0.15, 2.2], [0.25, 0.65, 0.25]))
    d = jnp.minimum(d, sphere([-1.35, 0.45, 1.6], 0.35))
    d = jnp.minimum(d, box([-0.9, 0.45, -0.35], [0.3, 0.35, 0.3]))
    d = jnp.minimum(d, sphere([0.7, 0.5, -0.2], 0.3))
    d = jnp.minimum(d, box([0.1, 0.65, 2.35], [0.5, 0.15, 0.3]))
    d = jnp.minimum(d, sphere([1.5, 0.55, 0.4], 0.25))
    return d


@partial(jax.jit, static_argnames=("cam", "max_steps", "sdf"))
def render_depth(
    T_wc: jnp.ndarray,
    cam: CameraConfig,
    max_steps: int = 128,
    sdf=scene_sdf,
) -> jnp.ndarray:
    """Sphere-trace an analytic scene (``sdf``, a module-level function —
    jit-static) from camera-to-world pose ``T_wc``; returns metric z-depth
    (H, W), 0 where no hit within range."""
    rays_cam = cam_geom.pixel_rays(cam)
    R = T_wc[:3, :3]
    origin = T_wc[:3, 3]
    dirs = rays_cam @ R.T
    inv_len = 1.0 / jnp.linalg.norm(dirs, axis=-1)

    def body(_, carry):
        t, hit = carry
        pos = origin + dirs * t[..., None]
        s = sdf(pos)
        hit = hit | (s < 1e-4)
        t = jnp.where(hit, t, t + jnp.maximum(s, 1e-4) * inv_len)
        return (t, hit)

    H, W = rays_cam.shape[:2]
    t0 = jnp.full((H, W), 0.05, dtype=jnp.float32)
    t, hit = jax.lax.fori_loop(
        0, max_steps, body, (t0, jnp.zeros((H, W), dtype=bool))
    )
    valid = hit & (t > cam.depth_min) & (t < cam.depth_max)
    return jnp.where(valid, t, 0.0)


def depth_to_raw(depth_m: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Metric depth -> TUM-style uint16 units (quantized, like a real
    sensor)."""
    return jnp.round(depth_m * cam.depth_scale).astype(jnp.uint16)


def orbit_pose(t: float, trans_amp: float = 0.15, rot_amp_deg: float = 6.0) -> np.ndarray:
    """Smooth ground-truth trajectory: slow sway + look-rotation, phase t in
    [0, 1].  Returned as numpy (host-side trajectory generation)."""
    rot_amp = np.deg2rad(rot_amp_deg)
    v = np.array(
        [
            trans_amp * np.sin(2 * np.pi * t),
            0.5 * trans_amp * np.sin(4 * np.pi * t),
            0.3 * trans_amp * (1 - np.cos(2 * np.pi * t)),
        ]
    )
    w = np.array(
        [
            0.4 * rot_amp * np.sin(2 * np.pi * t),
            rot_amp * np.sin(2 * np.pi * t),
            0.2 * rot_amp * np.cos(2 * np.pi * t) - 0.2 * rot_amp,
        ]
    )
    xi = jnp.asarray(np.concatenate([v, w]), dtype=jnp.float32)
    return np.asarray(se3.exp(xi))


def make_ramp_sequence(
    cam: CameraConfig,
    num_frames: int,
    max_trans_step: float = 0.04,
    max_rot_step_deg: float = 2.0,
    as_raw: bool = True,
):
    """Accelerating-motion sequence: per-frame motion ramps linearly from
    ~0 up to (max_trans_step m, max_rot_step_deg deg) along a FIXED screw
    direction.  The hard case for identity-initialized ICP (per-frame
    motion eventually exceeds its convergence basin) and the canonical
    demonstration of the constant-velocity prior, whose prediction error
    is only the per-frame acceleration."""
    v_dir = np.array([0.7, 0.25, 0.35])
    v_dir /= np.linalg.norm(v_dir)
    w_dir = np.array([0.15, 1.0, 0.1])
    w_dir /= np.linalg.norm(w_dir)
    depths, poses = [], []
    T = np.eye(4, dtype=np.float32)
    for i in range(num_frames):
        if i > 0:
            ramp = i / max(num_frames - 1, 1)
            xi = np.concatenate(
                [
                    ramp * max_trans_step * v_dir,
                    ramp * np.deg2rad(max_rot_step_deg) * w_dir,
                ]
            )
            delta = np.asarray(se3.exp(jnp.asarray(xi, dtype=jnp.float32)))
            T = T @ delta
        d = render_depth(jnp.asarray(T), cam)
        depths.append(depth_to_raw(d, cam) if as_raw else d)
        poses.append(T.copy())
    return depths, poses


def make_sequence(
    cam: CameraConfig,
    num_frames: int,
    trans_amp: float = 0.12,
    rot_amp_deg: float = 5.0,
    as_raw: bool = True,
):
    """Generate (depths, poses): a synthetic depth sequence and its exact
    camera-to-world ground truth.  depths is a list of (H, W) arrays
    (uint16 raw if as_raw else float32 meters); poses a list of (4, 4)."""
    depths, poses = [], []
    for i in range(num_frames):
        t = i / max(num_frames - 1, 1)
        T = orbit_pose(t, trans_amp, rot_amp_deg)
        d = render_depth(jnp.asarray(T), cam)
        depths.append(depth_to_raw(d, cam) if as_raw else d)
        poses.append(T)
    return depths, poses
