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


@partial(jax.jit, static_argnames=("disparity_quant",))
def add_sensor_noise(
    depth_m: jnp.ndarray,
    key: jnp.ndarray,
    disparity_quant: bool = False,
) -> jnp.ndarray:
    """Kinect-class sensor noise on clean metric depth.

    The reference's entire workload is real Kinect/TUM depth (reference:
    common.h:7-18 TUM fr1 intrinsics, CameraTrackingUtils.cu:64 the 5000
    units/m convention) but it ships no data; this models the sensor so the
    analytic scenes exercise the robust frontend the way fr1 frames would:

    - **Axial noise** sigma(z) = 1.2 mm + 1.9 mm * (z - 0.4)^2 — the
      Kinect axial-error fit of Nguyen, Izadi & Lovell 2012 (quadratic in
      depth, as the disparity model of Khoshelham & Elberink 2012 predicts).
    - **Edge dropout**: pixels whose 3x3 neighborhood spans a depth
      discontinuity (> 10 cm) drop out with high probability — the
      structured-light shadowing that fringes every TUM object.
    - **Random dropout** (~1 %) — dead/low-confidence pixels.
    - **Outliers** (~0.2 %): flying pixels resampled uniformly in range.
    - **Disparity quantization** (``disparity_quant``, off by default):
      the Kinect v1 measures disparity in 1/8-pixel steps over a 75 mm
      baseline at fx~580, so depth is quantized to Delta z ~ z^2/348 m
      (Khoshelham & Elberink 2012) — the characteristic ~1 cm banding at
      2 m that real TUM fr1 frames show.  Off by default to keep the
      established noise benchmarks comparable; the committed PNG16 depth
      fixtures (tests/fixtures/) turn it on for full sensor statistics.
    - Quantization to uint16 / 5000 happens in ``depth_to_raw`` as before.

    Returns metric depth with 0 = invalid.  Deterministic in ``key``.
    """
    sigma_base, sigma_quad = 1.2e-3, 1.9e-3
    edge_band, p_edge = 0.10, 0.8
    p_drop, p_outlier = 0.01, 0.002
    k_ax, k_edge, k_drop, k_out, k_outz = jax.random.split(key, 5)

    valid = depth_m > 0
    z = depth_m
    sigma = sigma_base + sigma_quad * jnp.square(jnp.maximum(z - 0.4, 0.0))
    z = z + sigma * jax.random.normal(k_ax, z.shape, dtype=jnp.float32)

    # 3x3 local depth range on the CLEAN depth (invalid pixels count as
    # discontinuity too: a valid pixel beside a hole is an edge pixel)
    big = jnp.where(valid, depth_m, jnp.inf)
    mn = -jax.lax.reduce_window(
        -big, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    mx = jax.lax.reduce_window(
        jnp.where(valid, depth_m, -jnp.inf), -jnp.inf, jax.lax.max,
        (3, 3), (1, 1), "SAME",
    )
    at_edge = ~jnp.isfinite(mn) | ((mx - mn) > edge_band)

    u_edge = jax.random.uniform(k_edge, z.shape)
    u_drop = jax.random.uniform(k_drop, z.shape)
    drop = (at_edge & (u_edge < p_edge)) | (u_drop < p_drop)

    u_out = jax.random.uniform(k_out, z.shape)
    z_out = jax.random.uniform(k_outz, z.shape, minval=0.4, maxval=4.0)
    z = jnp.where(u_out < p_outlier, z_out, z)

    if disparity_quant:
        # disparity d = 8*b*f/z in 1/8-px units; round and invert
        bf8 = 8.0 * 0.075 * 580.0
        d8 = jnp.round(bf8 / jnp.maximum(z, 1e-3))
        z = jnp.where(z > 0, bf8 / jnp.maximum(d8, 1.0), z)

    return jnp.where(valid & ~drop, jnp.maximum(z, 0.0), 0.0)


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
    noise_seed: int | None = None,
):
    """Generate (depths, poses): a synthetic depth sequence and its exact
    camera-to-world ground truth.  depths is a list of (H, W) arrays
    (uint16 raw if as_raw else float32 meters); poses a list of (4, 4).
    ``noise_seed`` applies the Kinect-class sensor model (add_sensor_noise)
    per frame."""
    depths, poses = [], []
    key = None if noise_seed is None else jax.random.PRNGKey(noise_seed)
    for i in range(num_frames):
        t = i / max(num_frames - 1, 1)
        T = orbit_pose(t, trans_amp, rot_amp_deg)
        d = render_depth(jnp.asarray(T), cam)
        if key is not None:
            key, sub = jax.random.split(key)
            d = add_sensor_noise(d, sub)
        depths.append(depth_to_raw(d, cam) if as_raw else d)
        poses.append(T)
    return depths, poses


def _rot_y(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def room_sweep_pose(t: float, sweep_deg: float = 360.0,
                    orbit_radius: float = 0.5, bob: float = 0.08
                    ) -> np.ndarray:
    """Camera-to-world pose at phase t in [0, 1] of a room-scale sweep:
    the camera circles the center of ``room_sdf``'s room on a small orbit,
    yawing with the orbit so it always faces across the room, with a
    gentle vertical bob for full 6-dof excitation."""
    a = np.deg2rad(sweep_deg) * t
    R = _rot_y(a)
    center = np.array([0.0, -0.05, 1.0])   # mid-room (+y is down)
    # camera sits behind the center along its own -z, so it looks across
    pos = center - orbit_radius * (R @ np.array([0.0, 0.0, 1.0]))
    pos[1] += bob * np.sin(2 * a)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = pos
    return T


def make_room_sweep(
    cam: CameraConfig,
    num_frames: int,
    sweep_deg: float = 360.0,
    as_raw: bool = True,
    noise_seed: int | None = None,
):
    """Room-scale growing-map workload (BASELINE configs 3/5 regime): a
    ``sweep_deg`` pan of ``room_sdf`` from a small central orbit.  The map
    grows for the whole sweep (new walls keep entering the frustum), unlike
    ``make_sequence`` whose scene is fully observed after a few frames.
    With ``noise_seed``, frames carry Kinect-class sensor noise.

    Returned poses are FIRST-CAMERA-relative (pose[0] == I), matching the
    SLAM convention that the world frame is the first camera frame."""
    depths, poses = [], []
    key = None if noise_seed is None else jax.random.PRNGKey(noise_seed)
    T0_inv = np.linalg.inv(room_sweep_pose(0.0, sweep_deg))
    for i in range(num_frames):
        T = room_sweep_pose(i / max(num_frames, 1), sweep_deg)
        d = render_depth(jnp.asarray(T), cam, sdf=room_sdf)
        if key is not None:
            key, sub = jax.random.split(key)
            d = add_sensor_noise(d, sub)
        depths.append(depth_to_raw(d, cam) if as_raw else d)
        poses.append((T0_inv @ T).astype(np.float32))
    return depths, poses
