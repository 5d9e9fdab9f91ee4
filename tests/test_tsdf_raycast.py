"""Golden tests for dense TSDF fusion + sphere-traced raycast: fuse depth
maps of the analytic scene, then verify the raycast reproduces the scene's
depth (the loop the reference never closed — its raycaster was broken,
reference: README.md:4-5)."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import (
    CameraConfig,
    DenseGridConfig,
    FusionConfig,
    RaycastConfig,
)
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.ops import raycast as rc_ops
from voxelhashing_demo_tpu.ops import tsdf as tsdf_ops
from voxelhashing_demo_tpu.utils import synthetic

CAM = CameraConfig(width=160, height=120, fx=129.3, fy=129.1, cx=79.65,
                   cy=59.8)
FUS = FusionConfig(voxel_size=0.02, truncation=0.08)
GRID = DenseGridConfig(dims=(160, 128, 160), origin=(-1.6, -0.7, 0.0))
RC = RaycastConfig(max_steps=128)


def test_integrate_plane_sdf_values():
    # fuse a frontoparallel wall at z=2.0; voxels in front should have
    # sdf ~ (2.0 - z), behind ~ negative, truncated
    depth = jnp.full((CAM.height, CAM.width), 2.0, dtype=jnp.float32)
    state = tsdf_ops.create_dense(GRID, FUS)
    state = tsdf_ops.integrate_dense(state, depth, se3.identity(), CAM, FUS)

    # sample along the optical axis: world (0, 0, z)
    zs = jnp.array([1.90, 1.96, 1.98, 2.0, 2.02, 2.04])
    pts = jnp.stack([jnp.zeros_like(zs), jnp.zeros_like(zs), zs], axis=-1)
    sdf, w = tsdf_ops.trilinear_sample(state, pts)
    expected = jnp.clip(2.0 - zs, -FUS.truncation - FUS.trunc_scale * 2.0,
                        FUS.truncation + FUS.trunc_scale * 2.0)
    np.testing.assert_allclose(sdf, expected, atol=0.015)
    assert bool(jnp.all(w > 0))


def test_integrate_weight_accumulates_and_caps():
    depth = jnp.full((CAM.height, CAM.width), 1.5, dtype=jnp.float32)
    state = tsdf_ops.create_dense(GRID, FUS)
    s1 = tsdf_ops.integrate_dense(state, depth, se3.identity(), CAM, FUS)
    s2 = tsdf_ops.integrate_dense(s1, depth, se3.identity(), CAM, FUS)
    pt = jnp.array([[0.0, 0.0, 1.5]])
    _, w1 = tsdf_ops.trilinear_sample(s1, pt)
    _, w2 = tsdf_ops.trilinear_sample(s2, pt)
    assert float(w2[0]) > float(w1[0])


def _fused_scene_state():
    state = tsdf_ops.create_dense(GRID, FUS)
    # fuse from a few ground-truth poses
    for i, t in enumerate([0.0, 0.25, 0.5]):
        T = jnp.asarray(synthetic.orbit_pose(t, 0.06, 3.0))
        d = synthetic.render_depth(T, CAM)
        state = tsdf_ops.integrate_dense(state, d, T, CAM, FUS)
    return state


def test_raycast_matches_scene_depth():
    state = _fused_scene_state()
    T = se3.identity()
    out = rc_ops.raycast_dense(state, T, CAM, RC, FUS)
    d_true = synthetic.render_depth(T, CAM)

    both = np.asarray(out.hit) & (np.asarray(d_true) > 0)
    # raycast must hit most pixels the scene covers (inside grid bounds)
    coverage = both.sum() / max((np.asarray(d_true) > 0).sum(), 1)
    assert coverage > 0.75, f"coverage {coverage}"

    err = np.abs(np.asarray(out.depth) - np.asarray(d_true))[both]
    # sub-voxel median accuracy
    assert np.median(err) < FUS.voxel_size, f"median {np.median(err)}"
    assert np.percentile(err, 90) < 3 * FUS.voxel_size


def test_raycast_normals_unit_and_toward_camera():
    state = _fused_scene_state()
    out = rc_ops.raycast_dense(state, se3.identity(), CAM, RC, FUS)
    hit = np.asarray(out.hit)
    n = np.asarray(out.normals)[hit]
    lens = np.linalg.norm(n, axis=-1)
    assert np.percentile(np.abs(lens - 1.0), 95) < 1e-3
    # normals are oriented toward the camera: dot(n, view_ray) <= 0
    from voxelhashing_demo_tpu.geometry import camera as cam_geom
    rays = np.asarray(cam_geom.pixel_rays(CAM))[hit]
    dots = np.sum(n * rays, axis=-1)
    assert (dots <= 1e-6).mean() > 0.999
    # the frontoparallel sphere center region should face straight back
    cy, cx = CAM.height // 2, CAM.width // 2
    assert float(out.normals[cy, cx, 2]) < -0.9


def test_raycast_from_moved_pose():
    state = _fused_scene_state()
    T = jnp.asarray(synthetic.orbit_pose(0.25, 0.06, 3.0))
    out = rc_ops.raycast_dense(state, T, CAM, RC, FUS)
    d_true = synthetic.render_depth(T, CAM)
    both = np.asarray(out.hit) & (np.asarray(d_true) > 0)
    err = np.abs(np.asarray(out.depth) - np.asarray(d_true))[both]
    assert np.median(err) < FUS.voxel_size
