"""Splat raycaster tests: golden scene accuracy, agreement with the
marching renderer, hole filling, and model-frame usability for ICP."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import (
    CameraConfig,
    FusionConfig,
    HashConfig,
    ICPConfig,
    RaycastConfig,
)
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.ops import hash_ops, hash_raycast, splat
from voxelhashing_demo_tpu.ops import icp as icp_ops
from voxelhashing_demo_tpu.ops import preprocess as pre
from voxelhashing_demo_tpu.ops import raycast as rc_ops
from voxelhashing_demo_tpu.utils import synthetic

CAM = CameraConfig(width=160, height=120, fx=129.3, fy=129.1, cx=79.65,
                   cy=59.8)
FUS = FusionConfig(voxel_size=0.02, truncation=0.08)
HCFG = HashConfig(num_buckets=8192, bucket_size=4, num_blocks=8192,
                  max_active=4096, max_new_per_frame=4096)
RC = RaycastConfig(mode="splat", max_steps=128, cache_dims=(192, 192, 192))


def _fused_scene(n_frames=3):
    hmap = hash_ops.create(HCFG)
    active = None
    for i in range(n_frames):
        T = jnp.asarray(synthetic.orbit_pose(i / 2.0, 0.05, 2.0))
        d = synthetic.render_depth(T, CAM)
        frame = pre.preprocess_metric(d, CAM)
        hmap, active, _ = hash_ops.fuse_frame(hmap, frame, T, CAM, HCFG, FUS)
    return hmap, active


def test_splat_matches_scene():
    hmap, active = _fused_scene()
    T = se3.identity()
    active = hash_ops.compact_visible(hmap, HCFG, T, CAM, FUS)
    out = splat.splat_raycast(hmap, active, HCFG, T, CAM, RC, FUS)
    d_true = np.asarray(synthetic.render_depth(T, CAM))

    both = np.asarray(out.hit) & (d_true > 0)
    coverage = both.sum() / max((d_true > 0).sum(), 1)
    assert coverage > 0.9, f"coverage {coverage}"
    err = np.abs(np.asarray(out.depth) - d_true)[both]
    assert np.median(err) < FUS.voxel_size, f"median err {np.median(err)}"
    assert np.percentile(err, 90) < 3 * FUS.voxel_size


def test_splat_agrees_with_marcher():
    hmap, active = _fused_scene()
    T = jnp.asarray(synthetic.orbit_pose(0.25, 0.05, 2.0))
    active = hash_ops.compact_visible(hmap, HCFG, T, CAM, FUS)
    fast = splat.splat_raycast(hmap, active, HCFG, T, CAM, RC, FUS)
    slow = hash_raycast.raycast_hash(
        hmap, active, HCFG, T, CAM, RC, FUS, cache_dims=RC.cache_dims
    )
    both = np.asarray(fast.hit) & np.asarray(slow.hit)
    assert both.mean() > 0.5
    diff = np.abs(np.asarray(fast.depth) - np.asarray(slow.depth))[both]
    assert np.median(diff) < FUS.voxel_size


def test_splat_normals_usable_for_icp():
    """The splatted model must track a real frame (frame-to-model ICP)."""
    hmap, _ = _fused_scene()
    T = se3.identity()
    active = hash_ops.compact_visible(hmap, HCFG, T, CAM, FUS)
    model = rc_ops.model_frame(
        splat.splat_raycast(hmap, active, HCFG, T, CAM, RC, FUS)
    )

    # a frame taken slightly off the model pose
    xi = jnp.array([0.01, -0.008, 0.012, 0.004, -0.006, 0.003])
    T_frame = se3.exp(xi)  # camera-to-world
    d = synthetic.render_depth(T_frame, CAM)
    frame = pre.preprocess_metric(d, CAM)

    res = icp_ops.icp_align(frame, model, CAM, ICPConfig())
    assert int(res.count) > 500
    # recovered relative transform should match T_frame (model at identity)
    err = np.asarray(se3.log(se3.inverse(res.transform) @ T_frame))
    assert np.linalg.norm(err) < 5e-3, f"icp err {np.linalg.norm(err)}"


def test_min_fill_fills_pinholes():
    d = jnp.full((32, 32), 2.0).at[10, 10].set(0.0).at[20, 5].set(0.0)
    filled = splat._min_fill(d, rounds=1)
    assert float(filled[10, 10]) == 2.0
    assert float(filled[20, 5]) == 2.0
    # large invalid regions survive one round (only a 1-px rim fills)
    d2 = jnp.full((32, 32), 0.0).at[:8].set(1.5)
    filled2 = splat._min_fill(d2, rounds=1)
    assert float(filled2[8, 16]) == 1.5  # rim filled
    assert float(filled2[12, 16]) == 0.0  # interior hole intact


def test_edge_preserving_smooth_keeps_edges():
    d = jnp.where(
        jnp.arange(32)[None, :] < 16, 1.0, 2.0
    ) * jnp.ones((32, 32))
    sm = splat._edge_preserving_smooth(d, sigma_z=0.06)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(d), atol=1e-6)
