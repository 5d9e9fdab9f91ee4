"""Pose graph BA tests: analytic ring graph + keyframe SLAM end-to-end.

No reference counterpart exists (the reference has no backend at all,
SURVEY.md §5) — these tests validate the north-star component against
synthetic ground truth.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import KeyframeConfig, tiny_config
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.ops import pose_graph
from voxelhashing_demo_tpu.utils import metrics


def _ring_poses(K: int, radius: float = 1.0):
    """Ground-truth poses on a circle, camera yawing around +y."""
    poses = []
    for i in range(K):
        a = 2 * np.pi * i / K
        xi = np.array(
            [radius * np.cos(a), 0.0, radius * np.sin(a), 0.0, a, 0.0],
            dtype=np.float32,
        )
        poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    return poses


def _rel(Ta, Tb):
    return np.asarray(se3.inverse(jnp.asarray(Ta)) @ jnp.asarray(Tb))


def test_optimize_corrects_odometry_drift():
    K = 8
    gt = _ring_poses(K)
    rng = np.random.RandomState(0)

    graph = pose_graph.create(max_keyframes=K, max_edges=K + 2)
    # initial estimates: integrate noisy odometry (drift accumulates)
    est = [gt[0]]
    for i in range(K - 1):
        z = _rel(gt[i], gt[i + 1])
        noise = np.concatenate(
            [rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3)]
        ).astype(np.float32)
        z_noisy = z @ np.asarray(se3.exp(jnp.asarray(noise)))
        est.append(est[-1] @ z_noisy)

    for T in est:
        graph = pose_graph.add_pose(graph, jnp.asarray(T))
    for i in range(K - 1):
        z = _rel(gt[i], gt[i + 1])  # noise-free measurements
        graph = pose_graph.add_edge(graph, i, i + 1, jnp.asarray(z))
    # loop closure: last keyframe back to the anchor
    graph = pose_graph.add_edge(
        graph, K - 1, 0, jnp.asarray(_rel(gt[K - 1], gt[0]))
    )

    cfg = KeyframeConfig(ba_iters=10)
    ate_before = metrics.ate_rmse(
        [np.asarray(p) for p in graph.poses[:K]], gt, align=False
    )
    graph_opt, info = pose_graph.optimize(graph, cfg)
    ate_after = metrics.ate_rmse(
        [np.asarray(p) for p in graph_opt.poses[:K]], gt, align=False
    )

    assert float(info.chi2_final) < 1e-8
    assert float(info.chi2_final) < float(info.chi2_initial)
    assert ate_after < 0.1 * ate_before
    assert ate_after < 1e-3
    # anchor stays put
    np.testing.assert_allclose(
        np.asarray(graph_opt.poses[0]), gt[0], atol=1e-4
    )


def test_residuals_zero_at_ground_truth():
    K = 6
    gt = _ring_poses(K)
    graph = pose_graph.create(K, K)
    for T in gt:
        graph = pose_graph.add_pose(graph, jnp.asarray(T))
    for i in range(K - 1):
        graph = pose_graph.add_edge(
            graph, i, i + 1, jnp.asarray(_rel(gt[i], gt[i + 1]))
        )
    r = pose_graph.edge_residuals(
        graph.poses, graph.edges_ij, graph.edges_T
    )
    w_r = r * graph.edges_w[:, None]
    np.testing.assert_allclose(np.asarray(w_r), 0.0, atol=1e-5)


def test_empty_and_padded_graph_is_noop():
    graph = pose_graph.create(4, 4)
    graph = pose_graph.add_pose(graph, jnp.eye(4))
    cfg = KeyframeConfig(ba_iters=3)
    out, info = pose_graph.optimize(graph, cfg)
    assert np.all(np.isfinite(np.asarray(out.poses)))
    assert float(info.chi2_final) == 0.0
    np.testing.assert_allclose(np.asarray(out.poses[0]), np.eye(4), atol=1e-5)


def test_capacity_limits_are_safe():
    graph = pose_graph.create(2, 1)
    for _ in range(4):
        graph = pose_graph.add_pose(graph, jnp.eye(4))
        graph = pose_graph.add_edge(graph, 0, 1, jnp.eye(4))
    assert int(graph.num_poses) == 2
    assert int(graph.num_edges) == 1


def test_keyframe_slam_end_to_end():
    from voxelhashing_demo_tpu.models import keyframe_slam
    from voxelhashing_demo_tpu.utils import synthetic

    base = tiny_config()
    config = dataclasses.replace(
        base,
        keyframes=dataclasses.replace(
            base.keyframes,
            min_rotation_deg=2.0,
            min_translation=0.03,
            icp_downsample=2,
            min_loop_inliers=150,
            max_loop_error=5e-4,
            loop_radius=1.0,
            min_loop_separation=2,
            ba_iters=5,
        ),
    )
    cam = config.camera
    n = 10
    depths, gt = synthetic.make_sequence(
        cam, n, trans_amp=0.10, rot_amp_deg=5.0
    )

    slam = keyframe_slam.KeyframeSLAM(config)
    for d in depths:
        slam.process(d)

    traj = slam.trajectory()
    assert len(traj) == n
    assert len(slam.keyframes) >= 2
    assert int(slam.graph.num_edges) >= len(slam.keyframes) - 1
    for T in traj:
        assert np.all(np.isfinite(T))
    ate = metrics.ate_rmse(traj, gt)
    assert ate < 0.05, f"keyframe SLAM ATE too high: {ate}"
