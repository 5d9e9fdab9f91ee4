"""Loop-closure candidate/edge gating (VERDICT r1 weak item 4).

Position radius alone admits opposite-facing keyframes (no shared surface)
and degenerate registrations that pass the residual gate; the gates added
here — optical-axis angle + forward/reverse mutual consistency — reject
both.  Logic is tested deterministically by driving the private hooks."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from voxelhashing_demo_tpu.config import tiny_config
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.models import keyframe_slam
from voxelhashing_demo_tpu.ops import icp as icp_ops
from voxelhashing_demo_tpu.utils import synthetic


def _slam(**kf_overrides):
    base = tiny_config()
    config = dataclasses.replace(
        base,
        keyframes=dataclasses.replace(
            base.keyframes,
            min_loop_separation=0,
            loop_radius=1.0,
            min_loop_inliers=10,
            max_loop_error=1e-2,
            **kf_overrides,
        ),
    )
    return keyframe_slam.KeyframeSLAM(config)


def _seed_keyframe(slam, pose):
    """Insert one keyframe record directly (bypassing tracking)."""
    from voxelhashing_demo_tpu.ops import pose_graph

    d, _ = synthetic.make_sequence(slam.config.camera, 1, trans_amp=0.0,
                                   rot_amp_deg=0.0)
    import jax.numpy as jnp_
    from voxelhashing_demo_tpu.ops import preprocess as pre_ops

    frame = pre_ops.preprocess(jnp_.asarray(d[0]), slam.config.camera)
    small = slam._downsample(frame)
    slam.graph = pose_graph.add_pose(slam.graph, jnp_.asarray(pose))
    slam.keyframes.append(
        keyframe_slam._KeyframeRecord(
            index=len(slam.keyframes), frame_index=0, frame=small,
            depth_raw=np.asarray(d[0], np.uint16),
        )
    )
    return small


def test_angle_gate_skips_opposite_facing():
    slam = _slam(loop_max_angle_deg=75.0)
    small = _seed_keyframe(slam, np.eye(4, dtype=np.float32))

    calls = []
    slam._pair_icp = lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(
        AssertionError("ICP must not run for opposite-facing candidates")
    )
    # same position, camera turned 180 degrees
    flipped = np.asarray(se3.exp(jnp.asarray(
        np.array([0, 0, 0, 0, np.pi, 0], np.float32))))
    added = slam._try_loop_closures(1, jnp.asarray(flipped), small)
    assert not added and not calls

    # co-oriented candidate does reach ICP
    hits = []

    def fake_icp(src, tgt, init):
        hits.append(1)
        return icp_ops.ICPResult(transform=jnp.eye(4), error=jnp.float32(1.0),
                                 count=jnp.float32(0.0), iters=jnp.int32(1))

    slam._pair_icp = fake_icp
    slam._try_loop_closures(1, jnp.eye(4), small)
    assert hits


def test_mutual_consistency_gate():
    import jax

    slam = _slam(loop_mutual_check=True)
    small = _seed_keyframe(slam, np.eye(4, dtype=np.float32))
    # distinct query-frame object so the fake ICP can tell directions apart
    query = jax.tree.map(lambda x: x + 0, small)

    T_fwd = jnp.asarray(se3.exp(jnp.asarray(
        np.array([0.05, 0, 0, 0, 0.02, 0], np.float32))))

    def icp_factory(reverse_T):
        def fake(src, tgt, init):
            is_forward = src is query
            T = T_fwd if is_forward else reverse_T
            return icp_ops.ICPResult(
                transform=T, error=jnp.float32(1e-6),
                count=jnp.float32(1e4), iters=jnp.int32(3),
            )
        return fake

    # consistent reverse: exact inverse -> edge accepted
    slam._pair_icp = icp_factory(se3.inverse(T_fwd))
    edges_before = int(slam.graph.num_edges)
    assert slam._try_loop_closures(1, jnp.eye(4), query)
    assert int(slam.graph.num_edges) == edges_before + 1

    # inconsistent reverse: slid 8 cm -> edge rejected
    slid = se3.inverse(T_fwd) @ jnp.asarray(se3.exp(jnp.asarray(
        np.array([0.08, 0, 0, 0, 0, 0], np.float32))))
    slam._pair_icp = icp_factory(slid)
    assert not slam._try_loop_closures(1, jnp.eye(4), query)
    assert int(slam.graph.num_edges) == edges_before + 1


def test_real_pair_is_mutually_consistent():
    """A genuine structured-scene pair passes the mutual check with the
    real ICP (the gate must not reject true closures)."""
    slam = _slam()
    depths, poses = synthetic.make_sequence(
        slam.config.camera, 2, trans_amp=0.06, rot_amp_deg=3.0
    )
    from voxelhashing_demo_tpu.ops import preprocess as pre_ops

    f0 = slam._downsample(pre_ops.preprocess(jnp.asarray(depths[0]),
                                             slam.config.camera))
    f1 = slam._downsample(pre_ops.preprocess(jnp.asarray(depths[1]),
                                             slam.config.camera))
    init = jnp.asarray(
        np.linalg.inv(np.asarray(poses[0])) @ np.asarray(poses[1])
    )
    res = slam._pair_icp(f1, f0, init)
    assert bool(jnp.all(jnp.isfinite(res.transform)))
    assert slam._mutually_consistent(f1, f0, res.transform)
