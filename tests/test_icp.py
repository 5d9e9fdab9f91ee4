"""Golden tests for point-to-plane ICP: recover known SE(3) transforms on
synthetic scenes (the validation the reference never had — its Align call
was commented out, reference: Application.cpp:75)."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import CameraConfig, ICPConfig
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.ops import icp as icp_ops
from voxelhashing_demo_tpu.ops import preprocess as pre
from voxelhashing_demo_tpu.utils import synthetic

CAM = CameraConfig(width=160, height=120, fx=129.3, fy=129.1, cx=79.65,
                   cy=59.8)
ICP = ICPConfig()


def render_frame(T_wc):
    d = synthetic.render_depth(jnp.asarray(T_wc, dtype=jnp.float32), CAM)
    return pre.preprocess_metric(d, CAM), d


def check_recovery(xi_true, atol_t=0.004, atol_r=0.004):
    """Ground truth: camera moves by T_gt = exp(xi).  ICP src=new frame,
    tgt=old frame must recover T_rel with pose_new = pose_old @ T_rel =
    T_gt."""
    T_gt = se3.exp(jnp.asarray(xi_true, dtype=jnp.float32))
    tgt_frame, _ = render_frame(se3.identity())
    src_frame, _ = render_frame(T_gt)

    result = icp_ops.icp_align(src_frame, tgt_frame, CAM, ICP)
    T_est = result.transform

    # compare against ground truth relative motion
    err = se3.log(se3.inverse(T_gt) @ T_est)
    terr = float(jnp.linalg.norm(err[:3]))
    rerr = float(jnp.linalg.norm(err[3:]))
    assert terr < atol_t, f"translation error {terr} (xi={xi_true})"
    assert rerr < atol_r, f"rotation error {rerr} (xi={xi_true})"
    assert int(result.count) > 1000
    return result


def test_identity():
    r = check_recovery([0, 0, 0, 0, 0, 0], atol_t=1e-4, atol_r=1e-4)
    assert float(r.error) < 1e-6


def test_small_translation():
    check_recovery([0.01, -0.008, 0.012, 0, 0, 0])


def test_small_rotation():
    check_recovery([0, 0, 0, 0.01, -0.015, 0.008])


def test_combined_motion():
    check_recovery([0.015, 0.01, -0.01, 0.012, 0.018, -0.01])


def test_larger_motion():
    check_recovery([0.03, -0.02, 0.025, 0.03, -0.025, 0.02],
                   atol_t=0.008, atol_r=0.008)


def test_early_convergence():
    # at identity the solver should converge in far fewer than max_iters
    frame, _ = render_frame(se3.identity())
    result = icp_ops.icp_align(frame, frame, CAM, ICP)
    assert int(result.iters) < ICP.max_iters


def test_empty_target_is_safe():
    H, W = CAM.height, CAM.width
    empty = pre.Frame(
        vertices=jnp.zeros((H, W, 3)),
        normals=jnp.zeros((H, W, 3)),
        depth=jnp.zeros((H, W)),
    )
    frame, _ = render_frame(se3.identity())
    result = icp_ops.icp_align(frame, empty, CAM, ICP)
    assert bool(jnp.all(jnp.isfinite(result.transform)))
    assert int(result.count) == 0
    # no correspondences -> no update
    np.testing.assert_allclose(result.transform, np.eye(4), atol=1e-5)


def test_pyramid():
    T_gt = se3.exp(jnp.array([0.04, 0.0, -0.03, 0.0, 0.04, 0.02]))
    _, d_tgt = render_frame(se3.identity())
    _, d_src = render_frame(T_gt)
    from voxelhashing_demo_tpu.config import ICPConfig
    cfg = ICPConfig(pyramid=(4, 2, 1))
    result = icp_ops.icp_align_pyramid(d_src, d_tgt, CAM, cfg)
    err = se3.log(se3.inverse(T_gt) @ result.transform)
    assert float(jnp.linalg.norm(err[:3])) < 0.01
    assert float(jnp.linalg.norm(err[3:])) < 0.01


def test_normal_system_matches_dense_jacobian():
    # brute-force check of the fused JTJ/JTr against explicit J construction
    rng = np.random.default_rng(0)
    N = 64
    p = jnp.asarray(rng.normal(size=(1, N, 3)), dtype=jnp.float32)
    n = jnp.asarray(rng.normal(size=(1, N, 3)), dtype=jnp.float32)
    r = jnp.asarray(rng.normal(size=(1, N)), dtype=jnp.float32)
    valid = jnp.asarray(rng.random((1, N)) > 0.3)

    sys = icp_ops.build_normal_system(p, n, r, valid)

    J = np.concatenate([np.asarray(n), np.cross(np.asarray(p), np.asarray(n))],
                       axis=-1).reshape(-1, 6)
    w = np.asarray(valid).reshape(-1, 1).astype(np.float32)
    Jw = J * w
    rw = np.asarray(r).reshape(-1) * w[:, 0]
    np.testing.assert_allclose(sys.JTJ, Jw.T @ Jw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sys.JTr, Jw.T @ rw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sys.count, w.sum())


def test_huber_downweights_outliers():
    """With a contaminated target, Huber-weighted ICP recovers the
    transform better than the unweighted system."""
    import dataclasses

    from voxelhashing_demo_tpu.utils import synthetic

    rng = np.random.RandomState(3)
    T_true = se3.exp(jnp.array([0.02, -0.015, 0.01, 0.008, -0.01, 0.006]))

    d_tgt = synthetic.render_depth(jnp.eye(4), CAM)
    d_src = synthetic.render_depth(T_true, CAM)
    # contaminate 15% of source depth with gross outliers inside the gate
    mask = rng.rand(*np.asarray(d_src).shape) < 0.15
    noise = rng.uniform(-0.06, 0.06, np.asarray(d_src).shape)
    d_src_bad = jnp.where(
        jnp.asarray(mask) & (d_src > 0), d_src + jnp.asarray(noise, jnp.float32), d_src
    )

    src = pre.preprocess_metric(d_src_bad, CAM)
    tgt = pre.preprocess_metric(d_tgt, CAM)

    def err(cfg):
        res = icp_ops.icp_align(src, tgt, CAM, cfg)
        return float(jnp.linalg.norm(se3.log(
            se3.inverse(res.transform) @ T_true
        )))

    base = ICPConfig()
    e_plain = err(base)
    e_huber = err(dataclasses.replace(base, huber_delta=0.01))
    assert e_huber < e_plain, (e_huber, e_plain)
    assert e_huber < 5e-3


def test_octahedral_normal_roundtrip():
    """The packed-target normal codec must round-trip unit normals to well
    under the ICP normal gate's resolution (~0.3 deg at bf16)."""
    import numpy as np

    rng = np.random.default_rng(0)
    n = rng.normal(size=(5000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # include exact axis cases (poles and folds)
    axes = np.array([[0, 0, 1], [0, 0, -1], [1, 0, 0], [-1, 0, 0],
                     [0, 1, 0], [0, -1, 0]], dtype=np.float32)
    n = np.concatenate([n, axes])
    bits = icp_ops.oct_encode_bits(jnp.asarray(n))
    back = np.asarray(icp_ops.oct_decode_bits(bits))
    dot = np.sum(n * back, axis=-1)
    ang = np.degrees(np.arccos(np.clip(dot, -1, 1)))
    assert ang.max() < 0.5, f"max angular error {ang.max()} deg"
    # invalid (zero) normal encodes to 0.0 bits
    zbits = np.asarray(icp_ops.oct_encode_bits(jnp.zeros((1, 3))))
    assert zbits[0] == 0.0


def test_pyramid_source_pooling_accuracy():
    """Pooling the source 2x at the finest level (gather-cost optimization)
    must not materially degrade the recovered transform."""
    import dataclasses

    cam = CameraConfig(width=160, height=120, fx=129.3, fy=129.1,
                       cx=79.65, cy=59.8)
    depths, poses = synthetic.make_sequence(cam, 2, trans_amp=0.05,
                                            rot_amp_deg=2.5)
    f0 = pre.preprocess(jnp.asarray(depths[0]), cam)
    f1 = pre.preprocess(jnp.asarray(depths[1]), cam)
    T_true = np.linalg.inv(np.asarray(poses[1])) @ np.asarray(poses[0])

    base = ICPConfig(pyramid=(4, 2, 1), pyramid_iters=(10, 5, 4))
    pooled = dataclasses.replace(base, source_pools=(1, 1, 2))
    for cfg in (base, pooled):
        res = icp_ops.icp_align_pyramid(
            f0.depth, f1.depth, cam, cfg, src_full=f0, tgt_full=f1
        )
        # f1 = pose1-view, f0 = pose0-view: res maps src(f0) onto tgt(f1)
        err = np.asarray(res.transform) @ np.linalg.inv(T_true) - np.eye(4)
        assert np.abs(err[:3, 3]).max() < 2.5e-3, f"trans err {err[:3,3]}"
        assert np.abs(err[:3, :3]).max() < 2.5e-3, f"rot err"
