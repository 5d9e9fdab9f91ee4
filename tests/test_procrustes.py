"""Closed-form Procrustes alignment (geometry/procrustes.py).

The correspondence-SVD rigid-alignment primitive whose role the reference
carried as the legacy ``rigidAlignment`` path (reference:
CameraTracking.cpp:92-115), here at full strength: exact weighted Kabsch
plus the association-seeded initializer the relocalizer uses.
"""

import numpy as np
import jax.numpy as jnp

from voxelhashing_demo_tpu.config import CameraConfig, ICPConfig
from voxelhashing_demo_tpu.geometry import procrustes, se3
from voxelhashing_demo_tpu.utils import synthetic


def _random_T(rng, max_rot_deg, max_trans):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.deg2rad(rng.uniform(5.0, max_rot_deg))
    xi = np.concatenate([
        rng.uniform(-max_trans, max_trans, 3), axis * ang
    ]).astype(np.float32)
    return np.asarray(se3.exp(jnp.asarray(xi)))


def _rot_err_deg(A, B):
    R = np.asarray(A)[:3, :3].T @ np.asarray(B)[:3, :3]
    c = np.clip((np.trace(R) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def test_recovers_random_rigid_transforms():
    rng = np.random.RandomState(0)
    for trial in range(5):
        T = _random_T(rng, max_rot_deg=120.0, max_trans=1.0)
        src = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        tgt = src @ T[:3, :3].T + T[:3, 3]
        est = np.asarray(procrustes.procrustes(jnp.asarray(src),
                                               jnp.asarray(tgt)))
        np.testing.assert_allclose(est, T, atol=1e-4)


def test_weights_ignore_outliers():
    rng = np.random.RandomState(1)
    T = _random_T(rng, max_rot_deg=60.0, max_trans=0.5)
    src = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    tgt = src @ T[:3, :3].T + T[:3, 3]
    w = np.ones(200, np.float32)
    bad = rng.choice(200, 60, replace=False)
    tgt[bad] += rng.normal(0, 5.0, (60, 3))     # gross outliers...
    w[bad] = 0.0                                # ...with zero weight
    est = np.asarray(procrustes.procrustes(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w)
    ))
    np.testing.assert_allclose(est, T, atol=1e-4)


def test_planar_points_no_reflection_and_degenerate_safe():
    rng = np.random.RandomState(2)
    T = _random_T(rng, max_rot_deg=40.0, max_trans=0.3)
    src = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    src[:, 2] = 0.0                              # planar (rank-2 covariance)
    tgt = src @ T[:3, :3].T + T[:3, 3]
    est = np.asarray(procrustes.procrustes(jnp.asarray(src),
                                           jnp.asarray(tgt)))
    assert np.linalg.det(est[:3, :3]) > 0.99     # rotation, not reflection
    np.testing.assert_allclose(est @ np.c_[src, np.ones(100)].T,
                               np.c_[tgt, np.ones(100)].T, atol=1e-3)
    # total weight zero -> identity, finite
    out = np.asarray(procrustes.procrustes(
        jnp.asarray(src), jnp.asarray(tgt), jnp.zeros(100)
    ))
    np.testing.assert_allclose(out, np.eye(4), atol=1e-6)


def test_raced_procrustes_init_extends_icp_basin():
    """A ~45-degree relative rotation: identity-start ICP locks into a
    wrong basin (projective association is not nearest-neighbor), while
    the yaw-raced Procrustes init + the same ICP recovers the truth —
    the relocalization capability gap this initializer closes."""
    from voxelhashing_demo_tpu.ops import icp as icp_ops
    from voxelhashing_demo_tpu.ops import preprocess as pre_ops

    cam = CameraConfig(width=160, height=120, fx=129.3, fy=129.1,
                       cx=79.65, cy=59.8)
    icfg = ICPConfig(max_iters=15)

    sweep = 90.0
    Ta = synthetic.room_sweep_pose(0.0, sweep)
    Tb = synthetic.room_sweep_pose(0.5, sweep)    # ~45 deg apart
    da = synthetic.depth_to_raw(
        synthetic.render_depth(jnp.asarray(Ta), cam,
                               sdf=synthetic.room_sdf), cam)
    db = synthetic.depth_to_raw(
        synthetic.render_depth(jnp.asarray(Tb), cam,
                               sdf=synthetic.room_sdf), cam)
    fa = pre_ops.preprocess(jnp.asarray(da), cam)
    fb = pre_ops.preprocess(jnp.asarray(db), cam)
    T_true = np.linalg.inv(np.asarray(Ta)) @ np.asarray(Tb)

    # identity-start ICP cannot reach a 45-degree basin
    ident = icp_ops.icp_align(fb, fa, cam, icfg)
    assert _rot_err_deg(np.asarray(ident.transform), T_true) > 10.0

    # raced Procrustes init (src=fb onto tgt=fa: T @ src ~= tgt) + ICP
    T0 = np.asarray(procrustes.procrustes_init_raced(fb, fa, cam, icfg))
    assert _rot_err_deg(T0, T_true) < 10.0

    refined = icp_ops.icp_align(fb, fa, cam, icfg,
                                init_T=jnp.asarray(T0))
    T1 = np.asarray(refined.transform)
    assert _rot_err_deg(T1, T_true) < 1.0
    assert np.linalg.norm(T1[:3, 3] - T_true[:3, 3]) < 0.02
