"""ICL-NUIM native-format dataset layer (BASELINE configs 3-4).

No dataset files ship in this image, so the loader is exercised by
round-tripping synthetic sequences through export_icl_sequence — the same
strategy as the TUM layer (tests/test_io_tum.py)."""

import numpy as np
import jax.numpy as jnp

from voxelhashing_demo_tpu.config import CameraConfig
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.utils import icl, metrics, synthetic

CAM = CameraConfig(width=80, height=60, fx=64.6625, fy=64.5625,
                   cx=39.7, cy=29.8)


def test_euclidean_z_conversion_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.uniform(0.5, 4.0, (CAM.height, CAM.width))
    euc = icl.z_to_euclidean(z, CAM)
    # euclidean ray depth >= planar z, equality only on the optical axis
    assert np.all(euc >= z - 1e-12)
    back = icl.euclidean_to_z(euc, CAM)
    np.testing.assert_allclose(back, z, atol=1e-9)


def test_pose_from_cam_is_proper_rotation():
    rng = np.random.default_rng(1)
    for _ in range(10):
        T = np.asarray(se3.exp(jnp.asarray(
            rng.normal(size=6).astype(np.float32) * 0.5)))
        params = {
            "pos": T[:3, 3].astype(np.float64),
            "dir": T[:3, 2].astype(np.float64),
            "up": (-T[:3, 1]).astype(np.float64),
            "right": T[:3, 0].astype(np.float64) * 1.3333,  # aspect scale
        }
        back = icl.pose_from_cam(params)
        np.testing.assert_allclose(back, T, atol=1e-5)
        R = back[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.99


def test_icl_sequence_roundtrip(tmp_path):
    depths, poses = synthetic.make_sequence(CAM, 4, trans_amp=0.05,
                                            rot_amp_deg=2.5)
    depths = [np.asarray(d) for d in depths]
    root = str(tmp_path / "icl_seq")
    icl.export_icl_sequence(root, depths, poses, CAM)

    seq = icl.ICLSequence(root, cam=CAM)
    assert len(seq) == 4
    for (raw, T), d_ref, T_ref in zip(seq, depths, poses):
        # z -> euclidean text -> z -> uint16: one quantization step slack
        diff = np.abs(raw.astype(np.int64) - d_ref.astype(np.int64))
        assert diff.max() <= 1, diff.max()
        assert (raw == 0).sum() == (d_ref == 0).sum()  # invalid preserved
        np.testing.assert_allclose(T, np.asarray(T_ref), atol=1e-5)


def test_icl_sequence_drives_slam(tmp_path):
    """End-to-end: exported ICL sequence -> loader -> hash SLAM, ATE
    checked against the loader's own poses (BASELINE config 3 wiring)."""
    from voxelhashing_demo_tpu.config import tiny_config
    from voxelhashing_demo_tpu.models import hash_slam

    cfg = tiny_config()
    depths, poses = synthetic.make_sequence(cfg.camera, 6, trans_amp=0.05,
                                            rot_amp_deg=2.5)
    root = str(tmp_path / "icl_run")
    icl.export_icl_sequence(root, [np.asarray(d) for d in depths], poses,
                            cfg.camera)
    seq = icl.ICLSequence(root, cam=cfg.camera)
    loaded, gt = seq.load_all()

    slam = hash_slam.HashSLAM(cfg)
    for d in loaded:
        slam.process(jnp.asarray(d))
    ate = metrics.ate_rmse(slam.trajectory, gt, align=False)
    assert ate < 0.015, f"ICL-driven SLAM ATE {ate}"


def test_icl_missing_cam_files(tmp_path):
    depths, poses = synthetic.make_sequence(CAM, 2, trans_amp=0.02,
                                            rot_amp_deg=1.0)
    root = str(tmp_path / "icl_nocam")
    icl.export_icl_sequence(root, [np.asarray(d) for d in depths], poses,
                            CAM)
    import os

    for name in os.listdir(root):
        if name.endswith(".txt"):
            os.unlink(os.path.join(root, name))
    seq = icl.ICLSequence(root, cam=CAM)
    raws, gts = seq.load_all()
    assert len(raws) == 2
    assert all(g is None for g in gts)


def test_icl_wrong_size_raises(tmp_path):
    with open(tmp_path / "bad_0.depth", "w") as f:
        f.write("1.0 2.0 3.0")
    seq = icl.ICLSequence(str(tmp_path), cam=CAM)
    try:
        next(iter(seq))
        assert False, "expected ValueError on wrong-size depth file"
    except ValueError:
        pass
