"""ScanNet extracted-frames dataset layer (BASELINE config 4).

No dataset files ship in this image, so the loader is exercised by
round-tripping synthetic sequences through export_scannet_sequence — the
same strategy as the TUM and ICL layers."""

import os

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import CameraConfig, tiny_config
from voxelhashing_demo_tpu.utils import metrics, scannet, synthetic

CAM = CameraConfig(width=80, height=60, fx=64.6625, fy=64.5625,
                   cx=39.7, cy=29.8)


def _export(tmp_path, n=4, cam=CAM, poses_override=None):
    depths, poses = synthetic.make_sequence(cam, n, trans_amp=0.05,
                                            rot_amp_deg=2.5)
    depths = [np.asarray(d) for d in depths]
    poses = [np.asarray(p) for p in poses]
    if poses_override is not None:
        poses = poses_override(poses)
    root = str(tmp_path / "scene0000_00")
    scannet.export_scannet_sequence(root, depths, poses, cam)
    return root, depths, poses


def test_scannet_roundtrip(tmp_path):
    root, depths, poses = _export(tmp_path)
    seq = scannet.ScanNetSequence(root)
    assert len(seq) == 4
    # intrinsics come from the scene's intrinsic_depth.txt, mm scale
    assert seq.cam.depth_scale == 1000.0
    np.testing.assert_allclose(
        (seq.cam.fx, seq.cam.fy, seq.cam.cx, seq.cam.cy),
        (CAM.fx, CAM.fy, CAM.cx, CAM.cy), atol=1e-5,
    )
    scale = 1000.0 / CAM.depth_scale
    for (raw, T), d_ref, T_ref in zip(seq, depths, poses):
        # depth_scale-units -> mm: one quantization step slack
        mm_ref = np.round(d_ref.astype(np.float64) * scale)
        assert np.abs(raw.astype(np.int64) - mm_ref).max() <= 1
        assert (raw == 0).sum() == (d_ref == 0).sum()
        np.testing.assert_allclose(T, T_ref, atol=1e-6)


def test_scannet_untracked_pose_is_none(tmp_path):
    def drop_second(poses):
        poses = list(poses)
        poses[1] = None  # exporter writes the official -inf marker
        return poses

    root, _, _ = _export(tmp_path, poses_override=drop_second)
    seq = scannet.ScanNetSequence(root)
    # has_gt only checks pose-file presence; the official -inf untracked
    # marker is a present file that surfaces as pose=None on load
    assert seq.has_gt
    _, gts = seq.load_all()
    assert gts[1] is None
    assert gts[0] is not None and gts[2] is not None


def test_scannet_missing_intrinsic_falls_back(tmp_path):
    root, _, _ = _export(tmp_path)
    os.unlink(os.path.join(root, "intrinsic", "intrinsic_depth.txt"))
    seq = scannet.ScanNetSequence(root)
    assert seq.cam.width == CAM.width and seq.cam.height == CAM.height
    assert seq.cam.depth_scale == 1000.0


def test_scannet_sequence_drives_slam(tmp_path):
    """End-to-end: exported ScanNet scene -> loader (mm depth scale) ->
    hash SLAM with the scene camera, ATE vs the loader's own poses
    (BASELINE config 4 wiring, single chip)."""
    import dataclasses

    from voxelhashing_demo_tpu.models import hash_slam

    cfg = tiny_config()
    root, _, _ = _export(tmp_path, n=6, cam=cfg.camera)
    seq = scannet.ScanNetSequence(root)
    loaded, gt = seq.load_all()
    cfg = dataclasses.replace(cfg, camera=seq.cam)

    slam = hash_slam.HashSLAM(cfg)
    for d in loaded:
        slam.process(jnp.asarray(d))
    ate = metrics.ate_rmse(slam.trajectory, gt, align=False)
    assert ate < 0.015, f"ScanNet-driven SLAM ATE {ate}"


def test_cli_autodetects_scannet(tmp_path, capsys):
    """cli run --dataset on an extracted ScanNet directory auto-detects
    the layout, adopts the scene intrinsics (mm depth scale), and tracks."""
    import json

    from voxelhashing_demo_tpu import cli

    cam = CameraConfig(width=160, height=120, fx=129.3, fy=129.1,
                       cx=79.65, cy=59.8)
    root, _, _ = _export(tmp_path, n=5, cam=cam)
    out = str(tmp_path / "run")
    cli.main(["--small", "run", "--dataset", root, "--out", out,
              "--checkpoint", ""])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["frames"] == 5
    assert res["tracked_frames"] >= 3
    assert res["ate_rmse_m"] < 0.05
    assert os.path.exists(os.path.join(out, "trajectory.txt"))


def test_scannet_wrong_size_matrix_raises(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 2 3")
    try:
        scannet.read_matrix_txt(str(p))
        assert False, "expected ValueError on non-4x4 matrix file"
    except ValueError:
        pass
