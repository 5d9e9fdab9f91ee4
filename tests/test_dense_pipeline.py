"""End-to-end dense SLAM: synthetic sequence -> frame-to-model tracking +
fusion + raycast, ATE-checked against exact ground truth (BASELINE.json
config 1, on the analytic scene since no TUM data ships in this image)."""


import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import (
    CameraConfig,
    DenseGridConfig,
    FusionConfig,
    PipelineConfig,
    RaycastConfig,
)
from voxelhashing_demo_tpu.models import dense_slam
from voxelhashing_demo_tpu.utils import metrics, synthetic

CFG = PipelineConfig(
    camera=CameraConfig(width=160, height=120, fx=129.3, fy=129.1,
                        cx=79.65, cy=59.8),
    fusion=FusionConfig(voxel_size=0.02, truncation=0.08),
    grid=DenseGridConfig(dims=(160, 128, 160), origin=(-1.6, -0.7, 0.0)),
    raycast=RaycastConfig(max_steps=128),
)


def test_dense_slam_sequence():
    num_frames = 12
    depths, gt_poses = synthetic.make_sequence(
        CFG.camera, num_frames, trans_amp=0.05, rot_amp_deg=2.5
    )

    slam = dense_slam.DenseSLAM(CFG)
    for d in depths:
        slam.process(d)

    # first frame must be untracked (no model yet), later frames tracked
    assert not bool(slam.infos[0].tracked)
    assert all(bool(i.tracked) for i in slam.infos[2:])

    ate = metrics.ate_rmse(slam.trajectory, gt_poses, align=False)
    assert ate < 0.01, f"ATE {ate} m"

    # final raycast still matches the true scene
    out = slam.render()
    d_true = synthetic.render_depth(jnp.asarray(gt_poses[-1]), CFG.camera)
    both = np.asarray(out.hit) & (np.asarray(d_true) > 0)
    err = np.abs(np.asarray(out.depth) - np.asarray(d_true))[both]
    assert np.median(err) < 2 * CFG.fusion.voxel_size


def test_dense_slam_static_camera():
    # a static camera must stay put
    depths, _ = synthetic.make_sequence(CFG.camera, 4, trans_amp=0.0,
                                        rot_amp_deg=0.0)
    slam = dense_slam.DenseSLAM(CFG)
    for d in depths:
        slam.process(d)
    drift = np.linalg.norm(np.asarray(slam.state.pose)[:3, 3])
    assert drift < 1e-3, f"drift {drift}"
