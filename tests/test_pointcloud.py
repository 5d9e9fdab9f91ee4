"""Surface point-cloud extraction + PLY export: geometric accuracy against
the analytic scene, and file-format roundtrip."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import (CameraConfig, FusionConfig,
                                          HashConfig)
from voxelhashing_demo_tpu.ops import hash_ops
from voxelhashing_demo_tpu.ops import preprocess as pre
from voxelhashing_demo_tpu.utils import pointcloud, synthetic

CAM = CameraConfig(width=160, height=120, fx=129.3, fy=129.1, cx=79.65,
                   cy=59.8)
FUS = FusionConfig(voxel_size=0.02, truncation=0.08)
HCFG = HashConfig(num_buckets=8192, bucket_size=4, num_blocks=8192,
                  max_active=4096, max_new_per_frame=4096)


def _fused_map():
    hmap = hash_ops.create(HCFG)
    for t in (0.0, 0.5, 1.0):
        T = jnp.asarray(synthetic.orbit_pose(t, 0.05, 2.0))
        d = synthetic.render_depth(T, CAM)
        frame = pre.preprocess_metric(d, CAM)
        hmap, _, _ = hash_ops.fuse_frame(hmap, frame, T, CAM, HCFG, FUS)
    return hmap


def test_surface_points_lie_on_scene():
    hmap = _fused_map()
    pts, normals, w = pointcloud.extract_surface_points(
        hmap, HCFG, FUS, with_normals=True
    )
    assert len(pts) > 1000
    assert normals is not None and normals.shape == pts.shape
    # points should sit on the analytic zero level set
    d = np.abs(np.asarray(synthetic.scene_sdf(jnp.asarray(pts))))
    assert np.median(d) < FUS.voxel_size
    assert np.percentile(d, 90) < 3 * FUS.voxel_size
    # normals are unit where defined
    n_len = np.linalg.norm(normals, axis=-1)
    defined = n_len > 0.1
    assert defined.mean() > 0.5
    np.testing.assert_allclose(n_len[defined], 1.0, atol=1e-3)


def test_ply_roundtrip(tmp_path):
    hmap = _fused_map()
    path = str(tmp_path / "map.ply")
    n = pointcloud.export_map_ply(path, hmap, HCFG, FUS)
    assert n > 1000
    pts = pointcloud.load_ply_points(path)
    assert pts.shape == (n, 3)
    assert np.isfinite(pts).all()
    head = open(path, "rb").read(64)
    assert head.startswith(b"ply\nformat binary_little_endian")
