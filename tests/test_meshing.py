"""Marching-tetrahedra mesh extraction: geometric accuracy on the analytic
scene, block-boundary seamlessness, and PLY output."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import (CameraConfig, FusionConfig,
                                          HashConfig)
from voxelhashing_demo_tpu.ops import hash_ops
from voxelhashing_demo_tpu.ops import preprocess as pre
from voxelhashing_demo_tpu.utils import meshing, synthetic

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


def test_mesh_lies_on_zero_level_set():
    hmap = _fused_map()
    verts, faces = meshing.extract_mesh(hmap, HCFG, FUS)
    assert len(faces) > 2000
    assert len(verts) == 3 * len(faces)
    d = np.abs(np.asarray(synthetic.scene_sdf(jnp.asarray(verts))))
    # marching-tet vertices interpolate the fused TSDF: within a voxel of
    # the analytic surface for the vast majority
    assert np.median(d) < 0.5 * FUS.voxel_size
    assert np.percentile(d, 95) < 2 * FUS.voxel_size
    # triangles are small (no cross-scene spaghetti from bad indexing)
    tri = verts.reshape(-1, 3, 3)
    edge = np.linalg.norm(tri[:, 0] - tri[:, 1], axis=-1)
    assert edge.max() < 3 * FUS.voxel_size


def test_mesh_crosses_block_boundaries():
    """A flat wall spanning many blocks must mesh without per-block gaps:
    cells on +x/+y/+z block faces need neighbor stitching."""
    hmap = hash_ops.create(HCFG)
    d = jnp.full((CAM.height, CAM.width), 1.5, dtype=jnp.float32)
    frame = pre.preprocess_metric(d, CAM)
    T = jnp.eye(4)
    hmap, _, _ = hash_ops.fuse_frame(hmap, frame, T, CAM, HCFG, FUS)
    verts, faces = meshing.extract_mesh(hmap, HCFG, FUS)
    assert len(faces) > 500
    # all on the z = 1.5 plane
    assert np.abs(verts[:, 2] - 1.5).max() < 1.5 * FUS.voxel_size
    # the meshed wall is contiguous in x: no gaps wider than a voxel
    # between sorted unique x coordinates over the central band
    band = np.abs(verts[:, 1]) < 0.3
    xs = np.unique(np.round(verts[band, 0] / FUS.voxel_size))
    gaps = np.diff(np.sort(xs))
    assert gaps.max() <= 1.0 + 1e-6, f"mesh gap of {gaps.max()} voxels"


def test_mesh_ply_roundtrip(tmp_path):
    hmap = _fused_map()
    path = str(tmp_path / "mesh.ply")
    n = meshing.export_mesh_ply(path, hmap, HCFG, FUS)
    assert n > 1000
    data = open(path, "rb").read()
    assert data.startswith(b"ply\nformat binary_little_endian")
    assert f"element face {n}".encode() in data[:400]
