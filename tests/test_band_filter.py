"""Per-block band_min maintenance + the bit-exact splat surface filter."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import tiny_config
from voxelhashing_demo_tpu.models import hash_slam
from voxelhashing_demo_tpu.ops import hash_ops, splat as splat_ops
from voxelhashing_demo_tpu.utils import synthetic


def _run(n=5):
    cfg = tiny_config()
    depths, _ = synthetic.make_sequence(cfg.camera, n, trans_amp=0.05,
                                        rot_amp_deg=2.5)
    slam = hash_slam.HashSLAM(cfg)
    for d in depths:
        slam.process(d)
    return cfg, slam


def test_band_min_matches_rows():
    """band_min equals the row-wise min |sdf| over weighted voxels for
    every allocated block (inf where no weighted voxel)."""
    cfg, slam = _run()
    h = slam.state.hmap
    w = np.asarray(h.weight)
    t = np.asarray(h.tsdf)
    expect = np.where(w > 0, np.abs(t), np.inf).min(axis=1)
    got = np.asarray(h.band_min)
    ptrs = np.asarray(h.ptrs)
    live_rows = np.unique(ptrs[ptrs >= 0])
    np.testing.assert_allclose(got[live_rows], expect[live_rows],
                               rtol=0, atol=0)


def test_surface_filter_is_bit_exact_and_smaller():
    """Splatting the filtered set produces the identical depth buffer with
    strictly fewer blocks (band-only truncation blocks drop out)."""
    cfg, slam = _run()
    h = slam.state.hmap
    pose = slam.state.pose
    active = hash_ops.compact_visible(
        h, cfg.hash, pose, cfg.camera, cfg.fusion
    )
    band = cfg.raycast.splat_band * cfg.fusion.voxel_size
    surf = splat_ops.surface_filter(h, active, band)
    assert int(surf.count) < int(active.count)
    assert int(surf.count) > 0

    d_all = splat_ops.splat_depth_from_map(
        h, active, cfg.hash, pose, cfg.camera, cfg.raycast, cfg.fusion
    )
    d_surf = splat_ops.splat_depth_from_map(
        h, surf, cfg.hash, pose, cfg.camera, cfg.raycast, cfg.fusion
    )
    np.testing.assert_array_equal(np.asarray(d_all), np.asarray(d_surf))


def test_band_min_survives_evict_restore_roundtrip():
    """Streaming eviction + restore rebuilds band_min from the payload."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, stream=dataclasses.replace(cfg.stream, enabled=True,
                                        interval=2, max_age=2)
    )
    depths, _ = synthetic.make_sequence(cfg.camera, 6, trans_amp=0.3,
                                        rot_amp_deg=12.0)
    slam = hash_slam.HashSLAM(cfg)
    for d in depths:
        slam.process(d)
    h = slam.state.hmap
    w = np.asarray(h.weight)
    t = np.asarray(h.tsdf)
    expect = np.where(w > 0, np.abs(t), np.inf).min(axis=1)
    ptrs = np.asarray(h.ptrs)
    live_rows = np.unique(ptrs[ptrs >= 0])
    np.testing.assert_allclose(np.asarray(h.band_min)[live_rows],
                               expect[live_rows], rtol=0, atol=0)
