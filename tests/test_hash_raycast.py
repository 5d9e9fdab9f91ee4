"""Tests for raycasting through the hash table: direct probe sampler vs the
dense-cache path, and golden scene reconstruction."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import (
    CameraConfig,
    FusionConfig,
    HashConfig,
    RaycastConfig,
)
from voxelhashing_demo_tpu.geometry import se3
from voxelhashing_demo_tpu.ops import hash_ops, hash_raycast
from voxelhashing_demo_tpu.ops import preprocess as pre
from voxelhashing_demo_tpu.utils import synthetic

CAM = CameraConfig(width=160, height=120, fx=129.3, fy=129.1, cx=79.65,
                   cy=59.8)
FUS = FusionConfig(voxel_size=0.02, truncation=0.08)
HCFG = HashConfig(num_buckets=8192, bucket_size=4, num_blocks=8192,
                  max_active=4096, max_new_per_frame=4096)
RC = RaycastConfig(max_steps=128, cache_dims=(192, 192, 192))


def _fused_scene():
    hmap = hash_ops.create(HCFG)
    active = None
    for t in (0.0, 0.5):
        T = jnp.asarray(synthetic.orbit_pose(t, 0.05, 2.0))
        d = synthetic.render_depth(T, CAM)
        frame = pre.preprocess_metric(d, CAM)
        hmap, active, _ = hash_ops.fuse_frame(hmap, frame, T, CAM, HCFG, FUS)
    return hmap, active


def test_direct_sampler_matches_cache():
    hmap, _ = _fused_scene()
    # active set for the identity pose (the cache is view-local)
    active = hash_ops.compact_visible(hmap, HCFG, se3.identity(), CAM, FUS)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        rng.uniform([-0.5, -0.3, 1.0], [0.5, 0.6, 2.2], size=(256, 3)),
        dtype=jnp.float32,
    )
    s_direct, w_direct = hash_raycast.sample_hash_trilinear(
        hmap, HCFG, FUS, pts
    )
    cache = hash_raycast.densify_active(
        hmap, active, HCFG, FUS, se3.identity(), RC.cache_dims
    )
    from voxelhashing_demo_tpu.ops.tsdf import trilinear_sample

    s_cache, w_cache = trilinear_sample(cache, pts)
    known_cache = np.asarray(w_cache) > 0
    known_direct = np.asarray(w_direct) > 0
    assert known_cache.mean() > 0.1  # enough points land in the TSDF band
    # every cache-known point is direct-known with identical value (the
    # cache may lack out-of-frustum blocks the direct probe sees)
    assert not (known_cache & ~known_direct).any()
    np.testing.assert_allclose(
        np.asarray(s_direct)[known_cache],
        np.asarray(s_cache)[known_cache],
        atol=1e-5,
    )


def test_hash_raycast_matches_scene():
    hmap, active = _fused_scene()
    T = se3.identity()
    out = hash_raycast.raycast_hash(
        hmap, active, HCFG, T, CAM, RC, FUS, cache_dims=RC.cache_dims
    )
    d_true = synthetic.render_depth(T, CAM)
    both = np.asarray(out.hit) & (np.asarray(d_true) > 0)
    coverage = both.sum() / max((np.asarray(d_true) > 0).sum(), 1)
    assert coverage > 0.8, f"coverage {coverage}"
    err = np.abs(np.asarray(out.depth) - np.asarray(d_true))[both]
    assert np.median(err) < FUS.voxel_size


def test_cache_centering_far_from_origin():
    # blocks far from the world origin must still land in the cache when
    # the camera is there
    hmap = hash_ops.create(HCFG)
    offset = jnp.array([5.0, 0.0, 0.0])  # 5 m away
    T = jnp.eye(4).at[:3, 3].set(offset)
    d = jnp.full((CAM.height, CAM.width), 1.5, dtype=jnp.float32)
    frame = pre.preprocess_metric(d, CAM)
    hmap, active, n = hash_ops.fuse_frame(hmap, frame, T, CAM, HCFG, FUS)
    assert int(n) > 0
    out = hash_raycast.raycast_hash(
        hmap, active, HCFG, T, CAM, RC, FUS, cache_dims=RC.cache_dims
    )
    hit = np.asarray(out.hit)
    assert hit.mean() > 0.8
    err = np.abs(np.asarray(out.depth)[hit] - 1.5)
    assert np.median(err) < FUS.voxel_size
