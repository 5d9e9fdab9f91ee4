"""Golden tests for the depth frontend on synthetic planes
(reference kernels: CameraTrackingUtils.cu:50-113)."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import CameraConfig
from voxelhashing_demo_tpu.ops import preprocess as pre

CAM = CameraConfig(width=64, height=48, fx=52.0, fy=52.0, cx=31.5, cy=23.5,
                   depth_scale=5000.0)


def test_depth_to_meters_gating():
    raw = jnp.array([[0, 100, 5000, 30000]], dtype=jnp.uint16)
    d = pre.depth_to_meters(raw, CAM)
    np.testing.assert_allclose(d, [[0.0, 0.0, 1.0, 0.0]], atol=1e-6)
    # 100 units = 0.02 m < depth_min -> 0; 30000 units = 6 m > depth_max -> 0


def test_vertices_backproject_center():
    depth = jnp.full((48, 64), 2.0, dtype=jnp.float32)
    verts = pre.compute_vertices(depth, CAM)
    # the pixel at (cy, cx) ~ optical axis has x,y ~ 0
    v = verts[24, 32]
    assert abs(v[0]) < 0.05 and abs(v[1]) < 0.05
    np.testing.assert_allclose(v[2], 2.0, atol=1e-6)
    # reprojection: x = (u - cx)/fx * z
    v2 = verts[10, 5]
    np.testing.assert_allclose(v2[0], (5 - CAM.cx) / CAM.fx * 2.0, atol=1e-5)
    np.testing.assert_allclose(v2[1], (10 - CAM.cy) / CAM.fy * 2.0, atol=1e-5)


def test_normals_frontoparallel_plane():
    # plane z = 1.5 -> normals along -z (toward camera) or +z; they must be
    # consistent and unit length in the interior
    depth = jnp.full((48, 64), 1.5, dtype=jnp.float32)
    verts = pre.compute_vertices(depth, CAM)
    normals = pre.compute_normals(verts)
    inner = normals[2:-2, 2:-2]
    lens = jnp.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    # z-component dominates
    assert float(jnp.min(jnp.abs(inner[..., 2]))) > 0.99


def test_normals_tilted_plane():
    # plane: z = 1.5 + 0.3 * x_world. Solve z(1 - 0.3*(u-cx)/fx) = 1.5.
    u = jnp.arange(64, dtype=jnp.float32)[None, :]
    slope = 0.3
    xfac = (u - CAM.cx) / CAM.fx
    z = 1.5 / (1.0 - slope * xfac)
    depth = jnp.broadcast_to(z, (48, 64))
    verts = pre.compute_vertices(depth, CAM)
    normals = pre.compute_normals(verts)
    n = np.asarray(normals[24, 32])
    # analytic plane normal: (slope, 0, -1)/|.| up to sign
    expected = np.array([slope, 0.0, -1.0])
    expected /= np.linalg.norm(expected)
    if np.dot(n, expected) < 0:
        n = -n
    np.testing.assert_allclose(n, expected, atol=1e-2)


def test_normals_invalid_on_border_and_holes():
    depth = jnp.full((48, 64), 1.5, dtype=jnp.float32)
    depth = depth.at[20, 20].set(0.0)  # a hole
    verts = pre.compute_vertices(depth, CAM)
    normals = pre.compute_normals(verts)
    assert float(jnp.sum(jnp.abs(normals[0, :]))) == 0  # border rows zero
    assert float(jnp.sum(jnp.abs(normals[:, 0]))) == 0
    # neighbors of the hole are invalidated
    assert float(jnp.sum(jnp.abs(normals[20, 20]))) == 0
    assert float(jnp.sum(jnp.abs(normals[20, 21]))) == 0
    assert float(jnp.sum(jnp.abs(normals[19, 20]))) == 0


def test_downsample_depth():
    depth = jnp.arange(16, dtype=jnp.float32).reshape(4, 4) + 1.0
    down = pre.downsample_depth(depth, 2)
    assert down.shape == (2, 2)
    np.testing.assert_allclose(down, [[1.0, 3.0], [9.0, 11.0]])
    # holes are skipped, not averaged in
    d2 = depth.at[0, 0].set(0.0)
    down2 = pre.downsample_depth(d2, 2)
    np.testing.assert_allclose(down2[0, 0], 2.0)


def test_bilateral_filter_denoises_preserves_edges():
    import numpy as np

    from voxelhashing_demo_tpu.ops.preprocess import bilateral_filter

    rng = np.random.RandomState(0)
    H, W = 64, 64
    # step edge: left 1 m, right 2 m, plus sensor noise
    clean = np.where(np.arange(W)[None, :] < W // 2, 1.0, 2.0) * np.ones((H, W))
    noisy = clean + rng.normal(0, 0.01, (H, W))
    noisy[10, 10] = 0.0  # invalid pixel must stay invalid
    out = np.asarray(bilateral_filter(jnp.asarray(noisy, dtype=jnp.float32)))

    assert out[10, 10] == 0.0
    # noise reduced away from the edge
    left = (slice(20, 60), slice(4, 24))  # away from the injected invalid px
    assert np.std(out[left] - clean[left]) < 0.5 * np.std(
        noisy[left] - clean[left]
    )
    # edge not smeared: columns adjacent to the jump keep their side's depth
    assert abs(out[32, W // 2 - 2] - 1.0) < 0.02
    assert abs(out[32, W // 2 + 1] - 2.0) < 0.02


def test_frontend_config_enables_bilateral():
    import numpy as np

    from voxelhashing_demo_tpu.config import FrontendConfig

    rng = np.random.RandomState(1)
    raw = (5000 * (1.5 + rng.normal(0, 0.01, (48, 64)))).astype(np.uint16)
    f_off = pre.preprocess(jnp.asarray(raw), CAM, FrontendConfig())
    f_on = pre.preprocess(
        jnp.asarray(raw), CAM, FrontendConfig(bilateral=True)
    )
    # filtered depth is smoother
    assert float(jnp.std(f_on.depth[4:-4, 4:-4])) < float(
        jnp.std(f_off.depth[4:-4, 4:-4])
    )
