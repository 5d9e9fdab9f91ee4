"""Unit tests for the coordinate algebra, pinned to the reference's exact
integer semantics (reference: VoxelUtils.cu:250-326)."""

import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.geometry import coords


def test_world2voxel_round_half_away():
    # reference VoxelUtils.cu:281-287: trunc(p/size + copysign(0.5, p))
    vs = 1.0
    pts = jnp.array(
        [
            [0.0, 0.49, 0.51],
            [-0.49, -0.51, -1.5],
            [1.5, 2.49, -2.49],
        ]
    )
    out = coords.world2voxel(pts, vs)
    expected = np.array([[0, 0, 1], [0, -1, -2], [2, 2, -2]])
    np.testing.assert_array_equal(out, expected)


def test_voxel2block_negative_floor():
    # reference VoxelUtils.cu:266-278 with size 8: -1..-8 -> block -1
    v = jnp.array([[0, 7, 8], [-1, -8, -9], [15, -16, -17]])
    out = coords.voxel2block(v, 8)
    expected = np.array([[0, 0, 1], [-1, -1, -2], [1, -2, -3]])
    np.testing.assert_array_equal(out, expected)


def test_block_voxel_roundtrip():
    b = jnp.array([[0, 1, -1], [5, -3, 2]])
    v = coords.block2voxel(b, 8)
    np.testing.assert_array_equal(coords.voxel2block(v, 8), b)
    # every voxel inside the block maps back to the block
    for off in ([0, 0, 0], [7, 7, 7], [3, 0, 6]):
        np.testing.assert_array_equal(
            coords.voxel2block(v + jnp.array(off), 8), b
        )


def test_world_voxel_roundtrip():
    vs = 0.02
    v = jnp.array([[10, -7, 100], [-200, 3, 0]], dtype=jnp.int32)
    w = coords.voxel2world(v, vs)
    np.testing.assert_array_equal(coords.world2voxel(w, vs), v)


def test_linearize_delinearize():
    # reference VoxelUtils.cu:311-326: z-major
    size = 8
    local = jnp.array([[1, 2, 3], [0, 0, 0], [7, 7, 7]])
    lin = coords.linearize_voxel(local, size)
    np.testing.assert_array_equal(lin, [3 * 64 + 2 * 8 + 1, 0, 511])
    np.testing.assert_array_equal(coords.delinearize_voxel(lin, size), local)


def test_spatial_hash_matches_reference_formula():
    # reference VoxelUtils.cu:250-259 with int32 overflow semantics
    num_buckets = 5000
    blocks = np.array(
        [[0, 0, 0], [1, 2, 3], [-1, -2, -3], [1000, -2000, 31], [7, 7, 7]],
        dtype=np.int64,
    )

    def ref_hash(b):
        x = np.int32(np.int64(b[0]) * 73856093 & 0xFFFFFFFF)
        y = np.int32(np.int64(b[1]) * 19349669 & 0xFFFFFFFF)
        z = np.int32(np.int64(b[2]) * 83492791 & 0xFFFFFFFF)
        res = int(x ^ y ^ z) % num_buckets
        return res  # python % already wraps negatives like the CUDA fixup

    got = coords.spatial_hash(jnp.asarray(blocks, dtype=jnp.int32), num_buckets)
    expected = [ref_hash(b) for b in blocks]
    np.testing.assert_array_equal(got, expected)


def test_pack_unpack_key():
    b = jnp.array(
        [[0, 0, 0], [1, -1, 511], [-512, 100, -7], [25, -25, 3]],
        dtype=jnp.int32,
    )
    keys = coords.pack_block_key(b)
    assert jnp.all(keys >= 0)
    assert jnp.all(keys != coords.EMPTY_KEY)
    np.testing.assert_array_equal(coords.unpack_block_key(keys), b)


def test_pack_key_unique():
    rng = np.random.default_rng(0)
    b = rng.integers(-256, 256, size=(4096, 3)).astype(np.int32)
    keys = np.asarray(coords.pack_block_key(jnp.asarray(b)))
    uniq_blocks = len(np.unique(b, axis=0))
    assert len(np.unique(keys)) == uniq_blocks
