"""Pallas VMEM-window depth gather: semantics vs the plain XLA gather.

Runs in interpret mode on the CPU mesh (tests/conftest.py forces CPU);
TPU lowering/perf is exercised by tools/exp_pallas_landed.py on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelhashing_demo_tpu.ops import pallas_gather as pg

H, W = 480, 640
C, V = 16, 512


def _mk_case(seed, spread):
    """(v, u, valid) with per-block footprints of the given pixel spread."""
    rng = np.random.default_rng(seed)
    v0 = rng.integers(0, H - spread, size=(C, 1))
    u0 = rng.integers(0, W - spread, size=(C, 1))
    v = v0 + rng.integers(0, spread, size=(C, V))
    u = u0 + rng.integers(0, spread, size=(C, V))
    valid = rng.random((C, V)) > 0.15
    return (jnp.asarray(v, jnp.int32), jnp.asarray(u, jnp.int32),
            jnp.asarray(valid))


@pytest.mark.parametrize("fn", [pg.gather_depth_window,
                                pg.gather_depth_window_streamed])
def test_matches_xla_gather_within_window(fn):
    key = jax.random.PRNGKey(0)
    depth = jax.random.uniform(key, (H, W), dtype=jnp.float32) + 0.5
    v, u, valid = _mk_case(1, spread=120)  # footprint < WIN: full coverage
    vals, covered = fn(depth, v, u, valid, interpret=True)
    np.testing.assert_array_equal(np.asarray(covered), np.asarray(valid))
    ref = jnp.where(valid, depth[v, u], 0.0)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref))


def test_wide_footprint_drops_only_out_of_window():
    """Blocks whose footprint exceeds WIN px: covered ⊆ valid, values exact
    wherever covered, and the uncovered set is exactly the out-of-window
    voxels."""
    key = jax.random.PRNGKey(2)
    depth = jax.random.uniform(key, (H, W), dtype=jnp.float32) + 0.5
    v, u, valid = _mk_case(3, spread=400)  # wider than WIN
    vals, covered = pg.gather_depth_window(depth, v, u, valid,
                                           interpret=True)
    cov, val = np.asarray(covered), np.asarray(valid)
    assert (cov & ~val).sum() == 0
    assert cov.sum() < val.sum()  # something was genuinely clipped
    ref = np.asarray(depth)[np.asarray(v), np.asarray(u)]
    got = np.asarray(vals)
    np.testing.assert_array_equal(got[cov], ref[cov])
    assert (got[~cov] == 0).all()


def test_integrate_with_pallas_gather_matches_xla():
    """hash_ops.integrate with use_pallas_gather on (interpret mode on
    CPU) produces the same map as the XLA gather path on a room-scale
    scene (footprints < WIN at these depths, so coverage is total)."""
    import dataclasses

    from voxelhashing_demo_tpu.config import tiny_config
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import synthetic

    cfg = tiny_config()
    cfg_p = dataclasses.replace(
        cfg, hash=dataclasses.replace(cfg.hash, use_pallas_gather=True)
    )
    depths, _ = synthetic.make_sequence(cfg.camera, 3, trans_amp=0.05,
                                        rot_amp_deg=2.5)
    a = hash_slam.HashSLAM(cfg)
    b = hash_slam.HashSLAM(cfg_p)
    for d in depths:
        a.process(d)
        b.process(d)
    np.testing.assert_array_equal(np.asarray(a.state.hmap.tsdf),
                                  np.asarray(b.state.hmap.tsdf))
    np.testing.assert_array_equal(np.asarray(a.state.hmap.weight),
                                  np.asarray(b.state.hmap.weight))
    np.testing.assert_allclose(np.asarray(a.state.pose),
                               np.asarray(b.state.pose), atol=1e-6)


def test_window_origins_ignore_invalid_coords():
    """Invalid voxels (clamped garbage coords) must not stretch the
    window: a block whose valid voxels sit in a tight patch stays fully
    covered even when invalid entries point at the far image corner."""
    v = jnp.full((8, V), 100, jnp.int32)
    u = jnp.full((8, V), 200, jnp.int32)
    valid = jnp.ones((8, V), bool)
    v = v.at[:, 0].set(H - 1)
    u = u.at[:, 0].set(W - 1)
    valid = valid.at[:, 0].set(False)
    v0, u0, dv, du, in_win = pg.window_origins(v, u, valid, H, W)
    assert (np.asarray(in_win)[:, 1:]).all()
