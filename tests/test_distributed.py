"""Multi-host readiness helpers (parallel/distributed.py).

Real multi-process execution is environment-blocked; these pin the
single-process behavior of every helper the multi-host path relies on
(addressable == global here, so the same code paths run) plus the
host/device agreement of the owner-routing hash.  See MULTIHOST.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from voxelhashing_demo_tpu.config import HashConfig
from voxelhashing_demo_tpu.geometry import coords
from voxelhashing_demo_tpu.parallel import distributed, sharded


def test_global_mesh_covers_all_devices():
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("d",)
    # make_mesh is the same builder (no jax.devices()[:n] slicing logic)
    m8 = sharded.make_mesh(8)
    assert m8.devices.size == 8


def test_fetch_and_local_rows_single_process():
    mesh = sharded.make_mesh(8)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    dev = jax.device_put(x, NamedSharding(mesh, P("d")))
    assert not distributed.is_multiprocess()
    np.testing.assert_array_equal(distributed.fetch(dev), x)
    np.testing.assert_array_equal(distributed.local_rows(dev), x)
    # replicated arrays fetch too
    rep = jax.device_put(x, NamedSharding(mesh, P()))
    np.testing.assert_array_equal(distributed.fetch(rep), x)


def test_shard_rows_to_global_roundtrip():
    mesh = sharded.make_mesh(8)
    x = np.arange(32, dtype=np.int32)
    dev = distributed.shard_rows_to_global(x, mesh, P("d"))
    np.testing.assert_array_equal(np.asarray(dev), x)
    assert dev.sharding.spec == P("d")


def test_owner_np_matches_device_owner():
    """Host-side restore routing must agree with the device allocator's
    owner function on the full int32-wraparound hash."""
    cfg = HashConfig(num_buckets=2048)
    rng = np.random.default_rng(0)
    blocks = rng.integers(-512, 512, (4096, 3)).astype(np.int32)
    for n in (2, 8):
        host = sharded._owner_np(blocks, cfg.num_buckets, n)
        dev = np.asarray(sharded._owner(jnp.asarray(blocks), cfg, n))
        np.testing.assert_array_equal(host, dev)


def test_routed_restore_matches_store_contents(tiny_cfg):
    """Owner-routed sharded restore: keys packed into per-device slices
    come back accepted and land on their owning device's local table."""
    import dataclasses

    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.ops import hash_ops
    from voxelhashing_demo_tpu.utils.blockstore import BlockStore

    from voxelhashing_demo_tpu.config import CameraConfig

    n = 8
    cfg = dataclasses.replace(
        tiny_cfg,
        camera=CameraConfig(width=64, height=64, fx=52.0, fy=52.0,
                            cx=31.5, cy=31.5),
        hash=dataclasses.replace(tiny_cfg.hash, num_buckets=1024,
                                 num_blocks=1024, max_active=512,
                                 max_new_per_frame=512),
        stream=dataclasses.replace(tiny_cfg.stream, enabled=True,
                                   max_restore=512, max_evict=512),
    )
    mesh = sharded.make_mesh(n)
    slam = sharded.ShardedHashSLAM(cfg, mesh)

    V = cfg.hash.voxels_per_block
    rng = np.random.default_rng(1)
    blocks = np.array([[i % 5, i // 5, 1] for i in range(40)], np.int32)
    keys = np.asarray(
        coords.pack_block_key(jnp.asarray(blocks), cfg.hash.key_bits)
    )
    tsdf = rng.normal(size=(40, V)).astype(np.float32) * 0.05
    weight = rng.uniform(1, 5, size=(40, V)).astype(np.float32)
    born = rng.integers(0, 9, 40).astype(np.int32)
    slam.store.add(keys, tsdf, weight, born)

    slam._restore_keys(keys)
    assert len(slam.store) == 0, "all routed keys must be accepted"

    # every key must be findable on its owner device's local table with
    # its payload intact (gather the sharded map and lookup per shard)
    lcfg = sharded.local_hash_config(cfg.hash, n)
    hmap = jax.tree.map(np.asarray, slam.state.hmap)
    owner = sharded._owner_np(blocks, cfg.hash.num_buckets, n)
    T = lcfg.table_size
    R = lcfg.num_blocks
    for i, k in enumerate(keys):
        d = int(owner[i])
        tbl = slice(d * T, (d + 1) * T)
        rows = np.nonzero(hmap.keys[tbl] == k)[0]
        assert rows.size == 1, f"key {k} not on owner {d}"
        ptr = hmap.ptrs[tbl][rows[0]] + d * R
        np.testing.assert_array_equal(hmap.tsdf[ptr], tsdf[i])
        np.testing.assert_array_equal(hmap.weight[ptr], weight[i])
        assert hmap.born[ptr] == born[i]
