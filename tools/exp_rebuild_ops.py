"""Isolate the streaming rebuild's device costs: fuse_only, spill_evict,
and the spill payload pull, each timed with value-fetch sync on the real
chip at the composed-regime map scale.

Usage: python tools/exp_rebuild_ops.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax.numpy as jnp

    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import hash_slam, keyframe_slam
    from voxelhashing_demo_tpu.ops import hash_ops
    from voxelhashing_demo_tpu.utils import synthetic

    config = flagship_config()
    cfg = dataclasses.replace(
        config,
        hash=dataclasses.replace(
            config.hash, num_buckets=8192, bucket_size=4, num_blocks=2048,
            max_active=2048, max_new_per_frame=2048,
        ),
        stream=dataclasses.replace(
            config.stream, enabled=True, interval=12, max_age=24,
            max_evict=2048, max_restore=2048,
        ),
    )
    cam = cfg.camera
    depths, gt = synthetic.make_room_sweep(cam, 24, sweep_deg=170.0,
                                           noise_seed=1)
    poses = [jnp.asarray(np.asarray(g, np.float32)) for g in gt]
    depths = [jnp.asarray(d) for d in depths]

    slam = hash_slam.HashSLAM(cfg)
    fuse_only = keyframe_slam.make_fuse_only(cfg)

    def sync(x):
        return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel")
                                else x))

    # warm
    hm = hash_ops.create(cfg.hash)
    spill = slam.spill_begin()
    hm = fuse_only(hm, depths[0], poses[0], jnp.int32(0))
    hm = slam.spill_evict(hm, 0, spill)
    sync(spill["count"])

    # timed: 20 x (fuse + evict), one dispatch chain, fetch at end
    hm = hash_ops.create(cfg.hash)
    spill = slam.spill_begin()
    sync(hm.band_min)
    t0 = time.perf_counter()
    for i in range(20):
        hm = fuse_only(hm, depths[i], poses[i], jnp.int32(i * 10))
        hm = slam.spill_evict(hm, i * 10, spill)
    n = sync(spill["count"])
    t_chain = time.perf_counter() - t0
    print(f"20x fuse+evict chain: {t_chain:.3f} s  spill n={int(n)}",
          flush=True)

    # timed: fuse only, 20x
    hm2 = hash_ops.create(cfg.hash)
    sync(hm2.band_min)
    t0 = time.perf_counter()
    for i in range(20):
        hm2 = fuse_only(hm2, depths[i], poses[i], jnp.int32(i * 10))
    sync(hm2.band_min)
    t_fuse = time.perf_counter() - t0
    print(f"20x fuse only: {t_fuse:.3f} s", flush=True)

    # timed: payload pull at b=4096
    t0 = time.perf_counter()
    arr = np.asarray(spill["payload"][:4096])
    t_pull = time.perf_counter() - t0
    print(f"payload pull 4096 rows ({arr.nbytes/1e6:.1f} MB): "
          f"{t_pull:.3f} s", flush=True)

    # timed: head pull
    t0 = time.perf_counter()
    head = np.asarray(hash_slam.make_spill_head(cfg, spill["cap"])(
        spill["count"], spill["keys"]
    ))
    t_head = time.perf_counter() - t0
    print(f"head pull ({head.nbytes/1e3:.0f} KB): {t_head:.3f} s",
          flush=True)


if __name__ == "__main__":
    main()
