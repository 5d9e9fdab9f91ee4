"""Isolate the streaming restore cost on the real chip.

1. Times a single restore dispatch+consume per bucket size, cold vs warm
   (is the cost compile, upload arrival, or execution?).
2. Re-runs the full streaming regime with restore buckets PRE-COMPILED.
"""

import sys
import time

sys.path.insert(0, ".")

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.geometry.coords import EMPTY_KEY
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.ops import hash_ops

    base = flagship_config()
    cfg = dataclasses.replace(
        base,
        hash=dataclasses.replace(
            base.hash, num_buckets=8192, bucket_size=4, num_blocks=2048,
            max_active=2048, max_new_per_frame=2048,
        ),
        stream=dataclasses.replace(
            base.stream, enabled=True, interval=8, max_age=16,
            max_evict=2048, max_restore=2048,
        ),
    )
    V = cfg.hash.voxels_per_block

    hmap = hash_ops.create(cfg.hash)
    for b in (256, 512):
        packed = np.zeros((b, 2 + 2 * V), np.float32)
        packed[:, 0] = np.full(b, EMPTY_KEY, np.int32).view(np.float32)
        jit = hash_slam.make_restore(cfg, b)
        for trial in range(3):
            dev = jnp.asarray(packed)
            t0 = time.perf_counter()
            hmap, acc = jit(hmap, dev, jnp.int32(0))
            t1 = time.perf_counter()
            _ = np.asarray(acc[:1])
            t2 = time.perf_counter()
            tag = "cold" if trial == 0 else "warm"
            print(f"restore b={b} {tag}: dispatch={1e3*(t1-t0):8.1f} ms "
                  f"consume={1e3*(t2-t1):8.1f} ms", flush=True)

    # the pull jits too
    for b in (128, 256, 512):
        jit = hash_slam.make_pull(cfg, b)
        sync = jnp.zeros((33 + cfg.stream.max_restore,), jnp.float32)
        keys = jnp.zeros((b,), jnp.int32)
        pay = jnp.zeros((b, 2 * V + 1), jnp.float32)
        for trial in range(2):
            t0 = time.perf_counter()
            out = jit(sync, keys, pay)
            _ = np.asarray(out[:1])
            t1 = time.perf_counter()
            tag = "cold" if trial == 0 else "warm"
            print(f"pull b={b} {tag}: {1e3*(t1-t0):8.1f} ms", flush=True)

    # full regime with everything precompiled
    import bench
    from voxelhashing_demo_tpu.utils import metrics, synthetic

    out = bench._streaming_run(flagship_config(), hash_slam, synthetic,
                               metrics)
    print(out, flush=True)


if __name__ == "__main__":
    main()
