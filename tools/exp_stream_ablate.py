"""On-chip ablation of the streaming cycle: which half costs the fps?

Variants (monkeypatched into HashSLAM):
  full      — the real pipelined cycle
  no_restore— evict + pull only (store fills, nothing comes back)
  no_pull   — evict dispatch but payload never pulled (data dropped),
              restore still runs from whatever the store holds
  no_stream — streaming disabled entirely at the same small-map scale
              (map overflows: throughput ceiling, ATE invalid)
  steps_only— same config, stream disabled, num_blocks raised so the
              sweep fits: the pure step-rate ceiling

Each prints fps; differences attribute the cycle cost.
"""

import sys
import time

sys.path.insert(0, ".")

import dataclasses

import jax.numpy as jnp
import numpy as np


def run(tag, cfg, patch=None):
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import synthetic

    cam = cfg.camera
    half = 101
    fwd, _ = synthetic.make_room_sweep(cam, half, sweep_deg=170.0,
                                       noise_seed=1)
    depths = [jnp.asarray(d) for d in fwd + fwd[-2::-1]]
    n = len(depths)

    warm = hash_slam.HashSLAM(cfg)
    if patch:
        patch(warm)
    wmini = depths[:16] + depths[:16][-2::-1]
    for d in wmini:
        warm.process(d)
    _ = float(np.asarray(warm.infos[-1].icp_error))
    del warm

    slam = hash_slam.HashSLAM(cfg)
    if patch:
        patch(slam)
    info = slam.process(depths[0])
    _ = float(np.asarray(info.icp_error))
    t0 = time.perf_counter()
    for d in depths[1:]:
        info = slam.process(d)
    _ = float(np.asarray(info.icp_error))
    fps = (n - 1) / (time.perf_counter() - t0)
    print(f"{tag:11s}: {fps:6.2f} fps", flush=True)


def main():
    from __graft_entry__ import flagship_config

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

    big = dataclasses.replace(
        cfg,
        hash=dataclasses.replace(cfg.hash, num_buckets=32768,
                                 num_blocks=8192, max_active=4096),
        stream=dataclasses.replace(cfg.stream, enabled=False),
    )
    run("steps_only", big)

    run("full", cfg)

    def no_restore(slam):
        orig = type(slam)._complete_work

        def patched(self, inflight, horizon):
            # run everything except the prefetch query/upload
            st = self.store
            orig(self, inflight, horizon)
            self._prefetch = None

        slam._complete_work = patched.__get__(slam)

    run("no_restore", cfg, no_restore)

    def no_pull(slam):
        def patched_dispatch(self):
            self._join_complete()
            st = self.state
            acc = self._zero_accept
            taken_keys = None
            if self._prefetch is not None:
                keys, packed_dev, b = self._prefetch
                self._prefetch = None
                hmap, acc = self._restore_for(b)(
                    st.hmap, packed_dev, st.frame_idx
                )
                st = st._replace(hmap=hmap)
                taken_keys = keys
            hmap, keys_e, payload, sync = self._evict(
                st.hmap, st.frame_idx, st.pose, st.vel, acc
            )
            self.state = st._replace(hmap=hmap)
            self._pending_evict = None   # DROP the payload
            self._inflight = (sync, taken_keys, 0, keys_e, payload)

        slam._cycle_dispatch = patched_dispatch.__get__(slam)

    run("no_pull", cfg, no_pull)


if __name__ == "__main__":
    main()
