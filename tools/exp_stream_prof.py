"""Per-phase timing of the pipelined streaming cycle on the real chip.

Monkeypatches HashSLAM._stream_cycle with a phase-timed twin and runs the
bench's beyond-capacity regime.  Prints aggregate ms per phase per cycle.
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses

    import bench
    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.models.hash_slam import HashSLAM, _bucket
    from voxelhashing_demo_tpu.utils import metrics, synthetic

    agg = {}
    counts = {"cycles": 0, "restores": 0, "evicts": 0}

    def mark(name, t0):
        t1 = time.perf_counter()
        agg[name] = agg.get(name, 0.0) + (t1 - t0)
        return t1

    def timed_cycle(self, horizon=None):
        s = self.config.stream
        st = self.state
        counts["cycles"] += 1
        t = time.perf_counter()
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
            counts["restores"] += 1
        t = mark("1_restore_dispatch", t)
        hmap, keys_e, payload, sync = self._evict(
            st.hmap, st.frame_idx, st.pose, st.vel, acc
        )
        self.state = st._replace(hmap=hmap)
        t = mark("2_evict_dispatch", t)
        self._land_pending_evict()
        t = mark("3_land_pending", t)
        arr = np.asarray(sync)
        t = mark("4_sync_fetch", t)
        n = int(arr[0])
        pose = arr[1:17].reshape(4, 4)
        vel = arr[17:33].reshape(4, 4)
        if taken_keys is not None:
            self.store.take(
                taken_keys, arr[33 : 33 + taken_keys.shape[0]] > 0.5
            )
        t = mark("5_take", t)
        if n > 0:
            counts["evicts"] += 1
            b = _bucket(n, s.max_evict)
            keys_slice = keys_e[:b]
            pay_slice = payload[:b]
            for x in (keys_slice, pay_slice):
                x.copy_to_host_async()
            self._pending_evict = (keys_slice, pay_slice, b)
        t = mark("6_d2h_start", t)
        if len(self.store):
            hor = 2 * s.interval if horizon is None else horizon
            pred = pose @ np.linalg.matrix_power(vel, hor)
            keys = self.store.query_frustum(
                pred, self.config.camera, self.config.fusion,
                s.restore_margin_px, s.max_restore,
            )
            t = mark("7_query", t)
            if keys.size:
                packed, bb = self._pack_restore(keys)
                t = mark("8_pack", t)
                self._prefetch = (keys, jnp.asarray(packed), bb)
                t = mark("9_upload_dispatch", t)

    HashSLAM._stream_cycle = timed_cycle

    config = flagship_config()
    t0 = time.perf_counter()
    out = bench._streaming_run(config, hash_slam, synthetic, metrics)
    total = time.perf_counter() - t0
    print(out, flush=True)
    print(f"counts: {counts}  wall(incl warm): {total:.1f}s", flush=True)
    C = max(counts["cycles"], 1)
    for k in sorted(agg):
        print(f"  {k}: {1e3 * agg[k] / C:7.1f} ms/cycle "
              f"(total {agg[k]:6.2f} s)", flush=True)


if __name__ == "__main__":
    main()
