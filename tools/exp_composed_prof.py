"""Profile the composed streaming+backend regime: where do the seconds go?

Runs bench._streaming_backend_run's workload with per-frame wall-clock
capture, then prints the time split: steady frames vs keyframe frames vs
BA/rebuild events vs streaming cycle boundaries.

Usage: python tools/exp_composed_prof.py [interval] [max_age]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax.numpy as jnp

    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import keyframe_slam
    from voxelhashing_demo_tpu.utils import metrics, synthetic

    interval = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_age = int(sys.argv[2]) if len(sys.argv) > 2 else 2 * interval
    config = flagship_config()
    cfg = dataclasses.replace(
        config,
        hash=dataclasses.replace(
            config.hash, num_buckets=8192, bucket_size=4, num_blocks=2048,
            max_active=2048, max_new_per_frame=2048,
        ),
        stream=dataclasses.replace(
            config.stream, enabled=True, interval=interval,
            max_age=max_age, max_evict=2048, max_restore=2048,
        ),
        keyframes=dataclasses.replace(
            config.keyframes, min_loop_separation=8, loop_radius=0.35,
            min_rotation_deg=15.0, min_translation=0.25,
            rebuild_move_min_trans=0.02, rebuild_move_min_rot_deg=1.0,
        ),
    )
    cam = cfg.camera
    num_frames = 200
    half = num_frames // 2 + 1
    fwd, gt_f = synthetic.make_room_sweep(
        cam, half, sweep_deg=170.0, noise_seed=1
    )
    depths = [jnp.asarray(d) for d in fwd + fwd[-2::-1]]
    gt = gt_f + gt_f[-2::-1]
    n = len(depths)

    warm = keyframe_slam.KeyframeSLAM(cfg)
    wmini = depths[:16] + depths[:16][-2::-1]
    for d in wmini:
        warm.process(d)
    warm.flush()
    float(warm.infos[-1].icp_error)
    warm.warm_compile(depths[0])
    del warm

    slam = keyframe_slam.KeyframeSLAM(cfg)
    info = slam.process(depths[0])
    float(info.icp_error)
    frame_s = []
    kf_count_before = []
    t0 = time.perf_counter()
    for d in depths[1:]:
        kf_count_before.append(len(slam.keyframes))
        t1 = time.perf_counter()
        info = slam.process(d)
        frame_s.append(time.perf_counter() - t1)
    slam.flush()
    float(info.icp_error)
    total = time.perf_counter() - t0
    fps = (n - 1) / total
    t0 = time.perf_counter()
    slam._driver.stream_sync()
    drain_s = round(time.perf_counter() - t0, 3)

    frame_s = np.asarray(frame_s)
    kf_frames = np.asarray(
        [len(slam.keyframes) > k for k in kf_count_before]
    ) if kf_count_before else np.zeros(0, bool)
    ba_s = sum(e.get("ba_s", 0.0) for e in slam.ba_events)
    rb_s = sum(e.get("rebuild_s", 0.0) for e in slam.ba_events)
    modes = [e.get("rebuild_mode") for e in slam.ba_events
             if e.get("map_rebuilt")]
    store = slam._driver.store
    out = {
        "fps": round(fps, 2),
        "total_s": round(total, 2),
        "final_drain_s": drain_s,
        "sum_frame_s": round(float(frame_s.sum()), 2),
        "tail_s": round(total - float(frame_s.sum()), 2),
        "p50_ms": round(float(np.median(frame_s)) * 1e3, 1),
        "p90_ms": round(float(np.percentile(frame_s, 90)) * 1e3, 1),
        "worst10_s": [round(float(x), 3) for x in
                      np.sort(frame_s)[-10:][::-1]],
        "n_over_100ms": int((frame_s > 0.1).sum()),
        "sum_over_100ms_s": round(float(frame_s[frame_s > 0.1].sum()), 2),
        "kf_frame_sum_s": round(float(frame_s[kf_frames].sum()), 2),
        "n_kf": int(kf_frames.sum()),
        "ba_runs": len(slam.ba_events),
        "ba_s": round(ba_s, 2),
        "rebuild_s": round(rb_s, 2),
        "rebuild_modes": modes,
        "keyframes": len(slam.keyframes),
        "evicted": store.total_evicted,
        "restored": store.total_restored,
        "ate_mm": round(1e3 * float(metrics.ate_rmse(
            slam.trajectory(), gt, align=False)), 1),
    }
    print(json.dumps(out), flush=True)
    for e in slam.ba_events:
        print(json.dumps(e), flush=True)
    agg = {}
    for t in slam._kf_insert_s:
        for k, v in t.items():
            agg[k] = round(agg.get(k, 0.0) + v, 3)
    print("kf_insert_sum:", json.dumps(agg), len(slam._kf_insert_s),
          flush=True)
    print("kf_inserts:", json.dumps(slam._kf_insert_s[:8]), flush=True)


if __name__ == "__main__":
    main()
