"""Benchmark: fused frames/s/chip (ICP tracking + hash fusion + raycast).

Runs the flagship 640x480 voxel-hash SLAM pipeline (the reference's
workload envelope: TUM intrinsics, 2 cm voxels — BASELINE.md) on the
default JAX platform (the real TPU chip under the driver) over a synthetic
depth sequence, and prints ONE JSON line:

    {"metric": "fused_frames_per_s_per_chip", "value": N, "unit": "fps",
     "vs_baseline": N / 30.0}

vs_baseline is against the >=30 fps/chip real-time bar (BASELINE.json; the
reference itself publishes no numbers — README.md:4-5, its renderer never
worked).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import synthetic

    config = flagship_config()
    cam = config.camera

    n_unique = 8
    warmup = 3
    measure = 24

    depths, _ = synthetic.make_sequence(
        cam, n_unique, trans_amp=0.06, rot_amp_deg=3.0
    )
    depths = [jnp.asarray(d) for d in depths]

    slam = hash_slam.HashSLAM(config)
    for i in range(warmup):
        slam.process(depths[i % n_unique])
    jax.block_until_ready(slam.state.pose)

    t0 = time.perf_counter()
    for i in range(measure):
        slam.process(depths[(warmup + i) % n_unique])
    jax.block_until_ready(slam.state.pose)
    dt = time.perf_counter() - t0

    fps = measure / dt
    print(
        json.dumps(
            {
                "metric": "fused_frames_per_s_per_chip",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
