"""On-chip runner for the new r5 bench sections in isolation:
streaming_plus_backend (composed config-5) and per_closure_ba_incremental.

Usage: python tools/exp_r5_sections.py [sb] [inc]
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import bench
    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import metrics, synthetic

    config = flagship_config()
    which = sys.argv[1:] or ["sb", "inc"]
    if "sb" in which:
        out = bench._streaming_backend_run(
            config, hash_slam, synthetic, metrics
        )
        print("streaming_plus_backend:", json.dumps(out), flush=True)
    if "inc" in which:
        out = bench._backend_run(
            config, hash_slam, synthetic, metrics, warm_frames=40,
            frontend_baseline=False,
            kf_overrides=dict(ba_defer_edges=1, ba_defer_frames=0),
        )
        print("per_closure_ba_incremental:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
