"""On-chip A/B of the r5 pipelined streaming cycle: runs bench.py's
beyond-capacity streaming regime in isolation and prints its detail dict.

Usage: python tools/exp_stream_r5.py [interval]
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
    if len(sys.argv) > 1:
        import dataclasses

        config = dataclasses.replace(
            config,
            stream=dataclasses.replace(
                config.stream, interval=int(sys.argv[1])
            ),
        )
    out = bench._streaming_run(config, hash_slam, synthetic, metrics)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
