"""Diagnose the chunked-scan regression (VERDICT r2 item 7): lax.scan
dispatch measured ~15% SLOWER per frame than back-to-back per-frame
dispatches (BENCH_r02: 47.9 vs 53.9 fps).

Hypotheses probed here:
  H1 carry double-buffering: the scan carry holds the ~270 MB map;
     if XLA double-buffers the carry instead of aliasing in place, every
     iteration pays a full map copy.  -> memory_analysis() temp size.
  H2 per-iteration slowdown vs fixed overhead: scan over K=2/4/8 frames;
     if per-frame time is flat in K, the cost is in the body itself.
  H3 dispatch pipelining: per-frame dispatches overlap host+tunnel
     latency with device compute; timing per-frame with a fetch after
     EVERY frame (pipeline broken) vs one fetch at the end shows how
     much the pipeline hides.

Run on TPU: python tools/exp_scan.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def main():
    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import synthetic

    config = flagship_config()
    cam = config.camera
    depths, _ = synthetic.make_room_sweep(cam, 40, sweep_deg=60.0,
                                          noise_seed=1)
    depths = [jnp.asarray(d) for d in depths]
    slam = hash_slam.HashSLAM(config)
    for d in depths[:24]:
        slam.process(d)
    _sync(slam.infos[-1].icp_error)

    step = hash_slam.make_step(config)
    frames8 = jnp.stack(depths[24:32])

    # compiled-memory introspection
    lowered_step = jax.jit(
        lambda s, d: hash_slam.step(s, d, config), donate_argnums=0
    ).lower(slam.state, depths[24])
    comp_step = lowered_step.compile()
    ma = comp_step.memory_analysis()
    print(f"step: temp={ma.temp_size_in_bytes/1e6:.1f} MB "
          f"out={ma.output_size_in_bytes/1e6:.1f} MB "
          f"alias={ma.alias_size_in_bytes/1e6:.1f} MB", flush=True)

    def chunk_fn(state, ds):
        return jax.lax.scan(
            lambda s, d: hash_slam.step(s, d, config), state, ds
        )

    lowered_scan = jax.jit(chunk_fn, donate_argnums=0).lower(
        slam.state, frames8
    )
    comp_scan = lowered_scan.compile()
    ma = comp_scan.memory_analysis()
    print(f"scan8: temp={ma.temp_size_in_bytes/1e6:.1f} MB "
          f"out={ma.output_size_in_bytes/1e6:.1f} MB "
          f"alias={ma.alias_size_in_bytes/1e6:.1f} MB", flush=True)

    # --- timing -----------------------------------------------------------
    n_rep = 12

    # per-frame, pipelined (fetch once at the end) — the bench's mode
    state = slam.state
    # warm
    state, info = step(state, depths[24])
    _sync(info.icp_error)
    t0 = time.perf_counter()
    for r in range(n_rep):
        for d in depths[25:33]:
            state, info = step(state, d)
    _sync(info.icp_error)
    pf_pipe = (time.perf_counter() - t0) / (n_rep * 8) * 1e3
    print(f"per-frame pipelined: {pf_pipe:.3f} ms/frame", flush=True)

    # per-frame, fetch EVERY frame (pipeline broken)
    t0 = time.perf_counter()
    for r in range(4):
        for d in depths[25:33]:
            state, info = step(state, d)
            _sync(info.icp_error)
    pf_sync = (time.perf_counter() - t0) / (4 * 8) * 1e3
    print(f"per-frame fetch-every-frame: {pf_sync:.3f} ms/frame",
          flush=True)

    # scan over K
    for K in (2, 4, 8):
        scan_k = jax.jit(
            lambda s, ds: jax.lax.scan(
                lambda c, d: hash_slam.step(c, d, config), s, ds
            ),
            donate_argnums=0,
        )
        fr = jnp.stack(depths[25 : 25 + K])
        state, infos = scan_k(state, fr)
        _sync(infos.icp_error)
        t0 = time.perf_counter()
        reps = max(1, n_rep * 8 // K)
        for r in range(reps):
            state, infos = scan_k(state, fr)
        _sync(infos.icp_error)
        ms = (time.perf_counter() - t0) / (reps * K) * 1e3
        print(f"scan K={K}: {ms:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
