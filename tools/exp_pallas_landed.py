"""TPU lowering + timing probe for the LANDED Pallas window gather.

Compares, at flagship shapes (C=128 blocks x 512 voxels, 640x480 image):
  - XLA random gather (the default integrate path's depth lookup)
  - ops/pallas_gather.gather_depth_window (compact in-kernel broadcast)
  - ops/pallas_gather.gather_depth_window_streamed (pre-broadcast fallback)
and checks value equality on realistic block footprints.

Run on the real chip:  python tools/exp_pallas_landed.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.ops import pallas_gather as pg

H, W = 480, 640
C, V = 128, 512


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "ravel"):
        leaf = leaf.ravel()[0]  # device-side slice: O(1) transfer
    return float(np.asarray(leaf))


def timeit(name, fn, *args, n=30):
    try:
        _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return False
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms",
          flush=True)
    return True


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    depth = jnp.asarray(
        rng.uniform(0.5, 3.5, (H, W)).astype(np.float32)
    )
    # realistic footprints: ~60-160 px spread per block
    spread = rng.integers(40, 160, size=(C, 1))
    v0 = rng.integers(0, H - 170, size=(C, 1))
    u0 = rng.integers(0, W - 170, size=(C, 1))
    v = jnp.asarray((v0 + rng.integers(0, spread, (C, V)) %
                     np.maximum(spread, 1)).astype(np.int32))
    u = jnp.asarray((u0 + rng.integers(0, spread, (C, V)) %
                     np.maximum(spread, 1)).astype(np.int32))
    valid = jnp.asarray(rng.random((C, V)) > 0.1)

    xla = jax.jit(lambda d, vv, uu, m: jnp.where(m, d[vv, uu], 0.0))
    timeit("XLA gather (C,V) from image", xla, depth, v, u, valid)
    ref = np.asarray(xla(depth, v, u, valid))

    for name, fn in [
        ("pallas window gather (compact)", pg.gather_depth_window),
        ("pallas window gather (streamed)",
         pg.gather_depth_window_streamed),
    ]:
        ok = timeit(name, fn, depth, v, u, valid)
        if ok:
            vals, covered = fn(depth, v, u, valid)
            vals, covered = np.asarray(vals), np.asarray(covered)
            assert covered.sum() == np.asarray(valid).sum(), (
                "unexpected clipping at these footprints"
            )
            err = np.abs(vals - ref).max()
            print(f"  max |err| vs XLA: {err:.2e}")

    # full fused step with the flag off vs on (donated state: the honest
    # in-step comparison — standalone integrate jits copy the 268 MB map
    # per call, see BENCH_NOTES.md)
    import dataclasses

    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import synthetic

    from __graft_entry__ import flagship_config

    base = flagship_config()
    depths, _ = synthetic.make_room_sweep(base.camera, 24, sweep_deg=40.0,
                                          noise_seed=1)
    depths = [jnp.asarray(d) for d in depths]

    for label, flag in [("full step (XLA gather)", False),
                        ("full step (pallas gather)", True)]:
        config = dataclasses.replace(
            base, hash=dataclasses.replace(base.hash,
                                           use_pallas_gather=flag)
        )
        try:
            slam = hash_slam.HashSLAM(config)
            for d in depths:
                info = slam.process(d)
            _sync(info.icp_error)
            t0 = time.perf_counter()
            n = 20
            for i in range(n):
                info = slam.process(depths[-1 - (i % 2)])
            _sync(info.icp_error)
            dt = (time.perf_counter() - t0) / n
            print(f"{label:44s} {dt*1e3:9.3f} ms  "
                  f"({1.0/dt:.1f} fps)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:44s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:140]}")


if __name__ == "__main__":
    main()
