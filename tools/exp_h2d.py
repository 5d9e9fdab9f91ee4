"""Probe: host-blocking vs async behavior of H2D uploads on the tunnel.

Questions driving the r5 streaming pipeline redesign (VERDICT r4 item 1):
1. Does `jnp.asarray(np_array)` / `jax.device_put` BLOCK the host for the
   transfer, or return immediately (async dispatch)?
2. When the upload is async, does interleaving device work between the
   upload and the consuming fetch hide the transfer latency?
3. What does a D2H fetch of the same payload cost (floor + bandwidth)?

Run on the real chip: python tools/exp_h2d.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sizes = [(256, 1025), (2048, 1025)]  # restore bucket / full padding
    consume = jax.jit(lambda x: jnp.float32(x.ravel()[0] + x.sum()))

    # warm the consume jit per shape
    for shape in sizes:
        float(np.asarray(consume(jnp.zeros(shape, jnp.float32))))

    for shape in sizes:
        nbytes = shape[0] * shape[1] * 4
        host = np.random.default_rng(0).normal(size=shape).astype(np.float32)
        print(f"--- payload {shape} = {nbytes/1e6:.2f} MB ---", flush=True)

        for trial in range(3):
            t0 = time.perf_counter()
            dev = jnp.asarray(host)
            t1 = time.perf_counter()
            out = consume(dev)
            t2 = time.perf_counter()
            _ = float(np.asarray(out))
            t3 = time.perf_counter()
            print(
                f"  asarray(host)={1e3*(t1-t0):7.1f} ms  dispatch="
                f"{1e3*(t2-t1):6.1f} ms  fetch_wait={1e3*(t3-t2):7.1f} ms",
                flush=True,
            )

        # device_put variant
        for trial in range(2):
            t0 = time.perf_counter()
            dev = jax.device_put(host)
            t1 = time.perf_counter()
            _ = float(np.asarray(consume(dev)))
            t2 = time.perf_counter()
            print(
                f"  device_put={1e3*(t1-t0):7.1f} ms  consume+fetch="
                f"{1e3*(t2-t1):7.1f} ms",
                flush=True,
            )

        # async test: upload, then do unrelated device work for ~150 ms,
        # then fetch the consumer — if the upload overlapped, fetch_wait
        # shrinks vs the back-to-back case above
        busy = jax.jit(lambda a: ((a @ a) @ a).sum())
        a = jnp.zeros((2048, 2048), jnp.float32)
        float(np.asarray(busy(a)))  # warm
        t0 = time.perf_counter()
        dev = jnp.asarray(host)
        t1 = time.perf_counter()
        outs = [busy(a) for _ in range(8)]
        t2 = time.perf_counter()
        out = consume(dev)
        _ = float(np.asarray(out))
        t3 = time.perf_counter()
        _ = [float(np.asarray(o)) for o in outs]
        t4 = time.perf_counter()
        print(
            f"  overlap: upload={1e3*(t1-t0):7.1f} ms  busy_dispatch="
            f"{1e3*(t2-t1):6.1f} ms  consume_fetch={1e3*(t3-t2):7.1f} ms  "
            f"busy_drain={1e3*(t4-t3):7.1f} ms",
            flush=True,
        )

        # D2H: pull the same payload back
        for trial in range(2):
            t0 = time.perf_counter()
            back = np.asarray(dev)
            t1 = time.perf_counter()
            print(f"  D2H pull={1e3*(t1-t0):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
