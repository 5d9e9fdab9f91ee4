"""Probe: does 2-process jax.distributed over CPU (Gloo collectives)
work in this image?

Spawns itself twice as workers; each worker forces the CPU platform,
initializes the distributed runtime against a localhost coordinator,
builds a global mesh of 2 procs x 4 local devices, and psums over it.
"""

import os
import subprocess
import sys


def worker(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
        + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    print(f"[{pid}] procs={jax.process_count()} local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)
    mesh = Mesh(np.asarray(jax.devices()), ("d",))

    @jax.jit
    def f(x):
        def body(x):
            return jax.lax.psum(x, "d")
        return shard_map(body, mesh=mesh, in_specs=P("d"), out_specs=P())(x)

    x = jax.device_put(
        np.arange(8, dtype=np.float32), NamedSharding(mesh, P("d")))
    y = f(x)
    print(f"[{pid}] addressable={x.is_fully_addressable} psum={np.asarray(y)}",
          flush=True)
    # non-addressable gather
    from jax.experimental import multihost_utils
    g = multihost_utils.process_allgather(x)
    print(f"[{pid}] allgather={np.asarray(g).ravel()}", flush=True)
    jnp.zeros(()).block_until_ready()
    print(f"[{pid}] OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]), int(sys.argv[2]))
        sys.exit(0)
    port = 29781
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=180)
            print(f"--- worker {i} rc={p.returncode} ---\n{out}")
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        print("TIMEOUT")
