"""Speed-of-light audit: measured stage times vs memory-bound estimates.

Times every pipeline stage at a realistic mid-sweep state AND the memory
primitives that bound them (random HBM gather latency, contiguous row
bandwidth, scatter cost, elementwise bandwidth), then prints a roofline
table: stage ms, modeled memory-bound ms, % of bound.  The committed
output lives in BENCH_NOTES.md (VERDICT r1 item 3).

All timing is value-fetch-forced: ``jax.block_until_ready`` is a NO-OP on
the axon TPU tunnel (see CLAUDE.md).  Run on the real chip:

    python tools/roofline.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "ravel"):
        leaf = leaf.ravel()[0]  # device-side slice: O(1) transfer
    return float(np.asarray(leaf))


def timeit(fn, *args, n=20):
    f = jax.jit(fn)
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def timeit_donated(fn, hmap, *args, n=20):
    """Time a map-updating stage with the map DONATED and rethreaded, like
    the real step: without donation each call copies the whole tsdf+weight
    state (268 MB at flagship scale), which is what the step never pays."""
    f = jax.jit(fn, donate_argnums=0)
    m = f(hmap, *args)
    sync(jax.tree.leaves(m)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        m = f(m, *args)
    sync(jax.tree.leaves(m)[0])
    return (time.perf_counter() - t0) / n * 1e3


def measure_primitives():
    """Memory-system primitives that bound every stage."""
    key = jax.random.PRNGKey(0)
    out = {}

    # random element gather from a >VMEM-size table (HBM latency bound)
    src = jax.random.uniform(key, (1 << 22,), dtype=jnp.float32)  # 16 MB
    idx = jax.random.randint(key, (1 << 20,), 0, 1 << 22)
    ms = timeit(lambda s, i: s[i].sum(), src, idx)
    out["gather_random_ns_per_elem"] = ms * 1e6 / (1 << 20)

    # random element gather from a small (VMEM-cacheable) image
    img = jax.random.uniform(key, (480 * 640,), dtype=jnp.float32)
    idx2 = jax.random.randint(key, (1 << 20,), 0, 480 * 640)
    ms = timeit(lambda s, i: s[i].sum(), img, idx2)
    out["gather_image_ns_per_elem"] = ms * 1e6 / (1 << 20)

    # contiguous row gather: (N, 512) rows from a big table
    rows = jax.random.randint(key, (4096,), 0, 16384)
    table = jax.random.uniform(key, (16384, 512), dtype=jnp.float32)
    ms = timeit(lambda t, r: t[r].sum(), table, rows)
    out["gather_rows_GBps"] = 4096 * 512 * 4 / (ms * 1e-3) / 1e9

    # elementwise bandwidth (2 reads + 1 write)
    a = jax.random.uniform(key, (1 << 24,), dtype=jnp.float32)
    ms = timeit(lambda x: (x * 1.5 + 2.0).sum(), a)
    out["elementwise_GBps"] = (1 << 24) * 8 / (ms * 1e-3) / 1e9

    # scatter fixed cost (scatter-min of 300k elements into an image)
    vals = jax.random.uniform(key, (1 << 18,), dtype=jnp.float32)
    tgt_idx = jax.random.randint(key, (1 << 18,), 0, 480 * 640)
    zbuf = jnp.full((480 * 640,), jnp.inf, dtype=jnp.float32)

    def scat(z, i, v):
        return z.at[i].min(v).sum()

    out["scatter_min_256k_ms"] = timeit(scat, zbuf, tgt_idx, vals)
    return out


def measure_stages(config):
    from voxelhashing_demo_tpu.geometry import se3  # noqa: F401
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.ops import (hash_ops, icp as icp_ops,
                                           preprocess as pre_ops,
                                           splat as splat_ops)
    from voxelhashing_demo_tpu.utils import synthetic

    cam = config.camera
    depths, _ = synthetic.make_room_sweep(cam, 24, sweep_deg=40.0,
                                          noise_seed=1)
    depths = [jnp.asarray(d) for d in depths]
    slam = hash_slam.HashSLAM(config)
    for d in depths:
        info = slam.process(d)
    sync(info.icp_error)
    state = slam.state
    frame = pre_ops.preprocess(depths[-1], cam, config.frontend)
    active = hash_ops.compact_visible(
        state.hmap, config.hash, state.pose, cam, config.fusion
    )
    n_active = int(active.count)

    stages = {}
    stages["preprocess"] = timeit(
        lambda d: pre_ops.preprocess(d, cam, config.frontend), depths[-1]
    )
    stages["icp_pyramid"] = timeit(
        lambda f, m: icp_ops.icp_align_pyramid(
            f.depth, m.depth, cam, config.icp, src_full=f, tgt_full=m,
            prior_T=state.vel,
        ).transform,
        frame, state.model,
    )
    stages["compact_visible"] = timeit(
        lambda h, T: hash_ops.compact_visible(
            h, config.hash, T, cam, config.fusion
        ).count,
        state.hmap, state.pose,
    )
    stages["splat_raycast"] = timeit(
        lambda h, a, T: splat_ops.splat_raycast(
            h, a, config.hash, T, cam, config.raycast, config.fusion
        ).depth,
        state.hmap, active, state.pose,
    )
    # map-updating stages last: they donate + rethread copies of the map
    stages["alloc"] = timeit_donated(
        lambda h, f, T: hash_ops.allocate_from_frame(
            h, f, T, cam, config.hash, config.fusion
        )[0],
        jax.tree.map(jnp.copy, state.hmap), frame, state.pose,
    )
    stages["integrate"] = timeit_donated(
        lambda h, a, d, T: hash_ops.integrate(
            h, a, config.hash, d, T, cam, config.fusion
        ),
        jax.tree.map(jnp.copy, state.hmap), active, frame.depth,
        state.pose,
    )
    # whole fused step for reference.  make_step DONATES the state buffers
    # (hash_slam.make_step): every call must consume the previous call's
    # returned state — reusing a donated input is a TPU backend error.
    step = slam._step  # reuse the sweep's compiled step (same donation)
    st = slam.state
    st, info = step(st, depths[-1])  # warm
    sync(info.icp_error)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        st, info = step(st, depths[-1])
    sync(info.icp_error)
    stages["full_step"] = (time.perf_counter() - t0) / n * 1e3
    return stages, n_active


def bounds_model(config, prim, n_active):
    """Memory-traffic lower bounds per stage, from the measured primitive
    costs and the known data volumes."""
    cam = config.camera
    px = cam.width * cam.height
    V = config.hash.voxels_per_block
    g_img = prim["gather_image_ns_per_elem"]
    rows_gbps = prim["gather_rows_GBps"]
    elem_gbps = prim["elementwise_GBps"]

    b = {}
    # integrate: per active block: depth gather (V elems) + 2 row reads +
    # 2 row writes of (V,) f32
    gather_ms = n_active * V * g_img * 1e-6
    rows_ms = n_active * V * 4 * 4 / (rows_gbps * 1e9) * 1e3
    b["integrate"] = gather_ms + rows_ms
    # ICP: per level/iteration one 8-byte gather per source pixel; sum over
    # schedule (approximate: level areas / pools, 2 iters fine + race)
    levels = sorted(set(config.icp.pyramid), reverse=True)
    iters = config.icp.pyramid_iters
    pools = config.icp.source_pools or (1,) * len(levels)
    total_gathers = 0
    for f, it, p in zip(levels, iters, pools):
        total_gathers += (px // (f * p) ** 2) * max(it // 2, 1)
    b["icp_pyramid"] = total_gathers * 2 * g_img * 1e-6
    # preprocess: ~40 elementwise passes over the image (bilateral 25 +
    # reject 8 + normals)
    b["preprocess"] = 40 * px * 4 / (elem_gbps * 1e9) * 1e3
    # splat: row gather of active rows + scatter of band voxels (~10%) +
    # image-space finalize passes
    b["splat_raycast"] = (
        n_active * V * 8 / (rows_gbps * 1e9) * 1e3
        + prim["scatter_min_256k_ms"] * (n_active * V * 0.1) / (1 << 18)
        + 10 * px * 4 / (elem_gbps * 1e9) * 1e3
    )
    return b


def main():
    from __graft_entry__ import flagship_config

    config = flagship_config()
    prim = measure_primitives()
    stages, n_active = measure_stages(config)
    bounds = bounds_model(config, prim, n_active)

    result = {
        "device": jax.devices()[0].device_kind,
        "n_active_blocks": n_active,
        "primitives": {k: round(v, 3) for k, v in prim.items()},
        "stages_ms": {k: round(v, 3) for k, v in stages.items()},
        "bounds_ms": {k: round(v, 3) for k, v in bounds.items()},
        "pct_of_bound": {
            k: round(100 * bounds[k] / stages[k], 1)
            for k in bounds if k in stages and stages[k] > 0
        },
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
