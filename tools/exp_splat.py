"""On-chip A/B: block-filtered splat (current) vs z-plane (slab) filtered
splat (VERDICT r2 item 5: splat at 46% of its memory bound; the gap is
masked in-block scatter updates at ~12 ns each).

Idea: the per-block band_min filter keeps whole 512-voxel blocks whose
band only crosses 1-3 of the 8 z-planes.  A per-plane band_min
([blocks, 8]) lets the splat build a compact SLAB list (plane-granular),
shrinking both the row gathers and the scatter update set by the
out-of-band plane fraction.  Filtered-out planes contribute zero scatter
updates, so the output is bit-exact.

Run on TPU: python tools/exp_splat.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.geometry import coords, se3
from voxelhashing_demo_tpu.geometry import camera as cam_geom
from voxelhashing_demo_tpu.ops import hash_ops, splat as splat_ops
from voxelhashing_demo_tpu.ops.hash_ops import FREE_PTR


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def slab_splat_depth(hmap, active, slab_bm, cfg, T_wc, cam, rc, fusion,
                    chunk=1024):
    """Slab-granular splat: compact in-band (block, z-plane) pairs, then
    chunked gather+scatter over 64-voxel slabs."""
    A = active.ptrs.shape[0]
    N = hmap.tsdf.shape[0]
    band = rc.splat_band * fusion.voxel_size
    safe = jnp.clip(active.ptrs, 0, N - 1)
    live = ((active.ptrs != FREE_PTR)[:, None]
            & (slab_bm[safe] < band))                    # (A, 8)
    flat = live.reshape(-1)
    rank = jnp.cumsum(flat.astype(jnp.int32)) - 1
    idx = jnp.where(flat, rank, A * 8)
    src = jnp.arange(A * 8, dtype=jnp.int32)
    comp_src = jnp.zeros((A * 8 + 1,), jnp.int32).at[idx].set(
        src, mode="drop")[:-1]
    count = jnp.sum(flat.astype(jnp.int32))

    tsdf2 = hmap.tsdf.reshape(N * 8, 64)
    w2 = hmap.weight.reshape(N * 8, 64)
    local = hash_ops._local_offsets(cfg.block_size)[:64]   # z=0 plane (64,3)
    T_cw = se3.inverse(T_wc)
    C = chunk

    def cond(carry):
        i, _ = carry
        return i * C < count

    def body(carry):
        i, zb = carry
        s = jax.lax.dynamic_slice(comp_src, (i * C,), (C,))
        pos = jnp.arange(C) + i * C
        valid = pos < count
        a_idx = s // 8                                    # active row
        z_pl = s % 8
        ptr = jnp.clip(active.ptrs[a_idx], 0, N - 1)
        blocks = active.blocks[a_idx]                     # (C, 3)
        srow = tsdf2[ptr * 8 + z_pl]                      # (C, 64)
        wrow = w2[ptr * 8 + z_pl]
        vox = (coords.block2voxel(blocks, cfg.block_size)[:, None, :]
               + local[None]
               + jnp.stack([jnp.zeros_like(z_pl), jnp.zeros_like(z_pl),
                            z_pl], -1)[:, None, :])
        world = coords.voxel2world(vox, fusion.voxel_size)
        pc = world @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = pc[..., 2]
        surf = (valid[:, None] & (wrow > 0)
                & (jnp.abs(srow) < band) & (z > rc.near) & (z < rc.far))
        z_surf = z + srow
        ij, in_img = cam_geom.project_nearest(pc, cam)
        ok = surf & in_img & (z_surf > rc.near) & (z_surf < rc.far)
        flat_px = ij[..., 1] * cam.width + ij[..., 0]
        flat_px = jnp.where(ok, flat_px, cam.height * cam.width)
        zb = zb.at[flat_px.reshape(-1)].min(
            jnp.where(ok, z_surf, jnp.inf).reshape(-1), mode="drop")
        return (i + 1, zb)

    zbuf = jnp.full((cam.height * cam.width + 1,), jnp.inf, jnp.float32)
    _, zbuf = jax.lax.while_loop(cond, body, (count * 0, zbuf))
    depth = zbuf[:-1].reshape(cam.height, cam.width)
    return jnp.where(jnp.isfinite(depth), depth, 0.0), count


def main():
    from __graft_entry__ import flagship_config
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import synthetic

    config = flagship_config()
    cam = config.camera
    rc, fusion, cfg = config.raycast, config.fusion, config.hash

    depths, _ = synthetic.make_room_sweep(cam, 24, sweep_deg=40.0,
                                          noise_seed=1)
    slam = hash_slam.HashSLAM(config)
    for d in depths:
        slam.process(jnp.asarray(d))
    state = slam.state
    active = hash_ops.compact_visible(state.hmap, cfg, state.pose, cam,
                                      fusion)
    print("active blocks:", int(active.count), flush=True)

    # per-plane band_min computed offline (would be maintained by
    # integrate in a landed version)
    w2 = np.asarray(state.hmap.weight).reshape(-1, 8, 64)
    t2 = np.asarray(state.hmap.tsdf).reshape(-1, 8, 64)
    slab_bm = jnp.asarray(
        np.where(w2 > 0, np.abs(t2), np.inf).min(axis=2).astype(np.float32)
    )
    band = rc.splat_band * fusion.voxel_size
    # stats: how much does plane granularity shrink the update set?
    ptrs = np.asarray(active.ptrs)[: int(active.count)]
    blk_live = np.asarray(state.hmap.band_min)[ptrs] < band
    slab_live = (np.asarray(slab_bm)[ptrs] < band)
    print(f"surf blocks: {blk_live.sum()}/{len(ptrs)}  "
          f"in-band planes: {slab_live.sum()}/{blk_live.sum() * 8} "
          f"({slab_live.sum() / max(blk_live.sum() * 8, 1):.1%} of "
          f"surf-block planes)", flush=True)

    n = 30
    cur = jax.jit(lambda h, a, T: splat_ops.splat_raycast(
        h, a, cfg, T, cam, rc, fusion).depth)
    out_cur = cur(state.hmap, active, state.pose)
    _sync(out_cur)
    t0 = time.perf_counter()
    for _ in range(n):
        out_cur = cur(state.hmap, active, state.pose)
    _sync(out_cur)
    print(f"current splat_raycast: "
          f"{(time.perf_counter() - t0) / n * 1e3:.3f} ms", flush=True)

    # raw depth only (no finalize) for both, to isolate the splat core
    cur_raw = jax.jit(lambda h, a, T: splat_ops.splat_depth_from_map(
        h, splat_ops.surface_filter(h, a, band), cfg, T, cam, rc, fusion))
    r = cur_raw(state.hmap, active, state.pose)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = cur_raw(state.hmap, active, state.pose)
    _sync(r)
    print(f"current raw splat (block-filtered): "
          f"{(time.perf_counter() - t0) / n * 1e3:.3f} ms", flush=True)

    for chunk in (512, 1024, 2048):
        slab = jax.jit(lambda h, a, T, c=chunk: slab_splat_depth(
            h, a, slab_bm, cfg, T, cam, rc, fusion, chunk=c)[0])
        s = slab(state.hmap, active, state.pose)
        _sync(s)
        t0 = time.perf_counter()
        for _ in range(n):
            s = slab(state.hmap, active, state.pose)
        _sync(s)
        ms = (time.perf_counter() - t0) / n * 1e3
        exact = np.array_equal(np.asarray(s), np.asarray(r))
        print(f"slab raw splat (chunk {chunk}): {ms:.3f} ms   "
              f"bit-exact={exact}", flush=True)


if __name__ == "__main__":
    main()
