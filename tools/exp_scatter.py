"""Experiment: can splat's scatter-min get cheaper via compaction?

The trace (tools/profile_trace.py) shows the splat loop is ~4.3 ms/frame,
almost all of it the 65k-element random scatter-min per chunk — but only
~12% of a chunk's voxels are in the surface band.  Hypotheses to test on
real TPU:

1. scatter cost is per *issued* element (masked/dropped updates still pay);
2. a cumsum-compaction scatter with sorted+unique index hints is much
   cheaper than a random scatter;
3. therefore compact-then-scatter beats direct scatter at low valid rates.

Also probes the integrate loop's depth gather (65k random from a 1.2 MB
image) in f32 vs bf16 and flat vs 2D, and a fori_loop chunked variant.
"""

import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms")
    return out


key = jax.random.PRNGKey(0)
HW = 480 * 640
C = 128 * 512                       # one integrate/splat chunk

zbuf = jnp.full((HW + 1,), jnp.inf, dtype=jnp.float32)
idx = jax.random.randint(key, (C,), 0, HW)
vals = jax.random.uniform(key, (C,), minval=0.5, maxval=4.0)

# baseline: every element issued, ~12% valid (rest OOB-dropped)
for frac in (1.0, 0.125):
    mask = jax.random.uniform(jax.random.PRNGKey(1), (C,)) < frac
    midx = jnp.where(mask, idx, HW)
    timeit(
        f"scatter-min 65k (valid={frac:.0%}) into 307k",
        jax.jit(lambda v, i: zbuf.at[i].min(v, mode="drop")), vals, midx,
    )

# compaction: cumsum positions are sorted+unique by construction
mask = jax.random.uniform(jax.random.PRNGKey(1), (C,)) < 0.125
midx = jnp.where(mask, idx, HW)


def compact_then_scatter(v, i, m):
    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
    # masked-out elements go OUT OF BOUNDS (C+1) so mode="drop" removes
    # them; the issued indices are then genuinely sorted AND unique (a
    # strictly increasing cumsum prefix), making the hints valid
    dst = jnp.where(m, pos, C + 1)
    cidx = jnp.full((C + 1,), HW, dtype=jnp.int32)
    cval = jnp.full((C + 1,), jnp.inf, dtype=jnp.float32)
    cidx = cidx.at[dst].set(i, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
    cval = cval.at[dst].set(v, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
    # issue only the first 16k compacted entries (12.5% + headroom)
    k = C // 4
    return zbuf.at[cidx[:k]].min(cval[:k], mode="drop")


timeit("compact(sorted set x2) + scatter-min 16k",
       jax.jit(compact_then_scatter), vals, midx, mask)


def compact_unsorted(v, i, m):
    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
    dst = jnp.where(m, pos, C)
    cidx = jnp.full((C + 1,), HW, dtype=jnp.int32)
    cval = jnp.full((C + 1,), jnp.inf, dtype=jnp.float32)
    cidx = cidx.at[dst].set(i, mode="drop")
    cval = cval.at[dst].set(v, mode="drop")
    k = C // 4
    return zbuf.at[cidx[:k]].min(cval[:k], mode="drop")


timeit("compact(no hints) + scatter-min 16k",
       jax.jit(compact_unsorted), vals, midx, mask)

# just the compaction scatters, to isolate their cost
def compaction_only(v, i, m):
    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
    dst = jnp.where(m, pos, C + 1)  # OOB-drop keeps the hints valid
    cidx = jnp.full((C + 1,), HW, dtype=jnp.int32)
    cval = jnp.full((C + 1,), jnp.inf, dtype=jnp.float32)
    cidx = cidx.at[dst].set(i, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
    cval = cval.at[dst].set(v, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
    return cidx, cval


timeit("compaction scatters only (sorted+unique)",
       jax.jit(compaction_only), vals, midx, mask)

# scatter-min with fewer elements, no compaction (lower bound)
for k in (C // 4, C // 8):
    sidx = idx[:k]
    svals = vals[:k]
    timeit(f"scatter-min {k//1024}k into 307k",
           jax.jit(lambda v, i: zbuf.at[i].min(v, mode="drop")),
           svals, sidx)

print()
# ---- integrate's depth gather --------------------------------------------
img = jax.random.uniform(key, (480, 640), dtype=jnp.float32)
img_bf = img.astype(jnp.bfloat16)
imgf = img.reshape(-1)
u = jax.random.randint(key, (C,), 0, 640)
v = jax.random.randint(jax.random.PRNGKey(2), (C,), 0, 480)
flat = v * 640 + u

timeit("gather 65k from (480,640) f32 [v,u]",
       jax.jit(lambda a, b: img[a, b]), v, u)
timeit("gather 65k from flat 307k f32",
       jax.jit(lambda i: imgf[i]), flat)
timeit("gather 65k from (480,640) bf16 [v,u]",
       jax.jit(lambda a, b: img_bf[a, b]), v, u)

# gather as (C,) vs shaped (128, 512)
v2 = v.reshape(128, 512)
u2 = u.reshape(128, 512)
timeit("gather (128,512) from (480,640) f32",
       jax.jit(lambda a, b: img[a, b]), v2, u2)

# packed rows: one gather of 2-wide rows vs two gathers
rows = jnp.ones((65536, 512), dtype=jnp.float32)
rows2 = jnp.ones((65536, 512), dtype=jnp.float32)
ridx = jax.random.randint(key, (128,), 0, 65536)
timeit("2x row gather (128,512) f32", jax.jit(
    lambda i: (rows[i], rows2[i])), ridx)
packed = jnp.ones((65536, 512), dtype=jnp.float32)
timeit("1x row gather (128,512) f32", jax.jit(lambda i: packed[i]), ridx)

print("\ndevice:", jax.devices()[0].device_kind)
