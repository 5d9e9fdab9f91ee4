"""On-chip A/B of depth-frontend formulations (VERDICT r2 item 5:
preprocess at 37% of its memory bound, 2.38 vs 0.89 ms).

Variants:
  A: current ops/preprocess.preprocess (jnp.roll shifted-add passes)
  B: pad+static-slice neighborhoods (no wrap; zero-padded borders)
  C: B with reject+bilateral fused in one neighborhood read (radius-3
     pad, per-neighbor support computed inline — single memory pass,
     more VPU compute)

Timing is value-fetch-forced (block_until_ready is a no-op on the
tunnel).  Run: python tools/exp_preprocess.py [--frames N]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from voxelhashing_demo_tpu.config import CameraConfig, FrontendConfig
from voxelhashing_demo_tpu.geometry import camera as cam_geom
from voxelhashing_demo_tpu.ops import preprocess as pre


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def _slices(padded, R, H, W):
    out = {}
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            out[(dy, dx)] = jax.lax.slice(
                padded, (R + dy, R + dx), (R + dy + H, R + dx + W)
            )
    return out


def variant_b(depth_raw, cam: CameraConfig, fe: FrontendConfig):
    """Pad+slice, staged like A: reject pass, bilateral pass, normals."""
    d = pre.depth_to_meters(depth_raw, cam)
    H, W = d.shape
    # reject (radius 1)
    p1 = jnp.pad(d, 1)
    nb1 = _slices(p1, 1, H, W)
    band = fe.outlier_band_base + fe.outlier_band_quad * d * d
    support = jnp.zeros(d.shape, jnp.int32)
    for (dy, dx), n in nb1.items():
        if dy == 0 and dx == 0:
            continue
        agree = (n > 0) & (jnp.abs(n - d) < band)
        support = support + agree.astype(jnp.int32)
    d = jnp.where((d > 0) & (support >= fe.outlier_min_support), d, 0.0)
    # bilateral (radius fe.bilateral_radius)
    R = fe.bilateral_radius
    p2 = jnp.pad(d, R)
    nb2 = _slices(p2, R, H, W)
    acc = jnp.zeros_like(d)
    wacc = jnp.zeros_like(d)
    inv_2ss = 1.0 / (2.0 * fe.bilateral_sigma_space ** 2)
    inv_2sd = 1.0 / (2.0 * fe.bilateral_sigma_depth ** 2)
    for (dy, dx), n in nb2.items():
        dz = n - d
        w = np.exp(-(dy * dy + dx * dx) * inv_2ss) * jnp.exp(
            -dz * dz * inv_2sd
        )
        w = jnp.where(n > 0, w, 0.0)
        acc = acc + w * n
        wacc = wacc + w
    out = acc / jnp.maximum(wacc, 1e-12)
    d = jnp.where((d > 0) & (wacc > 0), out, d)
    verts = pre.compute_vertices(d, cam)
    normals = pre.compute_normals(verts)
    return pre.Frame(vertices=verts, normals=normals, depth=d)


def variant_c(depth_raw, cam: CameraConfig, fe: FrontendConfig):
    """One radius-3 neighborhood read; per-neighbor reject support
    computed inline so reject+bilateral are a single memory pass."""
    d0 = pre.depth_to_meters(depth_raw, cam)
    H, W = d0.shape
    R = fe.bilateral_radius + 1
    p = jnp.pad(d0, R)
    nb = _slices(p, R, H, W)

    def support_of(cy, cx):
        c = nb[(cy, cx)]
        band = fe.outlier_band_base + fe.outlier_band_quad * c * c
        s = jnp.zeros(c.shape, jnp.int32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                n = nb[(cy + dy, cx + dx)]
                s = s + ((n > 0) & (jnp.abs(n - c) < band)).astype(jnp.int32)
        return jnp.where(
            (c > 0) & (s >= fe.outlier_min_support), c, 0.0
        )

    d = support_of(0, 0)
    acc = jnp.zeros_like(d)
    wacc = jnp.zeros_like(d)
    inv_2ss = 1.0 / (2.0 * fe.bilateral_sigma_space ** 2)
    inv_2sd = 1.0 / (2.0 * fe.bilateral_sigma_depth ** 2)
    Rb = fe.bilateral_radius
    for dy in range(-Rb, Rb + 1):
        for dx in range(-Rb, Rb + 1):
            n = support_of(dy, dx)
            dz = n - d
            w = np.exp(-(dy * dy + dx * dx) * inv_2ss) * jnp.exp(
                -dz * dz * inv_2sd
            )
            w = jnp.where(n > 0, w, 0.0)
            acc = acc + w * n
            wacc = wacc + w
    out = acc / jnp.maximum(wacc, 1e-12)
    d = jnp.where((d > 0) & (wacc > 0), out, d)
    verts = pre.compute_vertices(d, cam)
    normals = pre.compute_normals(verts)
    return pre.Frame(vertices=verts, normals=normals, depth=d)


def main():
    n = 30
    if "--frames" in sys.argv:
        n = int(sys.argv[sys.argv.index("--frames") + 1])
    cam = CameraConfig()
    fe = FrontendConfig(bilateral=True, outlier_reject=True)
    from voxelhashing_demo_tpu.utils import synthetic

    depths, _ = synthetic.make_sequence(cam, 2, noise_seed=1)
    d = jnp.asarray(depths[1])

    fns = {
        "A_current": jax.jit(lambda x: pre.preprocess(x, cam, fe)),
        "B_pad_slice": jax.jit(lambda x: variant_b(x, cam, fe)),
        "C_fused_pass": jax.jit(lambda x: variant_c(x, cam, fe)),
    }
    ref = None
    for name, f in fns.items():
        out = f(d)
        _sync(out.depth)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(d)
        _sync(out.depth)
        ms = (time.perf_counter() - t0) / n * 1e3
        if ref is None:
            ref = np.asarray(out.depth)
            diff = 0.0
            interior_diff = 0.0
        else:
            cur = np.asarray(out.depth)
            diff = float(np.abs(cur - ref).max())
            interior_diff = float(
                np.abs(cur[3:-3, 3:-3] - ref[3:-3, 3:-3]).max()
            )
        print(f"{name}: {ms:.3f} ms   max|d-A|={diff:.2e} "
              f"(interior {interior_diff:.2e})", flush=True)


if __name__ == "__main__":
    main()
