"""TPU-native dense SLAM engine (VoxelHashing on JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of nilspin/VoxelHashing_demo
for TPU: depth preprocessing, point-to-plane ICP tracking, voxel-hashed TSDF
fusion, and sphere-traced raycasting, with multi-chip scaling via
jax.sharding.  See SURVEY.md for the reference analysis.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the flagship step takes minutes to
# compile over a tunneled TPU; caching makes every subsequent process
# (bench.py, tools/, the driver) start in seconds.  NOTE: importing this
# package therefore mutates global jax.config (documented in CLAUDE.md).
# Opt out with VOXELHASHING_NO_COMPILE_CACHE=1 (e.g. when measuring
# compile time); "0"/"" leave the cache on.
def _machine_tag() -> str:
    """Host-CPU fingerprint for the cache path.  XLA:CPU serializes
    AOT executables with the COMPILING machine's feature set and loading
    them on a host with different features can SIGABRT/SIGILL outright
    (observed: a cache populated on an avx10-era host aborted this
    host's whole test run inside cache deserialization).  Scoping the
    cache dir by CPU fingerprint makes a foreign cache invisible instead
    of fatal; each machine pays one cold compile pass."""
    import hashlib as _hashlib
    import platform as _platform

    feat = ""
    try:
        with open("/proc/cpuinfo") as _f:
            for _line in _f:
                if _line.startswith(("flags", "Features")):
                    feat = _line
                    break
    except OSError:
        pass
    return _hashlib.sha1(
        (_platform.machine() + feat).encode()
    ).hexdigest()[:12]


if _os.environ.get("VOXELHASHING_NO_COMPILE_CACHE") in (None, "", "0"):
    _cache_dir = _os.environ.get(
        "VOXELHASHING_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache", _machine_tag()),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception:  # older jax without these flags: cache is best-effort
        pass

from . import config
from .config import PipelineConfig, tiny_config


def release_compiled() -> None:
    """Drop every config-memoized jit factory cache and jax's live
    executable caches.

    The jit factories (``models.hash_slam.make_step`` & co.) are
    ``lru_cache``-memoized on the frozen config so same-config instances
    share compiles — which also makes every compiled executable immortal
    for the life of the process.  Long-lived processes that churn many
    configs (sweeps, notebooks) should call this at config boundaries:
    XLA:CPU has segfaulted sporadically once hundreds of live
    executables accumulated in one process (see tests/conftest.py, which
    calls this at module boundaries).  Safe to call at any quiescent
    point; the next use recompiles (or hits the persistent on-disk
    cache)."""
    from .models import hash_slam, keyframe_slam
    from .parallel import sharded

    for f in (
        sharded.make_sharded_spill_evict,
        sharded.make_sharded_render_model,
        hash_slam.make_step,
        hash_slam.make_scan_step,
        hash_slam.make_evict,
        hash_slam.make_restore,
        hash_slam.make_pull,
        hash_slam.make_spill_evict,
        hash_slam.make_spill_head,
        keyframe_slam.make_fuse_only,
        keyframe_slam._ba_pack,
        keyframe_slam.make_reintegrate,
        keyframe_slam.make_render_model,
        keyframe_slam._make_batch_icps,
        keyframe_slam._make_kf_pre,
        keyframe_slam._make_batch_procrustes,
    ):
        f.cache_clear()
    _jax.clear_caches()


__version__ = "0.1.0"
