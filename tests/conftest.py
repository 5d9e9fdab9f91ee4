"""Test environment: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on
virtual CPU devices exactly as the driver's dryrun does.  Must run before
jax is imported anywhere.
"""

import os
import sys

# NOTE: this image's sitecustomize imports jax at interpreter boot with
# JAX_PLATFORMS=axon (remote TPU tunnel), so plain env vars are too late —
# the config override below is what actually forces CPU.  XLA_FLAGS is
# still read at (lazy) backend init, so setting it here works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel codegen has segfaulted sporadically deep into
    # long full-suite processes on this 2-vCPU host (always inside
    # backend_compile of a shard_map program, never reproducible
    # standalone).  Serial codegen removes the raced path; compile time
    # impact on the tiny test programs is negligible.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# No persistent compile cache under tests: concurrent processes sharing
# the cache dir (a background suite + foreground experiments) have been
# observed to SIGSEGV/SIGABRT inside jax's cache deserialization on the
# virtual multi-device platform.  CPU test compiles are cheap; the cache
# stays on for single-process TPU runs (bench, CLI) where it matters.
os.environ.setdefault("VOXELHASHING_NO_COMPILE_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from voxelhashing_demo_tpu.config import tiny_config

    return tiny_config()


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Release compiled executables between test modules.

    The jit factories are config-memoized (lru_cache) so same-config
    instances share compiles — but across the whole suite that
    accumulates every module's executables in one process, and XLA:CPU
    has segfaulted sporadically inside late compiles once hundreds of
    executables were live (always in the sharded tests ~75% through the
    suite, never standalone).  Clearing the factory caches and jax's
    executable caches at module boundaries bounds the live set while
    keeping within-module sharing."""
    yield
    import voxelhashing_demo_tpu

    voxelhashing_demo_tpu.release_compiled()
