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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from voxelhashing_demo_tpu.config import tiny_config

    return tiny_config()
