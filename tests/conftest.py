"""Test configuration: run everything on CPU with a fake 8-device mesh.

Multi-chip sharding tests (mesh, halo exchange, DP training) run against
XLA's host-platform device partitioning so no TPU is needed.
"""

import os

# Force CPU even when a TPU plugin (axon) is registered: the env var alone
# is not enough because the plugin's sitecustomize re-registers itself, so
# also override via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
