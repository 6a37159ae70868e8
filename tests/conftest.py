"""Test harness config.

Runs every test on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  Must set env vars before jax is imported anywhere.
"""

import os

# Hard override: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# (axon); tests must run on the virtual CPU mesh and never contend for the
# single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
