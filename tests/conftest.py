"""Test configuration: run all tests on CPU with 8 virtual devices.

This is how multi-chip sharding is tested without a pod (SURVEY.md §4): the
1-shard ≡ k-shard oracle runs over a virtual device mesh.  The env vars must
be set before jax is imported anywhere.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (the TPU tunnel) and its
# sitecustomize re-asserts it at interpreter startup, so the env var alone is
# NOT enough — the config API below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles are slow in this sandbox;
# caching them makes repeated test runs cheap.  (The env-var spelling is not
# honored by this jax build; the config API is.)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
