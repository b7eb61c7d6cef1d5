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

# NO persistent compilation cache for the CPU test runs: jax 0.9's cache
# deserializer segfaults sporadically in long-lived CPU processes (observed
# at three different cache-read sites across full-suite runs — ring AOT
# executables and plain pjit programs alike; a fresh interpreter reading
# the same entries passes).  Cold compiles cost ~10 extra minutes per full
# run; a crashed interpreter costs the whole suite.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
