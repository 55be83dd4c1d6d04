"""Test harness configuration.

Tests run on a simulated 8-device CPU platform so multi-chip sharding logic
is exercised without TPU hardware (the strategy SURVEY.md section 4 calls
for). Must be set before jax initializes.
"""

import os

# Force override: the environment may pin JAX_PLATFORMS to a hardware
# platform; unit tests must run on the simulated CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
