"""Test harness configuration.

Tests run on a simulated 8-device CPU platform so multi-chip sharding
logic is exercised without TPU hardware (the strategy SURVEY.md section 4
calls for). The environment may import jax and register a hardware PJRT
plugin at interpreter start (sitecustomize), snapshotting JAX_PLATFORMS —
so the platform must be forced through jax.config, not os.environ.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
