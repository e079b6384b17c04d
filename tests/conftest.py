"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count), mirroring how the
driver's dryrun_multichip exercises the sharded path without real chips.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# with the axon TPU plugin installed, XLA_FLAGS alone does not yield the
# virtual CPU devices; forcing the platform through the config does.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
