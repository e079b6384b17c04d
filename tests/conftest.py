"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count), mirroring how the
driver's dryrun_multichip exercises the sharded path without real chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
