"""Test env: force CPU with an 8-device virtual mesh before JAX initializes.

This is the framework's substitute for multi-chip hardware (SURVEY §4 item 5):
sharding/pjit tests run against ``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
