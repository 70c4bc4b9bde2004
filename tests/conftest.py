"""Test env: request CPU with an 8-device virtual mesh before JAX initializes.

This is the framework's substitute for multi-chip hardware (SURVEY §4 item 5):
sharding/pjit tests run against ``--xla_force_host_platform_device_count=8``
via explicit ``jax.local_devices(backend="cpu")`` meshes.

Caveat (axon tunnel): the axon plugin IGNORES ``JAX_PLATFORMS=cpu`` — on the
dev box the default backend stays the real TPU chip and non-mesh tests run
there (hence the compile-dominated ~30 min suite). The explicit cpu-backend
meshes are unaffected. On machines without the plugin this forces CPU as
written. Consequence: never run the suite concurrently with bench.py — two
processes on the one tunneled chip crash the TPU worker.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# fp32 parity tests need true-fp32 MXU passes (the TPU default is bf16 passes)
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: the axon/TPU backend pays 10-40s per new shape
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
