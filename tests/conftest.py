"""Test env: request CPU with an 8-device virtual mesh before JAX initializes.

This is the framework's substitute for multi-chip hardware (SURVEY §4 item 5):
sharding/pjit tests run against ``--xla_force_host_platform_device_count=8``
via explicit ``jax.local_devices(backend="cpu")`` meshes.

Recommended runners:

  * **Full suite on true CPU (~12 min, TPU-free)** — the axon plugin is
    injected via ``PYTHONPATH=/root/.axon_site`` and ignores
    ``JAX_PLATFORMS=cpu``; clearing PYTHONPATH bypasses it entirely::

        PYTHONPATH= python -m pytest tests/ -q

    This is safe to run while a bench occupies the TPU (two processes on the
    one tunneled chip crash the TPU worker).
  * **Fast subset (<60 s, pure math)** — schedules, filters, schedulers,
    RNG, reference parity::

        PYTHONPATH= python -m pytest tests/ -m fast -q

  * **Chip gate (~12 min on the tunneled v5e)** — the bounded on-hardware
    subset: compiled Pallas fwd/bwd/int8/qk-prep kernel parity, one real
    train step, one sampler segment. Run this (PYTHONPATH as-is, so the axon
    TPU plugin loads) before shipping any change that touches the compute
    path — it is what catches TPU-only breakage that the CPU suite cannot
    (the r3 lesson)::

        python -m pytest tests/ -m chip -q

    The same selection deselects to 0 (all skipped) on CPU.
  * With PYTHONPATH left as-is, non-mesh tests run on the real tunneled TPU
    chip (compile-dominated, ~30 min) — only useful to exercise the Pallas
    kernels, which skip on CPU.
"""

import os


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: pure-math/CPU test; `pytest -m fast` finishes in <60 s"
    )
    config.addinivalue_line(
        "markers",
        "chip: bounded on-TPU gate (compiled Pallas kernels + train step + "
        "sampler segment); `pytest -m chip` on the default backend, ~12 min",
    )

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
