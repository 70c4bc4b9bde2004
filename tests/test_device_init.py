"""core/device init helpers: on-device random init vs host-side streaming.

``device_init_params`` is the bench-path replacement for host init + tunnel
streaming (docs/PERF.md r4 budget: ~11 min of the driver's cold bench was
weight transfers). It must reproduce host init's CONTRACT — same tree
structure, shapes, dtypes, N(0, scale²) statistics — not its bit-values
(different RNG by design).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alg_tpu.core.device import device_init_params, host_init_params

pytestmark = pytest.mark.fast


def _init_fn():
    k = jax.random.PRNGKey(0)
    return {
        "stacked_ffn": jax.random.normal(k, (6, 32, 128), dtype=jnp.bfloat16),
        "small": {
            "w": jax.random.normal(k, (16, 8), dtype=jnp.float32),
            "b": jnp.zeros((8,), jnp.bfloat16),
        },
    }


def test_device_init_matches_host_init_contract():
    host = host_init_params(_init_fn, seed=0)
    dev = device_init_params(_init_fn, seed=0)
    assert jax.tree_util.tree_structure(host) == jax.tree_util.tree_structure(dev)
    for h, d in zip(jax.tree_util.tree_leaves(host), jax.tree_util.tree_leaves(dev)):
        assert h.shape == d.shape and h.dtype == d.dtype


@pytest.mark.parametrize("max_slice_bytes", [1, 256 << 20], ids=["chunked", "whole"])
def test_device_init_statistics(max_slice_bytes):
    """Both the slice-by-slice donated-fill path (max_slice_bytes=1 forces it
    for every stacked leaf) and the whole-leaf path draw N(0, scale²)."""
    params = device_init_params(_init_fn, seed=3, scale=0.02, max_slice_bytes=max_slice_bytes)
    big = np.asarray(params["stacked_ffn"], np.float32)
    assert abs(big.mean()) < 5e-3
    assert abs(big.std() - 0.02) < 5e-3
    # every slice of a chunk-filled leaf must be populated (no zeros rows left
    # from the jnp.zeros seed buffer) and distinct (per-row fold_in keys)
    row_norms = np.linalg.norm(big.reshape(big.shape[0], -1), axis=1)
    assert (row_norms > 0).all()
    assert len({round(float(r), 6) for r in row_norms}) == big.shape[0]


def test_device_init_seed_determinism():
    a = device_init_params(_init_fn, seed=7, max_slice_bytes=1)
    b = device_init_params(_init_fn, seed=7, max_slice_bytes=1)
    c = device_init_params(_init_fn, seed=8, max_slice_bytes=1)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert any(
        not np.array_equal(np.asarray(x), np.asarray(z))
        for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(c))
    )
