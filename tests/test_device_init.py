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


# ---------------------------------------------------------------------------
# on-device quantized init (device_init_quantized_params)
# ---------------------------------------------------------------------------

from alg_tpu.ops.quant import (  # noqa: E402
    _quant_w4_traced,
    _quant_w8_traced,
    device_init_quantized_params,
    host_init_quantized_params,
    quantize_kernel,
    quantize_kernel_w4,
)


def _tiny_dit_init():
    """Shape-compatible miniature of the real trees: stacked block kernels
    (quantize-eligible, in/out >= 128 and in % 128 == 0), a norm subtree
    (skipped unless modulation=True), a small linear (never quantized), and
    non-block top-level leaves."""
    k = jax.random.PRNGKey(0)
    blk = {
        "attn": {
            "to_q": {"kernel": jax.random.normal(k, (3, 256, 128), jnp.bfloat16),
                     "bias": jnp.zeros((3, 128), jnp.bfloat16)},
            "norm_q": {"scale": jnp.ones((3, 128), jnp.bfloat16)},
        },
        "norm1": {"proj": {"kernel": jax.random.normal(k, (3, 256, 128), jnp.bfloat16)}},
        "small": {"kernel": jax.random.normal(k, (3, 16, 8), jnp.bfloat16)},
    }
    return {"blocks": blk, "embed": {"kernel": jax.random.normal(k, (32, 64), jnp.bfloat16)}}


def test_traced_w8_quant_matches_host_quantizer():
    """Same formula as the host (native C++/numpy) quantizer. Scales may
    differ by 1 fp32 ulp between XLA and the host math, which flips codes
    sitting exactly on a .5 rounding boundary — tolerate <=0.1% of entries
    off by one code (measured: 3/32768 on this draw)."""
    w = (np.random.RandomState(0).randn(256, 128) * 0.02).astype(np.float32)
    w = jnp.asarray(w, jnp.bfloat16)
    q_host, s_host = quantize_kernel(w)
    q_dev, s_dev = jax.jit(_quant_w8_traced)(w)
    dq = np.abs(np.asarray(q_host, np.int32) - np.asarray(q_dev, np.int32))
    assert dq.max() <= 1 and (dq != 0).mean() < 1e-3
    np.testing.assert_allclose(np.asarray(s_host), np.asarray(s_dev), rtol=1e-6)


def test_traced_w4_quant_matches_host_quantizer():
    w = (np.random.RandomState(1).randn(256, 128) * 0.02).astype(np.float32)
    w = jnp.asarray(w, jnp.bfloat16)
    p_host, s4_host, s8_host = quantize_kernel_w4(w)
    p_dev, s4_dev, s8_dev = jax.jit(_quant_w4_traced)(w)
    # unpack nibbles before comparing: a boundary flip in one nibble must not
    # count as a huge packed-byte difference
    def unpack(p):
        p = np.asarray(p)
        lo = (p.astype(np.int8) << 4).astype(np.int8) >> 4
        hi = p.astype(np.int8) >> 4
        return np.stack([lo, hi], axis=-2)

    dq = np.abs(unpack(p_host).astype(np.int32) - unpack(p_dev).astype(np.int32))
    assert dq.max() <= 1 and (dq != 0).mean() < 1e-3
    np.testing.assert_allclose(np.asarray(s4_host), np.asarray(s4_dev), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s8_host), np.asarray(s8_dev), rtol=1e-6)


@pytest.mark.parametrize("mode", ["w8", "w4"])
@pytest.mark.parametrize("modulation", [False, True], ids=["nomod", "mod"])
def test_device_quantized_init_matches_host_structure(mode, modulation):
    host = host_init_quantized_params(_tiny_dit_init, mode=mode, modulation=modulation)
    dev = device_init_quantized_params(_tiny_dit_init, mode=mode, modulation=modulation)
    assert jax.tree_util.tree_structure(host) == jax.tree_util.tree_structure(dev)
    for (ph, h), (pd, d) in zip(
        jax.tree_util.tree_leaves_with_path(host), jax.tree_util.tree_leaves_with_path(dev)
    ):
        assert ph == pd
        assert h.shape == d.shape and h.dtype == d.dtype, ph
    # quantized kernels actually populated (not the zeros seed buffers)
    qk = "kernel_q4" if mode == "w4" else "kernel_q"
    q = np.asarray(dev["blocks"]["attn"]["to_q"][qk])
    assert (np.abs(q).sum(axis=(1, 2)) > 0).all()  # every layer slice filled
    s = np.asarray(dev["blocks"]["attn"]["to_q"]["w_scale"])
    assert (s > 0).all()


def test_device_quantized_init_handles_list_nodes():
    # Hunyuan's token refiner is a per-layer LIST (context_embedder/blocks)
    # outside the quantized block stacks — regression for the r4 crash where
    # gen_plain treated the list as a leaf (tools/bench_hunyuan_int8.py).
    from alg_tpu.models.hunyuan import (
        HunyuanVideoTransformerConfig,
        init_hunyuan_transformer,
    )

    cfg = HunyuanVideoTransformerConfig(
        num_layers=1, num_single_layers=1, num_refiner_layers=1,
        num_attention_heads=2, attention_head_dim=64,
    )

    def init():
        return init_hunyuan_transformer(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    host = host_init_quantized_params(init, modulation=True)
    dev = device_init_quantized_params(init, modulation=True)
    assert jax.tree_util.tree_structure(host) == jax.tree_util.tree_structure(dev)
    refiner = dev["context_embedder"]["blocks"]
    assert isinstance(refiner, list) and len(refiner) == 1
    leaf = jax.tree_util.tree_leaves(refiner)[0]
    assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_device_quantized_init_values_feed_quantized_linear():
    from alg_tpu.ops.quant import quantized_linear

    dev = device_init_quantized_params(_tiny_dit_init, mode="w8")
    # quantized_linear takes ONE layer's params (models scan over the stack)
    layer0 = jax.tree.map(lambda a: a[0], dev["blocks"]["attn"]["to_q"])
    x = jnp.asarray(np.random.RandomState(2).randn(5, 256), jnp.bfloat16)
    y = quantized_linear(layer0, x)
    arr = np.asarray(y, np.float32)
    assert arr.shape == (5, 128) and np.isfinite(arr).all() and arr.std() > 0
