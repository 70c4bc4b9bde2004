"""LoRA merge tests (diffusers/peft naming → stacked param trees)."""

import numpy as np

import jax
import jax.numpy as jnp

from alg_tpu.io.lora import collect_lora_pairs, merge_lora_cogvideox
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    cogvideox_rope,
    cogvideox_transformer,
    init_cogvideox_transformer,
)


def _cfg():
    return CogVideoXTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=2,
        sample_height=8,
        sample_width=8,
        max_text_seq_length=5,
    )


def test_collect_pairs_handles_prefixes():
    rng = np.random.RandomState(0)
    state = {
        "transformer.transformer_blocks.0.attn1.to_q.lora_A.weight": rng.randn(4, 32).astype(np.float32),
        "transformer.transformer_blocks.0.attn1.to_q.lora_B.weight": rng.randn(32, 4).astype(np.float32),
        "transformer_blocks.1.ff.net.0.proj.lora_A.default.weight": rng.randn(4, 32).astype(np.float32),
        "transformer_blocks.1.ff.net.0.proj.lora_B.default.weight": rng.randn(128, 4).astype(np.float32),
        "unrelated.weight": rng.randn(3).astype(np.float32),
    }
    pairs = collect_lora_pairs(state)
    assert set(pairs) == {"transformer_blocks.0.attn1.to_q", "transformer_blocks.1.ff.net.0.proj"}


def test_merge_changes_output_and_matches_manual():
    cfg = _cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    a = rng.randn(4, 32).astype(np.float32) * 0.1
    b = rng.randn(32, 4).astype(np.float32) * 0.1
    lora = {
        "transformer.transformer_blocks.1.attn1.to_q.lora_A.weight": a,
        "transformer.transformer_blocks.1.attn1.to_q.lora_B.weight": b,
    }
    merged = merge_lora_cogvideox(params, lora, scale=0.5)

    # only layer 1 to_q changed, by exactly 0.5·(B@A)ᵀ
    w0 = np.asarray(params["blocks"]["attn"]["to_q"]["kernel"])
    w1 = np.asarray(merged["blocks"]["attn"]["to_q"]["kernel"])
    np.testing.assert_allclose(w1[0], w0[0])
    np.testing.assert_allclose(w1[1], w0[1] + 0.5 * (b @ a).T, atol=1e-6)
    # other leaves untouched (same objects)
    assert merged["blocks"]["attn"]["to_k"]["kernel"] is params["blocks"]["attn"]["to_k"]["kernel"]

    # forward output changes
    cos, sin = cogvideox_rope(cfg, 32, 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 4, 4))
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 12))
    t = jnp.array([500.0])
    o1 = cogvideox_transformer(params, cfg, x, txt, t, cos, sin)
    o2 = cogvideox_transformer(merged, cfg, x, txt, t, cos, sin)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_unmapped_module_raises():
    cfg = _cfg()
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    lora = {
        "transformer_blocks.0.bogus_module.lora_A.weight": np.zeros((2, 8), np.float32),
        "transformer_blocks.0.bogus_module.lora_B.weight": np.zeros((8, 2), np.float32),
    }
    import pytest

    with pytest.raises(KeyError):
        merge_lora_cogvideox(params, lora)
