"""T5 / UMT5 encoder — JAX implementation.

Parity targets: ``google/t5-v1_1-xxl`` (CogVideoX text encoder, reference
``pipeline_cogvideox_image2video_lowpass.py:24,228-268`` — called *without*
an attention mask, so padded tokens attend; faithful) and ``google/umt5-xxl``
(Wan, ``pipeline_wan_image2video_lowpass.py:185-224`` — called *with* the
tokenizer mask; prefix masking via ``kv_len``).

T5 specifics implemented: RMS layer norm (no bias, pre-norm), unscaled
attention (no 1/sqrt(d)), relative-position-bucket bias (shared across layers
for T5, per-layer for UMT5), gated-GELU MLP. All projections bias-free.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L
from alg_tpu.ops import attention


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    per_layer_relative_bias: bool = False  # True → UMT5

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


UMT5_XXL = T5Config(vocab_size=256384, per_layer_relative_bias=True)


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 relative position buckets, ``[q_len, k_len]`` int32."""
    ctx = np.arange(q_len, dtype=np.int64)[:, None]
    mem = np.arange(k_len, dtype=np.int64)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


def _init_attention(key, cfg: T5Config, dtype, with_bias_table: bool):
    ks = jax.random.split(key, 5)
    p = {
        "q": L.init_linear(ks[0], cfg.d_model, cfg.inner_dim, bias=False, dtype=dtype),
        "k": L.init_linear(ks[1], cfg.d_model, cfg.inner_dim, bias=False, dtype=dtype),
        "v": L.init_linear(ks[2], cfg.d_model, cfg.inner_dim, bias=False, dtype=dtype),
        "o": L.init_linear(ks[3], cfg.inner_dim, cfg.d_model, bias=False, dtype=dtype),
    }
    if with_bias_table:
        p["relative_attention_bias"] = (
            jax.random.normal(ks[4], (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32) * 0.02
        ).astype(dtype)
    return p


def init_t5_encoder(key, cfg: T5Config, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], 4)
        with_bias = cfg.per_layer_relative_bias or i == 0
        blocks.append(
            {
                "attn_norm": L.init_rms_norm(cfg.d_model, dtype=dtype),
                "attn": _init_attention(ks[0], cfg, dtype, with_bias),
                "ff_norm": L.init_rms_norm(cfg.d_model, dtype=dtype),
                "wi_0": L.init_linear(ks[1], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
                "wi_1": L.init_linear(ks[2], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
                "wo": L.init_linear(ks[3], cfg.d_ff, cfg.d_model, bias=False, dtype=dtype),
            }
        )
    return {
        "embed": (jax.random.normal(keys[-2], (cfg.vocab_size, cfg.d_model), jnp.float32) * 1.0).astype(dtype),
        "blocks": blocks,  # kept as a list: block 0 may differ (shared bias table)
        "final_norm": L.init_rms_norm(cfg.d_model, dtype=dtype),
    }


def _t5_self_attention(p, cfg: T5Config, x: jnp.ndarray, bias: jnp.ndarray, kv_len):
    b, s, _ = x.shape
    nh, dk = cfg.num_heads, cfg.d_kv

    def heads(t):
        return t.reshape(b, s, nh, dk).transpose(0, 2, 1, 3)

    q = heads(L.linear(p["q"], x))
    k = heads(L.linear(p["k"], x))
    v = heads(L.linear(p["v"], x))
    # T5 does not scale q by 1/sqrt(d)
    o = attention(q, k, v, scale=1.0, bias=bias, kv_len=kv_len)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.inner_dim)
    return L.linear(p["o"], o)


def t5_encode(
    params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # [B, S] int32
    attention_mask: Optional[jnp.ndarray] = None,  # [B, S] 0/1 (prefix mask)
) -> jnp.ndarray:
    """Returns last_hidden_state ``[B, S, d_model]``."""
    s = input_ids.shape[1]
    x = params["embed"][input_ids]
    kv_len = None if attention_mask is None else attention_mask.sum(axis=1).astype(jnp.int32)

    buckets = relative_position_buckets(
        s, s, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    shared_bias = None
    for i, blk in enumerate(params["blocks"]):
        if "relative_attention_bias" in blk["attn"]:
            table = blk["attn"]["relative_attention_bias"].astype(jnp.float32)
            bias = table[jnp.asarray(buckets)]  # [S, S, H]
            bias = bias.transpose(2, 0, 1)[None]  # [1, H, S, S]
            if not cfg.per_layer_relative_bias:
                shared_bias = bias
        else:
            bias = shared_bias
        h = L.t5_layer_norm(blk["attn_norm"], x, cfg.layer_norm_epsilon)
        x = x + _t5_self_attention(blk["attn"], cfg, h, bias, kv_len)
        h = L.t5_layer_norm(blk["ff_norm"], x, cfg.layer_norm_epsilon)
        h = L.gelu_tanh(L.linear(blk["wi_0"], h)) * L.linear(blk["wi_1"], h)
        x = x + L.linear(blk["wo"], h)
    return L.t5_layer_norm(params["final_norm"], x, cfg.layer_norm_epsilon)
