"""Llama-3 decoder + Llava multimodal encoder — JAX implementation.

Parity target: HunyuanVideo's text encoder #1, a Llava-Llama3-8B run as a
*feature extractor* (reference ``pipeline_hunyuan_video_image2video_lowpass
.py:282-419``): the prompt template's single ``<image>`` token is expanded to
576 positions, the CLIP-ViT vision tower's penultimate-layer patch features
are projected into the token stream at those positions, and the hidden states
three layers from the top (``hidden_states[-3]``) are returned.

Llama specifics: RMSNorm pre-norm, rotary half-split convention with
configurable theta, grouped-query attention, SwiGLU MLP, no biases.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L
from alg_tpu.models import rope as R
from alg_tpu.models.clip import CLIPVisionConfig, clip_vision_hidden_states
from alg_tpu.ops import attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=lambda: CLIPVisionConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=24,
            num_attention_heads=16,
            image_size=336,
            patch_size=14,
            hidden_act="quick_gelu",
        )
    )
    image_token_index: int = 128257
    pad_token_id: int = 128258
    vision_feature_layer: int = -2  # penultimate CLIP layer
    vision_feature_select_strategy: str = "default"  # drop CLS token


def init_llama(key, cfg: LlamaConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 4))
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    blocks = []
    for _ in range(cfg.num_hidden_layers):
        blocks.append(
            {
                "input_norm": L.init_rms_norm(cfg.hidden_size, dtype=dtype),
                "q": L.init_linear(next(keys), cfg.hidden_size, cfg.hidden_size, bias=False, dtype=dtype),
                "k": L.init_linear(next(keys), cfg.hidden_size, kv_dim, bias=False, dtype=dtype),
                "v": L.init_linear(next(keys), cfg.hidden_size, kv_dim, bias=False, dtype=dtype),
                "o": L.init_linear(next(keys), cfg.hidden_size, cfg.hidden_size, bias=False, dtype=dtype),
                "post_norm": L.init_rms_norm(cfg.hidden_size, dtype=dtype),
                "gate": L.init_linear(next(keys), cfg.hidden_size, cfg.intermediate_size, bias=False, dtype=dtype),
                "up": L.init_linear(next(keys), cfg.hidden_size, cfg.intermediate_size, bias=False, dtype=dtype),
                "down": L.init_linear(next(keys), cfg.intermediate_size, cfg.hidden_size, bias=False, dtype=dtype),
            }
        )
    return {
        "embed": (jax.random.normal(next(keys), (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02).astype(dtype),
        "blocks": blocks,
        "final_norm": L.init_rms_norm(cfg.hidden_size, dtype=dtype),
    }


def llama_hidden_states(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, H]
    position_ids: Optional[jnp.ndarray] = None,  # [B, S]
    kv_len: Optional[jnp.ndarray] = None,  # [B] (right-padding mask)
):
    """Returns the hidden-states list with transformers' exact convention:
    ``[embeddings, after-L1, ..., after-L(n-1), final_norm(after-Ln)]`` — the
    LAST entry is final-normed and the un-normed last layer is not included."""
    b, s, hdim = inputs_embeds.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    if position_ids is None:
        pos = np.arange(s)
        angles = R.rope_frequencies(hd, pos, cfg.rope_theta)
        cos, sin = R.cos_sin_half(angles)
        cos = jnp.asarray(cos)[None]
        sin = jnp.asarray(sin)[None]
    else:
        inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
        ang = position_ids.astype(jnp.float32)[..., None] * jnp.asarray(inv, jnp.float32)[None, None]
        cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
        sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)

    x = inputs_embeds
    hidden_states = [x]
    n_blocks = len(params["blocks"])
    for bi, blk in enumerate(params["blocks"]):
        h = L.rms_norm(blk["input_norm"], x, cfg.rms_norm_eps)
        q = L.linear(blk["q"], h).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = L.linear(blk["k"], h).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        v = L.linear(blk["v"], h).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        q = R.apply_rope_half(q, cos[:, None], sin[:, None])
        k = R.apply_rope_half(k, cos[:, None], sin[:, None])
        if nkv != nh:
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        o = attention(q, k, v, causal=True, kv_len=kv_len)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, hdim)
        x = x + L.linear(blk["o"], o)
        h = L.rms_norm(blk["post_norm"], x, cfg.rms_norm_eps)
        x = x + L.linear(blk["down"], L.silu(L.linear(blk["gate"], h)) * L.linear(blk["up"], h))
        if bi == n_blocks - 1:
            hidden_states.append(L.rms_norm(params["final_norm"], x, cfg.rms_norm_eps))
        else:
            hidden_states.append(x)
    return hidden_states


# ---------------------------------------------------------------------------
# Llava
# ---------------------------------------------------------------------------


def init_llava(key, cfg: LlavaConfig, dtype=jnp.float32):
    from alg_tpu.models.clip import init_clip_vision

    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "language_model": init_llama(k1, cfg.text, dtype),
        "vision_tower": init_clip_vision(k2, cfg.vision, dtype),
        "projector": {
            "linear_1": L.init_linear(k3, cfg.vision.hidden_size, cfg.text.hidden_size, dtype=dtype),
            "linear_2": L.init_linear(k4, cfg.text.hidden_size, cfg.text.hidden_size, dtype=dtype),
        },
    }


def llava_image_features(params, cfg: LlavaConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """CLIP patch features (CLS dropped) → 2-layer GELU projector → [B, 576, H]."""
    hs = clip_vision_hidden_states(params["vision_tower"], cfg.vision, pixel_values)
    feats = hs[cfg.vision_feature_layer]
    if cfg.vision_feature_select_strategy == "default":
        feats = feats[:, 1:]
    p = params["projector"]
    return L.linear(p["linear_2"], jax.nn.gelu(L.linear(p["linear_1"], feats), approximate=False))


def llava_hidden_states(
    params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,  # [B, S] with image_token_index at image slots
    pixel_values: jnp.ndarray,  # [B, 3, H, W]
    attention_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
):
    """Text embedding with image features scattered over the image-token span;
    returns Llama hidden-state list (for ``hidden_states[-3]`` extraction)."""
    embeds = params["language_model"]["embed"][input_ids]
    img = llava_image_features(params, cfg, pixel_values).astype(embeds.dtype)
    is_image = (input_ids == cfg.image_token_index)[..., None]
    # image-token positions are a contiguous block of exactly img.shape[1]
    # slots (reference _expand_input_ids_with_image_tokens, :107-148)
    b, s, h = embeds.shape
    idx = jnp.cumsum(is_image.squeeze(-1).astype(jnp.int32), axis=1) - 1
    gathered = jnp.take_along_axis(img, jnp.clip(idx, 0, img.shape[1] - 1)[..., None], axis=1)
    embeds = jnp.where(is_image, gathered, embeds)
    kv_len = None if attention_mask is None else attention_mask.sum(axis=1).astype(jnp.int32)
    return llama_hidden_states(params["language_model"], cfg.text, embeds, position_ids, kv_len)
