"""CLIP vision + text encoders — JAX implementation.

Parity targets (validated against tiny-random transformers models in tests):
  * ``CLIPVisionModel`` — Wan's image encoder; the reference takes
    ``hidden_states[-2]`` (penultimate layer output, no final norm) as the
    I2V image conditioning (``pipeline_wan_image2video_lowpass.py:226-234``).
  * ``CLIPTextModel`` — HunyuanVideo's pooled text encoder #2
    (``pipeline_hunyuan_video_image2video_lowpass.py:421-452``): causal
    attention, final LN, pooled output at the EOS token position.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L
from alg_tpu.ops import attention

# OpenAI CLIP normalization (CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # laion ViT-H; OpenAI models use quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=(name == "gelu_new"))
    raise ValueError(name)


def _init_encoder_layer(key, dim, inter, dtype):
    ks = jax.random.split(key, 6)
    return {
        "layer_norm1": L.init_layer_norm(dim, dtype=dtype),
        "attn": {
            "q": L.init_linear(ks[0], dim, dim, dtype=dtype),
            "k": L.init_linear(ks[1], dim, dim, dtype=dtype),
            "v": L.init_linear(ks[2], dim, dim, dtype=dtype),
            "out": L.init_linear(ks[3], dim, dim, dtype=dtype),
        },
        "layer_norm2": L.init_layer_norm(dim, dtype=dtype),
        "mlp": {"fc1": L.init_linear(ks[4], dim, inter, dtype=dtype), "fc2": L.init_linear(ks[5], inter, dim, dtype=dtype)},
    }


def _encoder_layer(p, x, num_heads, eps, act, causal):
    b, s, dim = x.shape
    hd = dim // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    h = L.layer_norm(p["layer_norm1"], x, eps)
    q, k, v = (heads(L.linear(p["attn"][n], h)) for n in ("q", "k", "v"))
    o = attention(q, k, v, causal=causal)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, dim)
    x = x + L.linear(p["attn"]["out"], o)
    h = L.layer_norm(p["layer_norm2"], x, eps)
    x = x + L.linear(p["mlp"]["fc2"], act(L.linear(p["mlp"]["fc1"], h)))
    return x


# ---------------------------------------------------------------------------
# vision
# ---------------------------------------------------------------------------


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    keys = jax.random.split(key, cfg.num_hidden_layers + 4)
    return {
        "class_embedding": (jax.random.normal(keys[0], (cfg.hidden_size,), jnp.float32) * 0.02).astype(dtype),
        "patch_embedding": {
            "kernel": (
                jax.random.normal(
                    keys[1], (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size), jnp.float32
                )
                * 0.02
            ).astype(dtype)
        },
        "position_embedding": (jax.random.normal(keys[2], (n_pos, cfg.hidden_size), jnp.float32) * 0.02).astype(dtype),
        "pre_layrnorm": L.init_layer_norm(cfg.hidden_size, dtype=dtype),
        "layers": [
            _init_encoder_layer(keys[3 + i], cfg.hidden_size, cfg.intermediate_size, dtype)
            for i in range(cfg.num_hidden_layers)
        ],
        "post_layernorm": L.init_layer_norm(cfg.hidden_size, dtype=dtype),
    }


def clip_vision_hidden_states(params, cfg: CLIPVisionConfig, pixel_values: jnp.ndarray):
    """``pixel_values`` [B, 3, H, W] (CLIP-normalized) → list of hidden states
    per layer (index [-2] = penultimate, the Wan conditioning)."""
    b = pixel_values.shape[0]
    x = pixel_values.transpose(0, 2, 3, 1)  # NHWC
    patches = jax.lax.conv_general_dilated(
        x,
        params["patch_embedding"]["kernel"].astype(x.dtype),
        (cfg.patch_size, cfg.patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype), (b, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, patches], axis=1) + params["position_embedding"].astype(x.dtype)[None]
    h = L.layer_norm(params["pre_layrnorm"], h, cfg.layer_norm_eps)
    act = _act(cfg.hidden_act)
    hidden_states = [h]
    for lp in params["layers"]:
        h = _encoder_layer(lp, h, cfg.num_attention_heads, cfg.layer_norm_eps, act, causal=False)
        hidden_states.append(h)
    return hidden_states


def clip_preprocess(image, size: int = 224) -> np.ndarray:
    """Image → CLIP pixel_values [1, 3, size, size] (resize shortest edge
    bicubic, center crop, rescale, normalize — CLIPImageProcessor defaults).

    Accepts PIL images or arrays ([H,W,C] / [C,H,W] / [B,C,H,W] in [0,1] or
    [-1,1] or uint8) — arrays are round-tripped through PIL for the resize."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        arr = np.asarray(image, np.float32)
        if arr.ndim == 4:
            arr = arr[0]
        if arr.ndim == 3 and arr.shape[0] in (1, 3):
            arr = arr.transpose(1, 2, 0)
        if arr.min() < -0.01:  # [-1, 1] convention
            arr = arr / 2.0 + 0.5
        if arr.max() <= 1.5:
            arr = arr * 255.0
        image = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))

    w, h = image.size
    scale = size / min(w, h)
    image = image.resize((round(w * scale), round(h * scale)), resample=Image.BICUBIC)
    w, h = image.size
    left, top = (w - size) // 2, (h - size) // 2
    image = image.crop((left, top, left + size, top + size))
    arr = np.asarray(image.convert("RGB")).astype(np.float32) / 255.0
    arr = (arr - np.array(CLIP_IMAGE_MEAN)) / np.array(CLIP_IMAGE_STD)
    return arr.transpose(2, 0, 1)[None].astype(np.float32)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    return {
        "token_embedding": (jax.random.normal(keys[0], (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02).astype(dtype),
        "position_embedding": (jax.random.normal(keys[1], (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32) * 0.02).astype(dtype),
        "layers": [
            _init_encoder_layer(keys[2 + i], cfg.hidden_size, cfg.intermediate_size, dtype)
            for i in range(cfg.num_hidden_layers)
        ],
        "final_layer_norm": L.init_layer_norm(cfg.hidden_size, dtype=dtype),
    }


def clip_text_encode(params, cfg: CLIPTextConfig, input_ids: jnp.ndarray):
    """Returns (last_hidden_state, pooled) — pooled at the EOS token position
    (transformers CLIPTextModel pooler for eos_token_id=49407 vocab)."""
    s = input_ids.shape[1]
    h = params["token_embedding"][input_ids] + params["position_embedding"][:s][None]
    act = _act(cfg.hidden_act)
    for lp in params["layers"]:
        h = _encoder_layer(lp, h, cfg.num_attention_heads, cfg.layer_norm_eps, act, causal=True)
    h = L.layer_norm(params["final_layer_norm"], h, cfg.layer_norm_eps)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = h[jnp.arange(h.shape[0]), eos_pos]
    return h, pooled
