"""Shared functional building blocks.

Models in this framework are pure functions over plain nested-dict parameter
pytrees: ``init_*`` builds (randomly initialized) params, ``apply`` functions
consume them. No module framework — this keeps safetensors weight mapping,
pjit partition specs, and scan-over-layers trivially explicit.

Compute policy: parameters are stored in their checkpoint dtype; matmuls run
in the activation dtype (bf16 on TPU) with fp32 accumulation where it matters
(norms, softmax, modulation).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32, scale: Optional[float] = None):
    kw, kb = jax.random.split(key)
    s = scale if scale is not None else 1.0 / math.sqrt(d_in)
    p = {"kernel": (jax.random.normal(kw, (d_in, d_out), jnp.float32) * s).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p or "kernel_q4" in p:  # opt-in W8A8/W4A8 serving modes (alg_tpu.ops.quant)
        from alg_tpu.ops.quant import quantized_linear

        y = quantized_linear(p, x)
    else:
        y = x @ p["kernel"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
    if "lora_A" in p:
        # attached (unmerged) low-rank adapter — training/lora.attach_lora:
        # y += (x·A)·B in fp32. This is the QLoRA path: the frozen base stays
        # int8/int4 on device while gradients flow through A/B only.
        xf = x.astype(jnp.float32)
        y = y + ((xf @ p["lora_A"]) @ p["lora_B"]).astype(y.dtype)
    return y


def init_layer_norm(dim: int, affine: bool = True, dtype=jnp.float32):
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in p:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_rms_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x: jnp.ndarray, eps: float = 1e-6, offset: float = 0.0) -> jnp.ndarray:
    """RMSNorm; ``offset=1.0`` gives the (1+scale) convention some models use."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    y = y * (p["scale"].astype(jnp.float32) + offset)
    return y.astype(x.dtype)


def t5_layer_norm(p, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """T5-style RMSNorm: variance in fp32, scale applied in weight dtype."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def init_group_norm(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(p, x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over a channels-last array ``[..., C]`` (normalizes over all
    non-batch spatial dims within each channel group, matching torch)."""
    # x: [B, *spatial, C]
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """'gelu-approximate' (tanh) — matches torch GELU(approximate='tanh')."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """diffusers ``Timesteps`` / ``get_timestep_embedding`` semantics.

    half = dim//2; exponent = -log(max_period) * arange(half) / (half - shift);
    emb = t * exp(exponent); out = [sin, cos] (or [cos, sin] when flipped).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None] * scale
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def init_timestep_embedding(key, in_dim: int, time_embed_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, in_dim, time_embed_dim, dtype=dtype),
        "linear_2": init_linear(k2, time_embed_dim, time_embed_dim, dtype=dtype),
    }


def timestep_embedding_mlp(p, sample: jnp.ndarray, act=silu) -> jnp.ndarray:
    """diffusers ``TimestepEmbedding``: linear → act → linear."""
    return linear(p["linear_2"], act(linear(p["linear_1"], sample)))


def init_mlp(key, dim: int, inner_dim: int, out_dim: Optional[int] = None, bias: bool = True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc_in": init_linear(k1, dim, inner_dim, bias=bias, dtype=dtype),
        "fc_out": init_linear(k2, inner_dim, out_dim or dim, bias=bias, dtype=dtype),
    }


def mlp(p, x: jnp.ndarray, act=gelu_tanh) -> jnp.ndarray:
    return linear(p["fc_out"], act(linear(p["fc_in"], x)))
