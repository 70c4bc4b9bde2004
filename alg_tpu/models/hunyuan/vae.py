"""HunyuanVideo 3D causal VAE — JAX implementation (channels-last).

Parity target: diffusers ``AutoencoderKLHunyuanVideo`` as used by the
reference (``pipeline_hunyuan_video_image2video_lowpass.py:277,601-628``):
causal 3D convs with *replicate* temporal front padding, GroupNorm resnets,
block widths (128, 256, 512, 512) × 2 resnets, stride-2 causal conv
downsampling — spatiotemporal (2,2,2) on the stages that compress time,
spatial (1,2,2) otherwise — mid-block single-head spatial attention per
frame, nearest-upsampling decoder, quant/post-quant convs, scaling factor
0.476986, 4× temporal / 8× spatial compression (F → (F−1)/4+1).

The reference relies on VAE tiling/slicing for memory (``:601-628``); here
whole-clip channels-last XLA convs are used (blocked decode is a later-round
optimization).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    temporal_compression_ratio: int = 4
    scaling_factor: float = 0.476986

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def temporal_compress_level(self) -> int:
        return int(np.log2(self.temporal_compression_ratio))


def _init_conv3d(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32) / np.sqrt(fan_in)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def causal_conv3d(p, x: jnp.ndarray, stride=(1, 1, 1)) -> jnp.ndarray:
    """HunyuanVideoCausalConv3d: replicate temporal front pad, zero spatial pad."""
    kt, kh, kw = p["kernel"].shape[:3]
    if kt > 1:
        first = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([first, x], axis=1)
    x = jnp.pad(x, [(0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": L.init_group_norm(cin, dtype),
        "conv1": _init_conv3d(ks[0], 3, 3, 3, cin, cout, dtype),
        "norm2": L.init_group_norm(cout, dtype),
        "conv2": _init_conv3d(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv3d(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _resnet(p, x, groups, eps):
    h = causal_conv3d(p["conv1"], L.silu(L.group_norm(p["norm1"], x, groups, eps)))
    h = causal_conv3d(p["conv2"], L.silu(L.group_norm(p["norm2"], h, groups, eps)))
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x)
    return x + h


def _init_attention(key, dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": L.init_group_norm(dim, dtype),
        "to_q": L.init_linear(ks[0], dim, dim, dtype=dtype),
        "to_k": L.init_linear(ks[1], dim, dim, dtype=dtype),
        "to_v": L.init_linear(ks[2], dim, dim, dtype=dtype),
        "to_out": L.init_linear(ks[3], dim, dim, dtype=dtype),
    }


def _mid_attention(p, x, groups, eps):
    """Single-head spatial self-attention per frame (diffusers Attention with
    spatial_norm absent, GroupNorm pre-norm)."""
    b, f, h, w, c = x.shape
    identity = x
    y = L.group_norm(p["group_norm"], x, groups, eps).reshape(b * f, h * w, c)
    q = L.linear(p["to_q"], y)
    k = L.linear(p["to_k"], y)
    v = L.linear(p["to_v"], y)
    logits = jnp.einsum("bsc,btc->bst", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = L.linear(p["to_out"], jnp.einsum("bst,btc->bsc", probs, v))
    return identity + o.reshape(b, f, h, w, c)


def init_hunyuan_vae(key, cfg: HunyuanVAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))
    boc = cfg.block_out_channels
    n = len(boc)
    z = cfg.latent_channels

    enc = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, cfg.in_channels, boc[0], dtype), "down": []}
    ch = boc[0]
    for i, out in enumerate(boc):
        blk = {"resnets": [_init_resnet(next(keys), ch if j == 0 else out, out, dtype) for j in range(cfg.layers_per_block)]}
        ch = out
        if i < n - 1:
            blk["downsample"] = {
                "conv": _init_conv3d(next(keys), 3, 3, 3, out, out, dtype),
            }
        enc["down"].append(blk)
    enc["mid"] = {
        "resnet1": _init_resnet(next(keys), ch, ch, dtype),
        "attn": _init_attention(next(keys), ch, dtype),
        "resnet2": _init_resnet(next(keys), ch, ch, dtype),
    }
    enc["norm_out"] = L.init_group_norm(ch, dtype)
    enc["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, ch, 2 * z, dtype)

    rev = list(reversed(boc))
    dec = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, z, rev[0], dtype)}
    dec["mid"] = {
        "resnet1": _init_resnet(next(keys), rev[0], rev[0], dtype),
        "attn": _init_attention(next(keys), rev[0], dtype),
        "resnet2": _init_resnet(next(keys), rev[0], rev[0], dtype),
    }
    dec["up"] = []
    ch = rev[0]
    for i, out in enumerate(rev):
        blk = {"resnets": [_init_resnet(next(keys), ch if j == 0 else out, out, dtype) for j in range(cfg.layers_per_block + 1)]}
        ch = out
        if i < n - 1:
            blk["upsample"] = {
                "conv": _init_conv3d(next(keys), 3, 3, 3, out, out, dtype),
            }
        dec["up"].append(blk)
    dec["norm_out"] = L.init_group_norm(ch, dtype)
    dec["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, ch, cfg.out_channels, dtype)
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _init_conv3d(next(keys), 1, 1, 1, 2 * z, 2 * z, dtype),
        "post_quant_conv": _init_conv3d(next(keys), 1, 1, 1, z, z, dtype),
    }


def _causal_temporal_upsample(x):
    """Nearest upsample: first frame kept, later frames doubled (F → 2F−1),
    matching the causal decode frame count (1 + 4·(F'−1) pixels total)."""
    f = x.shape[1]
    if f == 1:
        return x
    first, rest = x[:, :1], x[:, 1:]
    rest = jnp.repeat(rest, 2, axis=1)
    return jnp.concatenate([first, rest], axis=1)


def hunyuan_vae_encode(params, cfg: HunyuanVAEConfig, x: jnp.ndarray):
    """[B, F, H, W, 3] → (mean, logvar) each [B, (F−1)/4+1, H/8, W/8, z]."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    enc = params["encoder"]
    h = causal_conv3d(enc["conv_in"], x)
    for i, blk in enumerate(enc["down"]):
        for r in blk["resnets"]:
            h = _resnet(r, h, g, eps)
        if "downsample" in blk:
            # stride-2 causal conv; (2,2,2) on temporal-compress stages
            # (structure derived from cfg — params stay bool-free for jit)
            stride = (2, 2, 2) if i < cfg.temporal_compress_level else (1, 2, 2)
            h = causal_conv3d(blk["downsample"]["conv"], h, stride=stride)
    h = _resnet(enc["mid"]["resnet1"], h, g, eps)
    h = _mid_attention(enc["mid"]["attn"], h, g, eps)
    h = _resnet(enc["mid"]["resnet2"], h, g, eps)
    h = causal_conv3d(enc["conv_out"], L.silu(L.group_norm(enc["norm_out"], h, g, eps)))
    h = causal_conv3d(params["quant_conv"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def hunyuan_vae_decode(params, cfg: HunyuanVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """[B, F', h, w, z] → [B, 1+4(F'−1), H, W, 3] (pre-scaled z expected)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    dec = params["decoder"]
    z = causal_conv3d(params["post_quant_conv"], z)
    h = causal_conv3d(dec["conv_in"], z)
    h = _resnet(dec["mid"]["resnet1"], h, g, eps)
    h = _mid_attention(dec["mid"]["attn"], h, g, eps)
    h = _resnet(dec["mid"]["resnet2"], h, g, eps)
    for i, blk in enumerate(dec["up"]):
        for r in blk["resnets"]:
            h = _resnet(r, h, g, eps)
        if "upsample" in blk:
            if i < cfg.temporal_compress_level:
                h = _causal_temporal_upsample(h)
            h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
            h = causal_conv3d(blk["upsample"]["conv"], h)
    h = causal_conv3d(dec["conv_out"], L.silu(L.group_norm(dec["norm_out"], h, g, eps)))
    return h
