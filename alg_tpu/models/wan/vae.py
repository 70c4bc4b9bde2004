"""Wan 2.1 3D causal VAE — JAX implementation (channels-last).

Parity target: diffusers ``AutoencoderKLWan`` as used by the reference
(``pipeline_wan_image2video_lowpass.py:27,426-431,948-960``): causal 3D convs
(temporal front *zero* padding — unlike CogVideoX's first-frame replicate),
channel-wise RMS norm (``F.normalize·√C·γ``), base_dim 96 with multipliers
(1,2,4,4), 2 res blocks per stage, temporal downsample on stages 2-3
(``temperal_downsample=[False,True,True]``, 4× total), spatial 8×, single-head
spatial self-attention in the mid block, quant/post-quant 1×1×1 convs, and
per-channel ``latents_mean/std`` normalization applied by the *pipeline*.

Deterministic ("argmax"/mode) encode is first-class — the reference encodes
conditions with ``sample_mode="argmax"`` — the encoder returns (mean, logvar).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L

# Wan2.1 shipped normalization stats (vae/config.json latents_mean/std)
WAN21_LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
WAN21_LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)  # [sic]
    latents_mean: Tuple[float, ...] = WAN21_LATENTS_MEAN
    latents_std: Tuple[float, ...] = WAN21_LATENTS_STD

    @property
    def temporal_scale(self) -> int:
        return 2 ** sum(self.temperal_downsample)

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)


def _init_conv3d(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32) / np.sqrt(fan_in)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def causal_conv3d(p, x: jnp.ndarray, stride=(1, 1, 1)) -> jnp.ndarray:
    """WanCausalConv3d: temporal front zero-pad (k_t−1), symmetric spatial pad."""
    kt, kh, kw = p["kernel"].shape[:3]
    pad = [(0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)]
    x = jnp.pad(x, pad)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _rms_norm_channels(p, x: jnp.ndarray) -> jnp.ndarray:
    """WanRMS_norm: L2-normalize over channels · √C · γ (channels-last here)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
    y = xf / norm * np.sqrt(c) * p["gamma"].astype(jnp.float32)
    return y.astype(x.dtype)


def _init_rms(channels, dtype):
    return {"gamma": jnp.ones((channels,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _init_rms(cin, dtype),
        "conv1": _init_conv3d(k1, 3, 3, 3, cin, cout, dtype),
        "norm2": _init_rms(cout, dtype),
        "conv2": _init_conv3d(k2, 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv3d(k3, 1, 1, 1, cin, cout, dtype)
    return p


def _resnet(p, x):
    h = causal_conv3d(p["conv1"], L.silu(_rms_norm_channels(p["norm1"], x)))
    h = causal_conv3d(p["conv2"], L.silu(_rms_norm_channels(p["norm2"], h)))
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x)
    return x + h


def _init_attention(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _init_rms(dim, dtype),
        "to_qkv": _init_conv3d(k1, 1, 1, 1, dim, dim * 3, dtype),
        "proj": _init_conv3d(k2, 1, 1, 1, dim, dim, dtype),
    }


def _vae_attention(p, x):
    """Single-head spatial self-attention per frame (WanAttentionBlock)."""
    b, f, h, w, c = x.shape
    identity = x
    y = _rms_norm_channels(p["norm"], x)
    qkv = causal_conv3d(p["to_qkv"], y)
    q, k, v = jnp.split(qkv.reshape(b * f, h * w, 3 * c), 3, axis=-1)
    logits = jnp.einsum("bsc,btc->bst", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bst,btc->bsc", probs, v).reshape(b, f, h, w, c)
    return identity + causal_conv3d(p["proj"], o)


def _spatial_down(p, x):
    """ZeroPad2d((0,1,0,1)) + conv2d stride 2 per frame."""
    b, f, h, w, c = x.shape
    xf = jnp.pad(x.reshape(b * f, h, w, c), [(0, 0), (0, 1), (0, 1), (0, 0)])
    y = jax.lax.conv_general_dilated(
        xf, p["kernel"].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"].astype(x.dtype)
    return y.reshape(b, f, y.shape[1], y.shape[2], c)


def _spatial_up(p, x):
    """Nearest 2× + conv2d (channel-halving, WanResample upsample)."""
    b, f, h, w, c = x.shape
    xf = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3).reshape(b * f, 2 * h, 2 * w, c)
    xf = jnp.pad(xf, [(0, 0), (1, 1), (1, 1), (0, 0)])
    y = jax.lax.conv_general_dilated(
        xf, p["kernel"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"].astype(x.dtype)
    return y.reshape(b, f, 2 * h, 2 * w, y.shape[-1])


def init_wan_vae(key, cfg: WanVAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))
    dims = [cfg.base_dim * m for m in cfg.dim_mult]
    z = cfg.z_dim

    enc = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, 3, dims[0], dtype), "down": []}
    ch = dims[0]
    for i, out in enumerate(dims):
        blk = {"resnets": []}
        for j in range(cfg.num_res_blocks):
            blk["resnets"].append(_init_resnet(next(keys), ch if j == 0 else out, out, dtype))
        ch = out
        if i < len(dims) - 1:
            blk["downsample"] = {
                "conv": {
                    "kernel": (jax.random.normal(next(keys), (3, 3, out, out), jnp.float32) / np.sqrt(9 * out)).astype(dtype),
                    "bias": jnp.zeros((out,), dtype),
                },
            }
            if cfg.temperal_downsample[i]:
                blk["downsample"]["time_conv"] = _init_conv3d(next(keys), 3, 1, 1, out, out, dtype)
        enc["down"].append(blk)
    enc["mid"] = {
        "resnet1": _init_resnet(next(keys), ch, ch, dtype),
        "attn": _init_attention(next(keys), ch, dtype),
        "resnet2": _init_resnet(next(keys), ch, ch, dtype),
    }
    enc["norm_out"] = _init_rms(ch, dtype)
    enc["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, ch, 2 * z, dtype)

    rdims = list(reversed(dims))
    dec = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, z, rdims[0], dtype)}
    dec["mid"] = {
        "resnet1": _init_resnet(next(keys), rdims[0], rdims[0], dtype),
        "attn": _init_attention(next(keys), rdims[0], dtype),
        "resnet2": _init_resnet(next(keys), rdims[0], rdims[0], dtype),
    }
    dec["up"] = []
    ch = rdims[0]
    temporal_up = list(reversed(cfg.temperal_downsample))
    for i, out in enumerate(rdims):
        # decoder stage width halves through the upsampler (WanResample
        # upsample2d/3d maps dim → dim//2); resnets run at `ch` then upsample
        blk = {"resnets": []}
        stage_dim = out
        for j in range(cfg.num_res_blocks + 1):
            blk["resnets"].append(_init_resnet(next(keys), ch if j == 0 else stage_dim, stage_dim, dtype))
        ch = stage_dim
        if i < len(rdims) - 1:
            half = stage_dim // 2
            blk["upsample"] = {
                "conv": {
                    "kernel": (jax.random.normal(next(keys), (3, 3, stage_dim, half), jnp.float32) / np.sqrt(9 * stage_dim)).astype(dtype),
                    "bias": jnp.zeros((half,), dtype),
                },
            }
            if temporal_up[i]:
                blk["upsample"]["time_conv"] = _init_conv3d(next(keys), 3, 1, 1, stage_dim, stage_dim * 2, dtype)
            ch = half
        dec["up"].append(blk)
    dec["norm_out"] = _init_rms(ch, dtype)
    dec["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, ch, 3, dtype)
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _init_conv3d(next(keys), 1, 1, 1, 2 * z, 2 * z, dtype),
        "post_quant_conv": _init_conv3d(next(keys), 1, 1, 1, z, z, dtype),
    }


def _temporal_down_conv(p, x):
    """Causal stride-2 temporal conv: F → floor((F+1)/2) (odd F → (F+1)/2)."""
    return causal_conv3d(p, x, stride=(2, 1, 1))


def _temporal_up_conv(p, x):
    """time_conv dim→2·dim, interleave the two halves as consecutive frames,
    drop the duplicated first frame: F → 2F−1."""
    y = causal_conv3d(p, x)  # [B, F, H, W, 2C]
    b, f, h, w, c2 = y.shape
    c = c2 // 2
    y = y.reshape(b, f, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * f, h, w, c)
    return y[:, 1:]


def wan_vae_encode(params, cfg: WanVAEConfig, x: jnp.ndarray):
    """[B, F, H, W, 3] → (mean, logvar) each [B, F', H/8, W/8, z]."""
    enc = params["encoder"]
    h = causal_conv3d(enc["conv_in"], x)
    for blk in enc["down"]:
        for r in blk["resnets"]:
            h = _resnet(r, h)
        if "downsample" in blk:
            # temporal stage ⇔ the time_conv weights exist (bool-free params)
            if "time_conv" in blk["downsample"]:
                h = _temporal_down_conv(blk["downsample"]["time_conv"], h)
            h = _spatial_down(blk["downsample"]["conv"], h)
    h = _resnet(enc["mid"]["resnet1"], h)
    h = _vae_attention(enc["mid"]["attn"], h)
    h = _resnet(enc["mid"]["resnet2"], h)
    h = causal_conv3d(enc["conv_out"], L.silu(_rms_norm_channels(enc["norm_out"], h)))
    h = causal_conv3d(params["quant_conv"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def wan_vae_decode(params, cfg: WanVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """[B, F', h, w, z] → [B, F, H, W, 3] (de-normalized z expected)."""
    dec = params["decoder"]
    z = causal_conv3d(params["post_quant_conv"], z)
    h = causal_conv3d(dec["conv_in"], z)
    h = _resnet(dec["mid"]["resnet1"], h)
    h = _vae_attention(dec["mid"]["attn"], h)
    h = _resnet(dec["mid"]["resnet2"], h)
    for blk in dec["up"]:
        for r in blk["resnets"]:
            h = _resnet(r, h)
        if "upsample" in blk:
            if "time_conv" in blk["upsample"]:
                h = _temporal_up_conv(blk["upsample"]["time_conv"], h)
            h = _spatial_up(blk["upsample"]["conv"], h)
    h = causal_conv3d(dec["conv_out"], L.silu(_rms_norm_channels(dec["norm_out"], h)))
    return h
