"""CogVideoX 3D causal VAE — JAX implementation (channels-last).

Parity target: diffusers ``AutoencoderKLCogVideoX`` as used by the reference
(``pipeline_cogvideox_image2video_lowpass.py:30,217-223,388-400,428-433``):
  * causal 3D convs (temporal front-pad replicates the first frame k_t−1
    times; spatial zero pad),
  * 4 down blocks [128,256,256,512] × 3 resnets, spatial stride-2 downsample
    with asymmetric (0,1) padding on the first 3, causal temporal 2× pooling
    (first frame kept, remaining frames pair-averaged) on the first 2
    → 8× spatial, 4× temporal compression, F → (F−1)/4+1,
  * decoder resnets/out-norm use MoVQ-style spatial norm conditioned on the
    latent z (GroupNorm(f)·conv_y(zq↑) + conv_b(zq↑), nearest-resized with the
    first frame handled separately),
  * encoder emits [mean, logvar] (16+16 ch); sampling happens in the pipeline
    with host-supplied noise (torch RNG parity).

Layout is TPU-native channels-last ``[B, F, H, W, C]``; convs are XLA
``conv_general_dilated`` (NDHWC/DHWIO) which XLA maps onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    latent_channels: int = 16
    layers_per_block: int = 3
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    temporal_compression_ratio: int = 4
    scaling_factor: float = 0.7
    invert_scale_latents: bool = False

    @property
    def temporal_compress_level(self) -> int:
        return int(np.log2(self.temporal_compression_ratio))

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _init_conv3d(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32) / np.sqrt(fan_in)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def causal_conv3d(p, x: jnp.ndarray, stride=(1, 1, 1)) -> jnp.ndarray:
    """CogVideoXCausalConv3d: replicate-first-frame temporal pad, zero spatial pad."""
    kt, kh, kw = p["kernel"].shape[:3]
    if kt > 1:
        first = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([first, x], axis=1)
    pad = [(0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)]
    x = jnp.pad(x, pad)
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _conv2d_per_frame(p, x: jnp.ndarray, stride: int = 1, manual_pad: Optional[tuple] = None) -> jnp.ndarray:
    """2D conv applied to each frame of [B, F, H, W, C]."""
    b, f, h, w, c = x.shape
    xf = x.reshape(b * f, h, w, c)
    if manual_pad is not None:
        xf = jnp.pad(xf, [(0, 0), manual_pad[0], manual_pad[1], (0, 0)])
        padding = "VALID"
    else:
        kh, kw = p["kernel"].shape[:2]
        xf = jnp.pad(xf, [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)])
        padding = "VALID"
    y = jax.lax.conv_general_dilated(
        xf,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["bias"].astype(y.dtype)
    return y.reshape(b, f, y.shape[1], y.shape[2], y.shape[3])


def _temporal_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """Causal temporal 2× pooling: keep frame 0, pair-average the rest (odd F),
    or pair-average everything (even F). CogVideoXDownsample3D semantics."""
    f = x.shape[1]
    if f == 1:
        return x
    if f % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
        return jnp.concatenate([first, rest], axis=1)
    return 0.5 * (x[:, 0::2] + x[:, 1::2])


def _temporal_upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse layout of the causal pool: frame 0 kept, rest repeated 2×
    (nearest), F → 2F−1 for F>1 odd-style streams."""
    f = x.shape[1]
    if f == 1:
        return x
    first, rest = x[:, :1], x[:, 1:]
    rest = jnp.repeat(rest, 2, axis=1)
    return jnp.concatenate([first, rest], axis=1)


def _spatial_upsample2(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def _nearest_resize_frames(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest spatial resize of [B, F, H, W, C] (torch floor convention)."""
    ih, iw = x.shape[2], x.shape[3]
    hi = (np.arange(h) * ih // h).astype(np.int32)
    wi = (np.arange(w) * iw // w).astype(np.int32)
    return x[:, :, hi][:, :, :, wi]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _init_spatial_norm(key, f_ch, zq_ch, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm": L.init_group_norm(f_ch, dtype),
        "conv_y": _init_conv3d(k1, 1, 1, 1, zq_ch, f_ch, dtype),
        "conv_b": _init_conv3d(k2, 1, 1, 1, zq_ch, f_ch, dtype),
    }


def _spatial_norm(p, f: jnp.ndarray, zq: jnp.ndarray, groups: int, eps: float) -> jnp.ndarray:
    """CogVideoXSpatialNorm3D: zq nearest-resized (first frame separately when
    temporal sizes differ), then GN(f)·conv_y(zq) + conv_b(zq)."""
    bf, ff = f.shape[1], zq.shape[1]
    h, w = f.shape[2], f.shape[3]
    if ff != bf:
        # first latent frame conditions the first pixel frame; the rest are
        # nearest-repeated over the remaining frames
        z_first, z_rest = zq[:, :1], zq[:, 1:]
        reps = -(-(bf - 1) // max(zq.shape[1] - 1, 1))
        z_rest = jnp.repeat(z_rest, reps, axis=1)[:, : bf - 1]
        zq = jnp.concatenate([z_first, z_rest], axis=1)
    zq = _nearest_resize_frames(zq, h, w)
    norm_f = L.group_norm(p["norm"], f, groups, eps)
    return norm_f * causal_conv3d(p["conv_y"], zq) + causal_conv3d(p["conv_b"], zq)


def _init_resnet(key, cin, cout, dtype, spatial_norm_zq: Optional[int] = None):
    ks = jax.random.split(key, 5)
    p = {"conv1": _init_conv3d(ks[0], 3, 3, 3, cin, cout, dtype),
         "conv2": _init_conv3d(ks[1], 3, 3, 3, cout, cout, dtype)}
    if spatial_norm_zq is None:
        p["norm1"] = L.init_group_norm(cin, dtype)
        p["norm2"] = L.init_group_norm(cout, dtype)
    else:
        p["norm1"] = _init_spatial_norm(ks[2], cin, spatial_norm_zq, dtype)
        p["norm2"] = _init_spatial_norm(ks[3], cout, spatial_norm_zq, dtype)
    if cin != cout:
        p["conv_shortcut"] = _init_conv3d(ks[4], 1, 1, 1, cin, cout, dtype)
    return p


def _resnet(p, x: jnp.ndarray, groups: int, eps: float, zq: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    def norm(np_, h):
        if zq is None:
            return L.group_norm(np_, h, groups, eps)
        return _spatial_norm(np_, h, zq, groups, eps)

    h = L.silu(norm(p["norm1"], x))
    h = causal_conv3d(p["conv1"], h)
    h = L.silu(norm(p["norm2"], h))
    h = causal_conv3d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x)
    return x + h


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def init_cogvideox_vae(key, cfg: CogVideoXVAEConfig, dtype=jnp.float32):
    boc = cfg.block_out_channels
    n = len(boc)
    keys = iter(jax.random.split(key, 256))
    zc = cfg.latent_channels

    enc = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, cfg.in_channels, boc[0], dtype), "down": []}
    ch = boc[0]
    for i, out in enumerate(boc):
        blk = {"resnets": [_init_resnet(next(keys), ch if j == 0 else out, out, dtype) for j in range(cfg.layers_per_block)]}
        if i < n - 1:
            blk["downsample"] = {
                "conv": {"kernel": jax.random.normal(next(keys), (3, 3, out, out), jnp.float32).astype(dtype) / np.sqrt(9 * out),
                         "bias": jnp.zeros((out,), dtype)},
            }
        enc["down"].append(blk)
        ch = out
    enc["mid"] = [_init_resnet(next(keys), ch, ch, dtype) for _ in range(2)]
    enc["norm_out"] = L.init_group_norm(ch, dtype)
    enc["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, ch, 2 * zc, dtype)

    rev = list(reversed(boc))
    dec = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, zc, rev[0], dtype)}
    dec["mid"] = [_init_resnet(next(keys), rev[0], rev[0], dtype, spatial_norm_zq=zc) for _ in range(2)]
    dec["up"] = []
    ch = rev[0]
    for i, out in enumerate(rev):
        blk = {"resnets": [_init_resnet(next(keys), ch if j == 0 else out, out, dtype, spatial_norm_zq=zc)
                           for j in range(cfg.layers_per_block + 1)]}
        if i < n - 1:
            blk["upsample"] = {
                "conv": {"kernel": jax.random.normal(next(keys), (3, 3, out, out), jnp.float32).astype(dtype) / np.sqrt(9 * out),
                         "bias": jnp.zeros((out,), dtype)},
            }
        dec["up"].append(blk)
        ch = out
    dec["norm_out"] = _init_spatial_norm(next(keys), ch, zc, dtype)
    dec["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, ch, cfg.out_channels, dtype)
    return {"encoder": enc, "decoder": dec}


def cogvideox_vae_encode(params, cfg: CogVideoXVAEConfig, x: jnp.ndarray):
    """[B, F, H, W, 3] → (mean, logvar), each [B, F', H/8, W/8, latent_channels]."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    enc = params["encoder"]
    h = causal_conv3d(enc["conv_in"], x)
    for i, blk in enumerate(enc["down"]):
        for r in blk["resnets"]:
            h = _resnet(r, h, g, eps)
        if "downsample" in blk:
            # temporal compression on the first temporal_compress_level stages
            # (structure flag derived from cfg — params must stay bool-free so
            # they can be jit arguments)
            if i < cfg.temporal_compress_level:
                h = _temporal_pool2(h)
            h = _conv2d_per_frame(blk["downsample"]["conv"], h, stride=2, manual_pad=((0, 1), (0, 1)))
    for r in enc["mid"]:
        h = _resnet(r, h, g, eps)
    h = L.silu(L.group_norm(enc["norm_out"], h, g, eps))
    h = causal_conv3d(enc["conv_out"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def cogvideox_vae_decode(params, cfg: CogVideoXVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """[B, F', h, w, latent_channels] → [B, F, H, W, 3] (pre-scaled z expected)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    dec = params["decoder"]
    zq = z
    h = causal_conv3d(dec["conv_in"], z)
    for r in dec["mid"]:
        h = _resnet(r, h, g, eps, zq=zq)
    for i, blk in enumerate(dec["up"]):
        for r in blk["resnets"]:
            h = _resnet(r, h, g, eps, zq=zq)
        if "upsample" in blk:
            if i < cfg.temporal_compress_level:
                h = _temporal_upsample2(h)
            h = _spatial_upsample2(h)
            h = _conv2d_per_frame(blk["upsample"]["conv"], h)
    h = L.silu(_spatial_norm(dec["norm_out"], h, zq, g, eps))
    return causal_conv3d(dec["conv_out"], h)
