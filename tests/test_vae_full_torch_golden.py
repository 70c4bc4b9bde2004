"""Full Wan / HunyuanVideo VAE encoder+decoder torch goldens.

Completes the composition-level VAE validation (CogVideoX lives in
test_vae_torch_golden.py): torch NCDHW references for the published
``AutoencoderKLWan`` / ``AutoencoderKLHunyuanVideo`` semantics — Wan's
zero-front-pad causal convs, channel RMS norms, asymmetric-pad spatial
resamples and interleaving temporal up-conv; Hunyuan's replicate-pad causal
convs, per-frame mid attention, (2,2,2)/(1,2,2) strided downsample convs and
causal temporal upsample — driven with shared random weights.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _t(x):
    return torch.tensor(np.asarray(x, np.float64))


def _to_ncdhw(x):
    return _t(x).permute(0, 4, 1, 2, 3)


def _from_ncdhw(y):
    return np.asarray(y.permute(0, 2, 3, 4, 1))


def _w3d(p):
    return _t(np.asarray(p["kernel"], np.float64).transpose(4, 3, 0, 1, 2)), _t(p["bias"])


def _randomize(params, seed, scale=0.25):
    r = np.random.RandomState(seed)
    leaves, td = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(
        td, [jnp.asarray(scale * r.randn(*l.shape), l.dtype) for l in leaves]
    )


# ---------------------------------------------------------------------------
# Wan
# ---------------------------------------------------------------------------


def _wan_conv(p, x, stride=(1, 1, 1)):
    """WanCausalConv3d: temporal front ZERO pad (kt-1), symmetric spatial."""
    w, b = _w3d(p)
    kt, kh, kw = w.shape[2:]
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, kt - 1, 0))
    return F.conv3d(x, w, b, stride=stride)


def _wan_rms(p, x):
    """WanRMS_norm over channels (dim=1 in NCDHW): x/||x|| · √C · γ."""
    c = x.shape[1]
    norm = torch.sqrt((x * x).sum(dim=1, keepdim=True) + 1e-12)
    return x / norm * math.sqrt(c) * _t(p["gamma"]).reshape(1, -1, 1, 1, 1)


def _wan_resnet(p, x):
    h = _wan_conv(p["conv1"], F.silu(_wan_rms(p["norm1"], x)))
    h = _wan_conv(p["conv2"], F.silu(_wan_rms(p["norm2"], h)))
    if "conv_shortcut" in p:
        x = _wan_conv(p["conv_shortcut"], x)
    return x + h


def _wan_attn(p, x):
    b, c, f, h, w = x.shape
    y = _wan_rms(p["norm"], x)
    qkv = _wan_conv(p["to_qkv"], y)  # [B, 3C, F, H, W]
    qkv = qkv.permute(0, 2, 3, 4, 1).reshape(b * f, h * w, 3 * c)
    q, k, v = qkv.chunk(3, dim=-1)
    logits = q @ k.transpose(-1, -2) / math.sqrt(c)
    o = torch.softmax(logits, dim=-1) @ v
    o = o.reshape(b, f, h, w, c).permute(0, 4, 1, 2, 3)
    return x + _wan_conv(p["proj"], o)


def _wan_conv2d_frames(p, x, stride, pad):
    """2D conv per frame; pad = (left, right, top, bottom)."""
    w = _t(np.asarray(p["kernel"], np.float64).transpose(3, 2, 0, 1))
    b = _t(p["bias"])
    bs, c, f, hh, ww = x.shape
    xf = x.permute(0, 2, 1, 3, 4).reshape(bs * f, c, hh, ww)
    xf = F.pad(xf, pad)
    y = F.conv2d(xf, w, b, stride=stride)
    return y.reshape(bs, f, y.shape[1], y.shape[2], y.shape[3]).permute(0, 2, 1, 3, 4)


def _wan_temporal_up(p, x):
    y = _wan_conv(p, x)  # [B, 2C, F, H, W]
    b, c2, f, h, w = y.shape
    c = c2 // 2
    # interleave the two channel halves as consecutive frames, drop frame 0
    y = y.reshape(b, 2, c, f, h, w).permute(0, 2, 3, 1, 4, 5).reshape(b, c, 2 * f, h, w)
    return y[:, :, 1:]


def torch_wan_vae_encode(params, cfg, x):
    """Vendored-torch Wan VAE encoder on NCDHW input → (mean, logvar)."""
    enc = params["encoder"]
    h = _wan_conv(enc["conv_in"], x)
    for blk in enc["down"]:
        for r in blk["resnets"]:
            h = _wan_resnet(r, h)
        if "downsample" in blk:
            if "time_conv" in blk["downsample"]:
                h = _wan_conv(blk["downsample"]["time_conv"], h, stride=(2, 1, 1))
            h = _wan_conv2d_frames(blk["downsample"]["conv"], h, 2, (0, 1, 0, 1))
    h = _wan_resnet(enc["mid"]["resnet1"], h)
    h = _wan_attn(enc["mid"]["attn"], h)
    h = _wan_resnet(enc["mid"]["resnet2"], h)
    h = _wan_conv(enc["conv_out"], F.silu(_wan_rms(enc["norm_out"], h)))
    h = _wan_conv(params["quant_conv"], h)
    return h.chunk(2, dim=1)


def torch_wan_vae_decode(params, cfg, z):
    """Vendored-torch Wan VAE decoder on NCDHW latents."""
    dec = params["decoder"]
    z = _wan_conv(params["post_quant_conv"], z)
    h = _wan_conv(dec["conv_in"], z)
    h = _wan_resnet(dec["mid"]["resnet1"], h)
    h = _wan_attn(dec["mid"]["attn"], h)
    h = _wan_resnet(dec["mid"]["resnet2"], h)
    for blk in dec["up"]:
        for r in blk["resnets"]:
            h = _wan_resnet(r, h)
        if "upsample" in blk:
            if "time_conv" in blk["upsample"]:
                h = _wan_temporal_up(blk["upsample"]["time_conv"], h)
            h = torch.repeat_interleave(torch.repeat_interleave(h, 2, dim=3), 2, dim=4)
            h = _wan_conv2d_frames(blk["upsample"]["conv"], h, 1, (1, 1, 1, 1))
    return _wan_conv(dec["conv_out"], F.silu(_wan_rms(dec["norm_out"], h)))


def test_wan_full_vae_torch_golden(rng):
    from alg_tpu.models.wan.vae import WanVAEConfig, init_wan_vae, wan_vae_decode, wan_vae_encode

    cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                       temperal_downsample=(False, True, True))
    params = _randomize(init_wan_vae(jax.random.PRNGKey(5), cfg), seed=31)

    def t_encode(x):
        return torch_wan_vae_encode(params, cfg, x)

    def t_decode(z):
        return torch_wan_vae_decode(params, cfg, z)

    x = rng.randn(1, 5, 32, 32, 3).astype(np.float32)
    mean_j, logvar_j = wan_vae_encode(params, cfg, jnp.asarray(x))
    mean_t, logvar_t = t_encode(_to_ncdhw(x))
    np.testing.assert_allclose(np.asarray(mean_j), _from_ncdhw(mean_t), atol=5e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), _from_ncdhw(logvar_t), atol=5e-4)

    z = np.asarray(mean_j)
    rec_j = wan_vae_decode(params, cfg, jnp.asarray(z))
    rec_t = t_decode(_to_ncdhw(z))
    assert rec_j.shape == (1, 5, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(rec_j), _from_ncdhw(rec_t), atol=2e-3)


# ---------------------------------------------------------------------------
# HunyuanVideo
# ---------------------------------------------------------------------------


def _hy_conv(p, x, stride=(1, 1, 1)):
    """HunyuanVideoCausalConv3d: replicate-first-frame temporal pad."""
    w, b = _w3d(p)
    kt, kh, kw = w.shape[2:]
    if kt > 1:
        first = x[:, :, :1].repeat(1, 1, kt - 1, 1, 1)
        x = torch.cat([first, x], dim=2)
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, 0, 0))
    return F.conv3d(x, w, b, stride=stride)


def _hy_gn(p, x, groups, eps):
    return F.group_norm(x, groups, _t(p["scale"]), _t(p["bias"]), eps)


def _hy_resnet(p, x, g, eps):
    h = _hy_conv(p["conv1"], F.silu(_hy_gn(p["norm1"], x, g, eps)))
    h = _hy_conv(p["conv2"], F.silu(_hy_gn(p["norm2"], h, g, eps)))
    if "conv_shortcut" in p:
        x = _hy_conv(p["conv_shortcut"], x)
    return x + h


def _hy_lin(p, x):
    y = x @ _t(p["kernel"])
    if "bias" in p:
        y = y + _t(p["bias"])
    return y


def _hy_attn(p, x, g, eps):
    b, c, f, h, w = x.shape
    y = _hy_gn(p["group_norm"], x, g, eps)
    y = y.permute(0, 2, 3, 4, 1).reshape(b * f, h * w, c)
    q, k, v = _hy_lin(p["to_q"], y), _hy_lin(p["to_k"], y), _hy_lin(p["to_v"], y)
    logits = q @ k.transpose(-1, -2) / math.sqrt(c)
    o = _hy_lin(p["to_out"], torch.softmax(logits, dim=-1) @ v)
    return x + o.reshape(b, f, h, w, c).permute(0, 4, 1, 2, 3)


def _hy_temporal_up(x):
    if x.shape[2] == 1:
        return x
    first, rest = x[:, :, :1], x[:, :, 1:]
    return torch.cat([first, torch.repeat_interleave(rest, 2, dim=2)], dim=2)


def torch_hy_vae_encode(params, cfg, x):
    """Vendored-torch HunyuanVideo VAE encoder on NCDHW input → (mean, logvar)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    enc = params["encoder"]
    h = _hy_conv(enc["conv_in"], x)
    for i, blk in enumerate(enc["down"]):
        for r in blk["resnets"]:
            h = _hy_resnet(r, h, g, eps)
        if "downsample" in blk:
            stride = (2, 2, 2) if i < cfg.temporal_compress_level else (1, 2, 2)
            h = _hy_conv(blk["downsample"]["conv"], h, stride=stride)
    h = _hy_resnet(enc["mid"]["resnet1"], h, g, eps)
    h = _hy_attn(enc["mid"]["attn"], h, g, eps)
    h = _hy_resnet(enc["mid"]["resnet2"], h, g, eps)
    h = _hy_conv(enc["conv_out"], F.silu(_hy_gn(enc["norm_out"], h, g, eps)))
    h = _hy_conv(params["quant_conv"], h)
    return h.chunk(2, dim=1)


def torch_hy_vae_decode(params, cfg, z):
    """Vendored-torch HunyuanVideo VAE decoder on NCDHW latents."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    dec = params["decoder"]
    z = _hy_conv(params["post_quant_conv"], z)
    h = _hy_conv(dec["conv_in"], z)
    h = _hy_resnet(dec["mid"]["resnet1"], h, g, eps)
    h = _hy_attn(dec["mid"]["attn"], h, g, eps)
    h = _hy_resnet(dec["mid"]["resnet2"], h, g, eps)
    for i, blk in enumerate(dec["up"]):
        for r in blk["resnets"]:
            h = _hy_resnet(r, h, g, eps)
        if "upsample" in blk:
            if i < cfg.temporal_compress_level:
                h = _hy_temporal_up(h)
            h = torch.repeat_interleave(torch.repeat_interleave(h, 2, dim=3), 2, dim=4)
            h = _hy_conv(blk["upsample"]["conv"], h)
    return _hy_conv(dec["conv_out"], F.silu(_hy_gn(dec["norm_out"], h, g, eps)))


def test_hunyuan_full_vae_torch_golden(rng):
    from alg_tpu.models.hunyuan.vae import (
        HunyuanVAEConfig,
        hunyuan_vae_decode,
        hunyuan_vae_encode,
        init_hunyuan_vae,
    )

    cfg = HunyuanVAEConfig(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                           layers_per_block=1, norm_num_groups=4)
    params = _randomize(init_hunyuan_vae(jax.random.PRNGKey(6), cfg), seed=41)

    def t_encode(x):
        return torch_hy_vae_encode(params, cfg, x)

    def t_decode(z):
        return torch_hy_vae_decode(params, cfg, z)

    x = rng.randn(1, 5, 32, 32, 3).astype(np.float32)
    mean_j, logvar_j = hunyuan_vae_encode(params, cfg, jnp.asarray(x))
    mean_t, logvar_t = t_encode(_to_ncdhw(x))
    np.testing.assert_allclose(np.asarray(mean_j), _from_ncdhw(mean_t), atol=5e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), _from_ncdhw(logvar_t), atol=5e-4)

    z = np.asarray(mean_j)
    rec_j = hunyuan_vae_decode(params, cfg, jnp.asarray(z))
    rec_t = t_decode(_to_ncdhw(z))
    assert rec_j.shape == (1, 5, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(rec_j), _from_ncdhw(rec_t), atol=2e-3)
