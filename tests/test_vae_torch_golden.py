"""CogVideoX 3D-VAE building-block golden parity vs vendored torch references
(VERDICT r1 item 7 / weak #4).

Real checkpoints and diffusers are unreachable (zero egress), so the
trickiest VAE pieces — the causal 3D convolution, the causal temporal
pool/upsample, and the MoVQ spatial norm — are re-implemented here in torch
following the published ``AutoencoderKLCogVideoX`` block semantics
(NCDHW, ``F.avg_pool1d``, nearest ``F.interpolate``, replicate-first-frame
temporal pad; reference touchpoints
``pipeline_cogvideox_image2video_lowpass.py:217-223,388-400,428-433``) and
compared elementwise against the NDHWC JAX implementations with shared
random weights. This pins down layout/indexing/conv-convention bugs that
structural tests can't see.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from alg_tpu.models.cogvideox.vae import (
    _init_resnet,
    _init_spatial_norm,
    _resnet,
    _spatial_norm,
    _temporal_pool2,
    _temporal_upsample2,
    causal_conv3d,
)


def _t(x):
    return torch.tensor(np.asarray(x, np.float64))


def _torch_conv3d_weights(p):
    """JAX [kt, kh, kw, cin, cout] -> torch [cout, cin, kt, kh, kw]."""
    w = np.asarray(p["kernel"], np.float64).transpose(4, 3, 0, 1, 2)
    b = np.asarray(p["bias"], np.float64)
    return torch.tensor(w), torch.tensor(b)


def _torch_causal_conv3d(p, x_ncdhw: torch.Tensor, stride=(1, 1, 1)) -> torch.Tensor:
    """CogVideoXCausalConv3d: temporal pad = (kt-1) copies of frame 0 in
    front, spatial zero pad kh//2 / kw//2, then a plain Conv3d."""
    w, b = _torch_conv3d_weights(p)
    kt, kh, kw = w.shape[2:]
    if kt > 1:
        first = x_ncdhw[:, :, :1].repeat(1, 1, kt - 1, 1, 1)
        x_ncdhw = torch.cat([first, x_ncdhw], dim=2)
    x_ncdhw = F.pad(x_ncdhw, (kw // 2, kw // 2, kh // 2, kh // 2, 0, 0))
    return F.conv3d(x_ncdhw, w, b, stride=stride)


def _to_ncdhw(x_bfhwc: np.ndarray) -> torch.Tensor:
    return _t(x_bfhwc).permute(0, 4, 1, 2, 3)


def _from_ncdhw(y: torch.Tensor) -> np.ndarray:
    return np.asarray(y.permute(0, 2, 3, 4, 1))


@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 2, 2)])
@pytest.mark.parametrize("kt", [3, 1])
def test_causal_conv3d_torch_golden(rng, stride, kt):
    cin, cout = 6, 8
    key = jax.random.PRNGKey(0)
    from alg_tpu.models.cogvideox.vae import _init_conv3d

    p = _init_conv3d(key, kt, 3, 3, cin, cout, jnp.float32)
    x = rng.randn(2, 5, 8, 10, cin).astype(np.float32)

    out_jax = np.asarray(causal_conv3d(p, jnp.asarray(x), stride=stride))
    out_t = _from_ncdhw(_torch_causal_conv3d(p, _to_ncdhw(x), stride=stride))
    np.testing.assert_allclose(out_jax, out_t, atol=1e-5)


@pytest.mark.parametrize("f", [1, 2, 5, 8])
def test_temporal_pool2_torch_golden(rng, f):
    x = rng.randn(2, f, 4, 4, 3).astype(np.float32)
    out_jax = np.asarray(_temporal_pool2(jnp.asarray(x)))

    # torch reference: CogVideoXDownsample3D compress_time semantics —
    # odd frame count keeps frame 0, avg_pool1d(k=2,s=2) the rest
    xt = _to_ncdhw(x)  # [B, C, F, H, W]
    b, c, ff, h, w = xt.shape
    flat = xt.permute(0, 1, 3, 4, 2).reshape(b * c * h * w, 1, ff)
    if ff == 1:
        pooled = flat
    elif ff % 2 == 1:
        first, rest = flat[..., :1], flat[..., 1:]
        rest = F.avg_pool1d(rest, kernel_size=2, stride=2)
        pooled = torch.cat([first, rest], dim=-1)
    else:
        pooled = F.avg_pool1d(flat, kernel_size=2, stride=2)
    fo = pooled.shape[-1]
    out_t = pooled.reshape(b, c, h, w, fo).permute(0, 4, 2, 3, 1)
    np.testing.assert_allclose(out_jax, np.asarray(out_t), atol=1e-6)


@pytest.mark.parametrize("f", [1, 3, 5])
def test_temporal_upsample2_torch_golden(rng, f):
    x = rng.randn(2, f, 4, 4, 3).astype(np.float32)
    out_jax = np.asarray(_temporal_upsample2(jnp.asarray(x)))

    # torch reference: CogVideoXUpsample3D temporal branch — frame 0 kept,
    # remaining frames nearest-repeated 2x (F -> 2F-1)
    xt = _to_ncdhw(x)
    if f == 1:
        out_t = xt
    else:
        first, rest = xt[:, :, :1], xt[:, :, 1:]
        rest = torch.repeat_interleave(rest, 2, dim=2)  # nearest 2x over time
        out_t = torch.cat([first, rest], dim=2)
    np.testing.assert_allclose(out_jax, _from_ncdhw(out_t), atol=1e-6)


def _randomize(params, seed, scale=1.0):
    """Fresh random values per leaf (sequential draws — distinct leaves get
    distinct weights, so e.g. a conv_y/conv_b swap cannot hide)."""
    r = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    new = [jnp.asarray(scale * r.randn(*l.shape), l.dtype) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def _torch_group_norm(p, x_ncdhw, groups, eps):
    w = _t(p["scale"]) if "scale" in p else _t(p["weight"])
    b = _t(p["bias"])
    return F.group_norm(x_ncdhw, groups, w, b, eps)


def _torch_spatial_norm(p, f_ncdhw, zq_ncdhw, groups, eps):
    """CogVideoXSpatialNorm3D: zq interpolated to f's size (first frame
    handled separately when temporal sizes differ), then
    GN(f)·conv_y(zq) + conv_b(zq)."""
    if zq_ncdhw.shape[2] != f_ncdhw.shape[2]:
        f_first_size = (1, *f_ncdhw.shape[3:])
        f_rest_size = (f_ncdhw.shape[2] - 1, *f_ncdhw.shape[3:])
        z_first = F.interpolate(zq_ncdhw[:, :, :1], size=f_first_size, mode="nearest")
        z_rest = F.interpolate(zq_ncdhw[:, :, 1:], size=f_rest_size, mode="nearest")
        zq_ncdhw = torch.cat([z_first, z_rest], dim=2)
    else:
        zq_ncdhw = F.interpolate(zq_ncdhw, size=f_ncdhw.shape[2:], mode="nearest")
    norm_f = _torch_group_norm(p["norm"], f_ncdhw, groups, eps)
    return norm_f * _torch_causal_conv3d(p["conv_y"], zq_ncdhw) + _torch_causal_conv3d(
        p["conv_b"], zq_ncdhw
    )


@pytest.mark.parametrize("bf,ff", [(9, 3), (3, 3), (5, 2)])
def test_spatial_norm_torch_golden(rng, bf, ff):
    """MoVQ spatial norm incl. the temporal-mismatch nearest-resize path.

    bf=9,ff=3: the decode-realistic 4x temporal ratio (1 + 4*(ff-1));
    bf=5,ff=2: exact multiple via repeat (matches torch nearest here)."""
    f_ch, zq_ch, groups, eps = 8, 4, 4, 1e-6
    p = _init_spatial_norm(jax.random.PRNGKey(1), f_ch, zq_ch, jnp.float32)
    # non-trivial weights (init gives zero bias; randomize everything)
    p = _randomize(p, seed=3)
    f = rng.randn(2, bf, 8, 8, f_ch).astype(np.float32)
    zq = rng.randn(2, ff, 4, 4, zq_ch).astype(np.float32)

    out_jax = np.asarray(_spatial_norm(p, jnp.asarray(f), jnp.asarray(zq), groups, eps))
    out_t = _from_ncdhw(_torch_spatial_norm(p, _to_ncdhw(f), _to_ncdhw(zq), groups, eps))
    np.testing.assert_allclose(out_jax, out_t, atol=1e-4)


def _torch_resnet(p, x_ncdhw, groups, eps, zq_ncdhw=None):
    def norm(np_, h):
        if zq_ncdhw is None:
            return _torch_group_norm(np_, h, groups, eps)
        return _torch_spatial_norm(np_, h, zq_ncdhw, groups, eps)

    h = F.silu(norm(p["norm1"], x_ncdhw))
    h = _torch_causal_conv3d(p["conv1"], h)
    h = F.silu(norm(p["norm2"], h))
    h = _torch_causal_conv3d(p["conv2"], h)
    if "conv_shortcut" in p:
        x_ncdhw = _torch_causal_conv3d(p["conv_shortcut"], x_ncdhw)
    return x_ncdhw + h


@pytest.mark.parametrize("zq_mode", [False, True])
def test_resnet_block_torch_golden(rng, zq_mode):
    cin, cout, groups, eps = 8, 12, 4, 1e-6
    zq_ch = 4 if zq_mode else None
    p = _init_resnet(jax.random.PRNGKey(2), cin, cout, jnp.float32, spatial_norm_zq=zq_ch)
    p = _randomize(p, seed=5, scale=0.3)
    x = rng.randn(1, 5, 8, 8, cin).astype(np.float32)
    zq = rng.randn(1, 5, 4, 4, zq_ch).astype(np.float32) if zq_mode else None

    out_jax = np.asarray(
        _resnet(p, jnp.asarray(x), groups, eps, zq=jnp.asarray(zq) if zq_mode else None)
    )
    out_t = _from_ncdhw(
        _torch_resnet(p, _to_ncdhw(x), groups, eps, _to_ncdhw(zq) if zq_mode else None)
    )
    np.testing.assert_allclose(out_jax, out_t, atol=2e-4)


# ---------------------------------------------------------------------------
# full encoder / decoder composition (channel progression, downsample manual
# padding, causal temporal pool/upsample placement, MoVQ zq threading through
# every decoder resnet, final norms)
# ---------------------------------------------------------------------------


def _torch_conv2d_per_frame(p, x_ncdhw, stride=1, manual_pad=None):
    """2D conv applied per frame; weight [kh, kw, cin, cout] JAX-layout."""
    w = _t(p["kernel"]).permute(3, 2, 0, 1)
    b = _t(p["bias"])
    bsz, c, f, h, ww = x_ncdhw.shape
    xf = x_ncdhw.permute(0, 2, 1, 3, 4).reshape(bsz * f, c, h, ww)
    if manual_pad is not None:
        (pt, pb), (pl, pr) = manual_pad
        xf = F.pad(xf, (pl, pr, pt, pb))
        y = F.conv2d(xf, w, b, stride=stride)
    else:
        kh = w.shape[2]
        y = F.conv2d(F.pad(xf, (kh // 2,) * 4), w, b, stride=stride)
    return y.reshape(bsz, f, y.shape[1], y.shape[2], y.shape[3]).permute(0, 2, 1, 3, 4)


def _torch_temporal_pool2(x):
    b, c, f, h, w = x.shape
    if f == 1:
        return x
    flat = x.permute(0, 1, 3, 4, 2).reshape(b * c * h * w, 1, f)
    if f % 2 == 1:
        first, rest = flat[..., :1], flat[..., 1:]
        pooled = torch.cat([first, F.avg_pool1d(rest, 2, 2)], dim=-1)
    else:
        pooled = F.avg_pool1d(flat, 2, 2)
    fo = pooled.shape[-1]
    return pooled.reshape(b, c, h, w, fo).permute(0, 1, 4, 2, 3)


def _torch_temporal_upsample2(x):
    if x.shape[2] == 1:
        return x
    first, rest = x[:, :, :1], x[:, :, 1:]
    return torch.cat([first, torch.repeat_interleave(rest, 2, dim=2)], dim=2)


def torch_cog_vae_encode(params, cfg, x):
    """Vendored-torch CogVideoX VAE encoder on NCDHW input → (mean, logvar)
    chunks on dim 1. Module-level so the mini-pipeline goldens can reuse it."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    enc = params["encoder"]
    h = _torch_causal_conv3d(enc["conv_in"], x)
    for i, blk in enumerate(enc["down"]):
        for r in blk["resnets"]:
            h = _torch_resnet(r, h, g, eps)
        if "downsample" in blk:
            if i < cfg.temporal_compress_level:
                h = _torch_temporal_pool2(h)
            h = _torch_conv2d_per_frame(blk["downsample"]["conv"], h, stride=2,
                                        manual_pad=((0, 1), (0, 1)))
    for r in enc["mid"]:
        h = _torch_resnet(r, h, g, eps)
    h = F.silu(_torch_group_norm(enc["norm_out"], h, g, eps))
    h = _torch_causal_conv3d(enc["conv_out"], h)
    return h.chunk(2, dim=1)


def torch_cog_vae_decode(params, cfg, z):
    """Vendored-torch CogVideoX VAE decoder on NCDHW latents."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    dec = params["decoder"]
    zq = z
    h = _torch_causal_conv3d(dec["conv_in"], z)
    for r in dec["mid"]:
        h = _torch_resnet(r, h, g, eps, zq_ncdhw=zq)
    for i, blk in enumerate(dec["up"]):
        for r in blk["resnets"]:
            h = _torch_resnet(r, h, g, eps, zq_ncdhw=zq)
        if "upsample" in blk:
            if i < cfg.temporal_compress_level:
                h = _torch_temporal_upsample2(h)
            h = torch.repeat_interleave(torch.repeat_interleave(h, 2, dim=3), 2, dim=4)
            h = _torch_conv2d_per_frame(blk["upsample"]["conv"], h)
    h = F.silu(_torch_spatial_norm(dec["norm_out"], h, zq, g, eps))
    return _torch_causal_conv3d(dec["conv_out"], h)


def test_full_vae_encode_decode_torch_golden(rng):
    from alg_tpu.models.cogvideox.vae import (
        CogVideoXVAEConfig,
        cogvideox_vae_decode,
        cogvideox_vae_encode,
        init_cogvideox_vae,
    )

    cfg = CogVideoXVAEConfig(
        block_out_channels=(8, 8, 16, 16), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    )
    params = init_cogvideox_vae(jax.random.PRNGKey(4), cfg)
    params = _randomize(params, seed=21, scale=0.25)

    def t_encode(x):
        return torch_cog_vae_encode(params, cfg, x)

    def t_decode(z):
        return torch_cog_vae_decode(params, cfg, z)

    x = rng.randn(1, 5, 32, 32, 3).astype(np.float32)
    mean_j, logvar_j = cogvideox_vae_encode(params, cfg, jnp.asarray(x))
    mean_t, logvar_t = t_encode(_to_ncdhw(x))
    np.testing.assert_allclose(np.asarray(mean_j), _from_ncdhw(mean_t), atol=5e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), _from_ncdhw(logvar_t), atol=5e-4)

    z = np.asarray(mean_j)  # [B, F', h, w, zc]
    rec_j = cogvideox_vae_decode(params, cfg, jnp.asarray(z))
    rec_t = t_decode(_to_ncdhw(z))
    np.testing.assert_allclose(np.asarray(rec_j), _from_ncdhw(rec_t), atol=2e-3)
