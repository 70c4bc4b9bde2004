"""Wan 2.1 DiT — JAX/Pallas implementation.

Parity target: diffusers ``WanTransformer3DModel`` as driven by the reference
(``pipeline_wan_image2video_lowpass.py:26,910-917``): 36-channel input
(16 noisy latent + 4 mask + 16 conditioning latent, channel-concat), dual
cross-attention to UMT5 text and CLIP-vision image embeddings, per-block
``scale_shift_table`` AdaLN driven by a global 6-way time modulation.

Defaults = Wan2.1-I2V-14B-480P: dim 5120 (40 heads × 128), 40 layers,
ffn 13824, patch (1, 2, 2), freq_dim 256, image_dim 1280 (CLIP penultimate).

Block structure (per diffusers WanTransformerBlock):
  mod = scale_shift_table[block] + time_proj(silu(temb))    # [B, 6, dim]
  x += gate · selfattn( LN₀(x)·(1+scale)+shift ), RoPE(3D), RMS-q/k
  x += crossattn( LN(x) → text-kv ) + crossattn-img( add_k/v(img) )
  x += c_gate · ffn( LN₀(x)·(1+c_scale)+c_shift )
LayerNorms compute in fp32 (FP32LayerNorm). Blocks are weight-stacked and
scanned; attention runs through the Pallas flash kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L
from alg_tpu.models import rope as R
from alg_tpu.ops import attention


@dataclasses.dataclass(frozen=True)
class WanTransformerConfig:
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 36
    out_channels: int = 16
    num_layers: int = 40
    ffn_dim: int = 13824
    freq_dim: int = 256
    text_dim: int = 4096
    image_dim: Optional[int] = 1280  # None → T2V (no image cross-attention)
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_max_seq_len: int = 1024

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def init_wan_transformer(key, cfg: WanTransformerConfig, dtype=jnp.float32):
    dim = cfg.inner_dim
    keys = iter(jax.random.split(key, 16 + 16 * cfg.num_layers))
    pt, ph, pw = cfg.patch_size

    def lin(i, o, bias=True):
        return L.init_linear(next(keys), i, o, bias=bias, dtype=dtype)

    params = {
        "patch_embedding": lin(cfg.in_channels * pt * ph * pw, dim),
        "condition_embedder": {
            "time_embedder": {"linear_1": lin(cfg.freq_dim, dim), "linear_2": lin(dim, dim)},
            "time_proj": lin(dim, 6 * dim),
            "text_embedder": {"linear_1": lin(cfg.text_dim, dim), "linear_2": lin(dim, dim)},
        },
        "norm_out": {},  # affine=False
        "scale_shift_table": (jax.random.normal(next(keys), (2, dim), jnp.float32) / dim**0.5).astype(dtype),
        "proj_out": lin(dim, pt * ph * pw * cfg.out_channels),
    }
    if cfg.image_dim is not None:
        params["condition_embedder"]["image_embedder"] = {
            "norm1": L.init_layer_norm(cfg.image_dim, dtype=dtype),
            "ff_in": lin(cfg.image_dim, cfg.image_dim),
            "ff_out": lin(cfg.image_dim, dim),
            "norm2": L.init_layer_norm(dim, dtype=dtype),
        }

    def block():
        b = {
            "scale_shift_table": (jax.random.normal(next(keys), (6, dim), jnp.float32) / dim**0.5).astype(dtype),
            "attn1": {
                "to_q": lin(dim, dim),
                "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "to_out": lin(dim, dim),
                "norm_q": L.init_rms_norm(dim, dtype=dtype),
                "norm_k": L.init_rms_norm(dim, dtype=dtype),
            },
            "attn2": {
                "to_q": lin(dim, dim),
                "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "to_out": lin(dim, dim),
                "norm_q": L.init_rms_norm(dim, dtype=dtype),
                "norm_k": L.init_rms_norm(dim, dtype=dtype),
            },
            "norm2": L.init_layer_norm(dim, dtype=dtype),  # cross_attn_norm=True → affine
            "ffn": L.init_mlp(next(keys), dim, cfg.ffn_dim, dtype=dtype),
        }
        if cfg.image_dim is not None:
            b["attn2"]["add_k_proj"] = lin(dim, dim)
            b["attn2"]["add_v_proj"] = lin(dim, dim)
            b["attn2"]["norm_added_k"] = L.init_rms_norm(dim, dtype=dtype)
        return b

    blocks = [block() for _ in range(cfg.num_layers)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


def wan_rope(cfg: WanTransformerConfig, num_latent_frames: int, latent_height: int, latent_width: int):
    """(cos, sin) ``[S_video, head_dim]`` — axis split t/h/w of sizes
    (d−2·2⌊d/6⌋, 2⌊d/6⌋, 2⌊d/6⌋), interleaved-pair convention (the complex
    view in diffusers ``WanRotaryPosEmbed`` pairs adjacent features)."""
    d = cfg.attention_head_dim
    pt, ph, pw = cfg.patch_size
    f = num_latent_frames // pt
    hh = latent_height // ph
    ww = latent_width // pw
    h_dim = w_dim = 2 * (d // 6)
    t_dim = d - h_dim - w_dim

    ang_t = R.rope_frequencies(t_dim, np.arange(f), cfg.rope_theta)
    ang_h = R.rope_frequencies(h_dim, np.arange(hh), cfg.rope_theta)
    ang_w = R.rope_frequencies(w_dim, np.arange(ww), cfg.rope_theta)
    at = np.broadcast_to(ang_t[:, None, None, :], (f, hh, ww, ang_t.shape[-1]))
    ah = np.broadcast_to(ang_h[None, :, None, :], (f, hh, ww, ang_h.shape[-1]))
    aw = np.broadcast_to(ang_w[None, None, :, :], (f, hh, ww, ang_w.shape[-1]))
    angles = np.concatenate([at, ah, aw], axis=-1).reshape(f * hh * ww, d // 2)
    return R.cos_sin_interleaved(angles)


def _attn(p, cfg, q_in, kv_in, rope_cos=None, rope_sin=None, extra_kv=None):
    """Attention helper: RMS-normed q/k over the full inner dim, optional RoPE,
    optional added image-kv stream summed into the output (I2V cross-attn)."""
    b, sq, dim = q_in.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim

    def heads(x):
        return x.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

    q = L.rms_norm(p["norm_q"], L.linear(p["to_q"], q_in), cfg.eps)
    k = L.rms_norm(p["norm_k"], L.linear(p["to_k"], kv_in), cfg.eps)
    v = L.linear(p["to_v"], kv_in)
    qh, kh, vh = heads(q), heads(k), heads(v)
    if rope_cos is not None:
        # fused single-pass rope on TPU (ops/qk_prep.rope_interleaved); the
        # norm stays XLA — Wan's RMS norm runs over the full inner dim, so it
        # can't fuse per-head
        from alg_tpu.ops.qk_prep import rope_interleaved

        qh = rope_interleaved(qh, rope_cos, rope_sin)
        kh = rope_interleaved(kh, rope_cos, rope_sin)
    out = attention(qh, kh, vh, stable=False)

    if extra_kv is not None:
        k_img = L.rms_norm(p["norm_added_k"], L.linear(p["add_k_proj"], extra_kv), cfg.eps)
        v_img = L.linear(p["add_v_proj"], extra_kv)
        out = out + attention(qh, heads(k_img), heads(v_img), stable=False)

    out = out.transpose(0, 2, 1, 3).reshape(b, sq, dim)
    return L.linear(p["to_out"], out)


def wan_transformer(
    params,
    cfg: WanTransformerConfig,
    hidden_states: jnp.ndarray,  # [B, C=36, F, h, w]  (reference layout)
    timestep: jnp.ndarray,  # [B] float
    encoder_hidden_states: jnp.ndarray,  # [B, 512, text_dim]
    encoder_hidden_states_image: Optional[jnp.ndarray] = None,  # [B, 257, image_dim]
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns the velocity prediction ``[B, out_channels, F, h, w]``."""
    b, c, f, h, w = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    dim = cfg.inner_dim
    ce = params["condition_embedder"]

    # patchify: conv3d stride=patch == linear over flattened patches
    x = hidden_states.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # [B, F', H', W', C, pt, ph, pw]
    seq = (f // pt) * (h // ph) * (w // pw)
    x = x.reshape(b, seq, c * pt * ph * pw)
    x = L.linear(params["patch_embedding"], x)

    # time embedding → temb [B, dim] and 6-way block modulation [B, 6, dim]
    t_freq = L.sinusoidal_timestep_embedding(timestep, cfg.freq_dim, flip_sin_to_cos=True)
    temb = L.timestep_embedding_mlp(ce["time_embedder"], t_freq.astype(x.dtype))
    temb6 = L.linear(ce["time_proj"], L.silu(temb)).reshape(b, 6, dim)

    # text projection (gelu-tanh MLP)
    text = L.linear(
        ce["text_embedder"]["linear_2"],
        L.gelu_tanh(L.linear(ce["text_embedder"]["linear_1"], encoder_hidden_states.astype(x.dtype))),
    )

    img = None
    if encoder_hidden_states_image is not None and cfg.image_dim is not None:
        ie = ce["image_embedder"]
        himg = L.layer_norm(ie["norm1"], encoder_hidden_states_image.astype(x.dtype), 1e-5)
        himg = L.linear(ie["ff_out"], jax.nn.gelu(L.linear(ie["ff_in"], himg), approximate=False))
        img = L.layer_norm(ie["norm2"], himg, 1e-5)

    rc = None if rope_cos is None else jnp.asarray(rope_cos, jnp.float32)
    rs = None if rope_sin is None else jnp.asarray(rope_sin, jnp.float32)

    def block_fn(x, bp, ctx, consts):
        temb6_, text_, img_ = ctx
        rc_, rs_ = consts
        mod = bp["scale_shift_table"].astype(jnp.float32)[None] + temb6_.astype(jnp.float32)
        shift, scale, gate, c_shift, c_scale, c_gate = [m.astype(x.dtype) for m in jnp.split(mod, 6, axis=1)]

        xn = L.layer_norm({}, x, cfg.eps) * (1 + scale) + shift
        x = x + gate * _attn(bp["attn1"], cfg, xn, xn, rc_, rs_)

        xn = L.layer_norm(bp["norm2"], x, cfg.eps)
        x = x + _attn(bp["attn2"], cfg, xn, text_, extra_kv=img_)

        xn = L.layer_norm({}, x, cfg.eps) * (1 + c_scale) + c_shift
        x = x + c_gate * L.mlp(bp["ffn"], xn, act=L.gelu_tanh)
        return x

    from alg_tpu.sharding.pipeline import run_blocks

    x = run_blocks(block_fn, x, params["blocks"], ctx=(temb6, text, img), consts=(rc, rs))

    # output head: shift/scale from temb (not silu'd) + table
    head = params["scale_shift_table"].astype(jnp.float32)[None] + temb.astype(jnp.float32)[:, None]
    shift, scale = [m.astype(x.dtype) for m in jnp.split(head, 2, axis=1)]
    x = L.layer_norm({}, x, cfg.eps) * (1 + scale) + shift
    x = L.linear(params["proj_out"], x)  # [B, S, pt·ph·pw·out]

    oc = cfg.out_channels
    x = x.reshape(b, f // pt, h // ph, w // pw, pt, ph, pw, oc)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # [B, C, F', pt, H', ph, W', pw]
    return x.reshape(b, oc, f, h, w)
