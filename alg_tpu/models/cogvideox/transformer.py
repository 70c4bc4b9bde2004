"""CogVideoX DiT — JAX/Pallas implementation.

Architecture parity target: diffusers ``CogVideoXTransformer3DModel`` as used
by the reference pipeline (``pipeline_cogvideox_image2video_lowpass.py:29,
998,1082-1090``; RoPE prep ``:542-584``). Defaults = CogVideoX-5b-I2V.

Structure: 2D patchify per frame + T5-text projection → joint [text; video]
token stream → ``num_layers`` identical blocks, each: AdaLN-zero dual-stream
norm (6-way modulation from the time embedding), joint self-attention with
per-head LayerNorm on q/k and 3D RoPE on the video tokens only, AdaLN-zero
norm2, shared FFN over the concatenated stream → final LN → AdaLN → linear
head → unpatchify.

TPU-native choices: blocks are weight-stacked and executed with
``jax.lax.scan`` (one compiled block body, fast compile at 42 layers; stacked
leaves shard naturally under pjit), attention runs through the Pallas flash
kernel, RoPE cos/sin tables are precomputed host-side.
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
class CogVideoXTransformerConfig:
    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 32  # 16 noisy latent + 16 image-cond channels
    out_channels: int = 16
    time_embed_dim: int = 512
    ofs_embed_dim: Optional[int] = None  # set (512) for CogVideoX-1.5-I2V
    text_embed_dim: int = 4096
    num_layers: int = 42
    attention_bias: bool = True
    sample_width: int = 90
    sample_height: int = 60
    patch_size: int = 2
    patch_size_t: Optional[int] = None  # 2 for CogVideoX-1.5
    max_text_seq_length: int = 226
    norm_eps: float = 1e-5
    qk_norm_eps: float = 1e-6
    use_rotary_positional_embeddings: bool = True
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_block(key, cfg: CogVideoXTransformerConfig, dtype):
    dim = cfg.inner_dim
    ks = jax.random.split(key, 12)
    attn = {
        "to_q": L.init_linear(ks[0], dim, dim, bias=cfg.attention_bias, dtype=dtype),
        "to_k": L.init_linear(ks[1], dim, dim, bias=cfg.attention_bias, dtype=dtype),
        "to_v": L.init_linear(ks[2], dim, dim, bias=cfg.attention_bias, dtype=dtype),
        "to_out": L.init_linear(ks[3], dim, dim, bias=True, dtype=dtype),
        "norm_q": L.init_layer_norm(cfg.attention_head_dim, dtype=dtype),
        "norm_k": L.init_layer_norm(cfg.attention_head_dim, dtype=dtype),
    }
    return {
        "norm1": {
            "linear": L.init_linear(ks[4], cfg.time_embed_dim, 6 * dim, dtype=dtype),
            "norm": L.init_layer_norm(dim, dtype=dtype),
        },
        "attn": attn,
        "norm2": {
            "linear": L.init_linear(ks[5], cfg.time_embed_dim, 6 * dim, dtype=dtype),
            "norm": L.init_layer_norm(dim, dtype=dtype),
        },
        "ff": L.init_mlp(ks[6], dim, 4 * dim, dtype=dtype),
    }


def init_cogvideox_transformer(key, cfg: CogVideoXTransformerConfig, dtype=jnp.float32):
    dim = cfg.inner_dim
    keys = jax.random.split(key, 8 + cfg.num_layers)
    p = cfg.patch_size
    pt = cfg.patch_size_t or 1
    patch_in = cfg.in_channels * p * p * pt
    params = {
        "patch_embed": {
            # conv2d expressed as a linear over flattened patches
            "proj": L.init_linear(keys[0], patch_in, dim, dtype=dtype),
            "text_proj": L.init_linear(keys[1], cfg.text_embed_dim, dim, dtype=dtype),
        },
        "time_embedding": L.init_timestep_embedding(keys[2], dim, cfg.time_embed_dim, dtype=dtype),
        "norm_final": L.init_layer_norm(dim, dtype=dtype),
        "norm_out": {
            "linear": L.init_linear(keys[3], cfg.time_embed_dim, 2 * dim, dtype=dtype),
            "norm": L.init_layer_norm(dim, dtype=dtype),
        },
        "proj_out": L.init_linear(
            keys[4], dim, pt * p * p * cfg.out_channels, dtype=dtype
        ),
    }
    if cfg.ofs_embed_dim is not None:
        params["ofs_embedding"] = L.init_timestep_embedding(
            keys[5], cfg.ofs_embed_dim, cfg.ofs_embed_dim, dtype=dtype
        )
    blocks = [_init_block(keys[8 + i], cfg, dtype) for i in range(cfg.num_layers)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


# ---------------------------------------------------------------------------
# RoPE (reference `_prepare_rotary_positional_embeddings`,
# diffusers get_3d_rotary_pos_embed, grid_type="crop")
# ---------------------------------------------------------------------------


def _resize_crop_region_for_grid(grid_h: int, grid_w: int, base_h: int, base_w: int):
    """Centered crop of the base grid with the sample's aspect ratio
    (diffusers ``get_resize_crop_region_for_grid``)."""
    th, tw = base_h, base_w
    h, w = grid_h, grid_w
    r = h / w
    if r > th / tw:
        resize_h = th
        resize_w = int(round(th / h * w))
    else:
        resize_w = tw
        resize_h = int(round(tw / w * h))
    crop_top = int(round((th - resize_h) / 2.0))
    crop_left = int(round((tw - resize_w) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_h, crop_left + resize_w)


def cogvideox_rope(
    cfg: CogVideoXTransformerConfig,
    height: int,
    width: int,
    num_latent_frames: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) ``[S_video, head_dim]`` fp32 tables for the video tokens.

    Axis split: dim_t = d/4, dim_h = dim_w = 3d/8; angles repeated pairwise
    (interleaved convention). Spatial positions follow the reference's
    ``_prepare_rotary_positional_embeddings``: CogVideoX-1.0 uses the centered
    crop of the (sample_height/p, sample_width/p) base grid ("crop"
    grid_type); CogVideoX-1.5 (``patch_size_t`` set) slices the leading
    positions of the max grid ("slice").
    """
    d = cfg.attention_head_dim
    p = cfg.patch_size
    grid_h, grid_w = height // (8 * p), width // (8 * p)
    base_h, base_w = cfg.sample_height // p, cfg.sample_width // p

    dim_t = d // 4
    dim_h = d // 8 * 3
    dim_w = d // 8 * 3

    # temporal grid is over *temporal patches*: ceil(F / patch_size_t)
    # (diffusers base_num_frames; pt=1 for CogVideoX-1.0)
    pt = cfg.patch_size_t or 1
    f = (num_latent_frames + pt - 1) // pt
    t_pos = np.arange(f, dtype=np.float64)
    if cfg.patch_size_t is None:
        # 1.0: "crop" — positions from the centered crop region
        (top, left), (bottom, right) = _resize_crop_region_for_grid(
            grid_h, grid_w, base_h, base_w
        )
        h_pos = np.linspace(top, bottom, grid_h, endpoint=False, dtype=np.float64)
        w_pos = np.linspace(left, right, grid_w, endpoint=False, dtype=np.float64)
    else:
        # 1.5: "slice" — the first grid_h/grid_w rows/cols of the max grid
        h_pos = np.arange(grid_h, dtype=np.float64)
        w_pos = np.arange(grid_w, dtype=np.float64)

    ang_t = R.rope_frequencies(dim_t, t_pos, cfg.rope_theta)  # [F, dim_t/2]
    ang_h = R.rope_frequencies(dim_h, h_pos, cfg.rope_theta)
    ang_w = R.rope_frequencies(dim_w, w_pos, cfg.rope_theta)

    hh, ww = grid_h, grid_w
    at = np.broadcast_to(ang_t[:, None, None, :], (f, hh, ww, ang_t.shape[-1]))
    ah = np.broadcast_to(ang_h[None, :, None, :], (f, hh, ww, ang_h.shape[-1]))
    aw = np.broadcast_to(ang_w[None, None, :, :], (f, hh, ww, ang_w.shape[-1]))
    angles = np.concatenate([at, ah, aw], axis=-1).reshape(f * hh * ww, d // 2)
    return R.cos_sin_interleaved(angles)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _ada_norm_zero(p, x: jnp.ndarray, emb: jnp.ndarray, eps: float):
    """CogVideoXLayerNormZero for one stream: returns (normed, gate)."""
    mod = L.linear(p["linear"], L.silu(emb))  # [B, 6*dim]
    return mod


def _block(
    cfg: CogVideoXTransformerConfig,
    bp,
    hidden: jnp.ndarray,
    encoder: jnp.ndarray,
    temb: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
):
    dim = cfg.inner_dim
    text_len = encoder.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim

    def modulate(normp, h, e):
        mod = L.linear(normp["linear"], L.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
        hn = L.layer_norm(normp["norm"], h, cfg.norm_eps) * (1 + scale[:, None]) + shift[:, None]
        en = L.layer_norm(normp["norm"], e, cfg.norm_eps) * (1 + e_scale[:, None]) + e_shift[:, None]
        return hn, en, gate[:, None], e_gate[:, None]

    # --- joint attention with AdaLN-zero
    hn, en, gate, e_gate = modulate(bp["norm1"], hidden, encoder)
    joint = jnp.concatenate([en, hn], axis=1)
    b, s, _ = joint.shape

    def heads(x):
        return x.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    q = heads(L.linear(bp["attn"]["to_q"], joint))
    k = heads(L.linear(bp["attn"]["to_k"], joint))
    v = heads(L.linear(bp["attn"]["to_v"], joint))
    if rope_cos is not None:
        # rope tables arrive pre-padded with identity rows (cos=1, sin=0) over
        # the text prefix, so RoPE applies to the whole joint stream
        # elementwise — no scatter (slice-assign miscompiles under batch
        # sharding with GSPMD, and elementwise fuses better anyway).
        # norm+rope run as ONE fused Pallas pass on bf16/TPU (ops/qk_prep);
        # fp32, CPU, and mesh-sharded calls keep the identical XLA composition
        from alg_tpu.ops.qk_prep import qk_norm_rope

        q = qk_norm_rope(q, bp["attn"]["norm_q"], rope_cos, rope_sin, cfg.qk_norm_eps)
        k = qk_norm_rope(k, bp["attn"]["norm_k"], rope_cos, rope_sin, cfg.qk_norm_eps)
    else:
        q = L.layer_norm(bp["attn"]["norm_q"], q, cfg.qk_norm_eps)
        k = L.layer_norm(bp["attn"]["norm_k"], k, cfg.qk_norm_eps)
    o = attention(q, k, v, stable=False)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, dim)
    o = L.linear(bp["attn"]["to_out"], o)
    encoder = encoder + e_gate * o[:, :text_len]
    hidden = hidden + gate * o[:, text_len:]

    # --- shared FFN with AdaLN-zero
    hn, en, gate_ff, e_gate_ff = modulate(bp["norm2"], hidden, encoder)
    ff_out = L.mlp(bp["ff"], jnp.concatenate([en, hn], axis=1), act=L.gelu_tanh)
    encoder = encoder + e_gate_ff * ff_out[:, :text_len]
    hidden = hidden + gate_ff * ff_out[:, text_len:]
    return hidden, encoder


def cogvideox_transformer(
    params,
    cfg: CogVideoXTransformerConfig,
    hidden_states: jnp.ndarray,  # [B, F, C, H, W] (latents ⧺ image cond, channel dim)
    encoder_hidden_states: jnp.ndarray,  # [B, S_text, text_embed_dim]
    timestep: jnp.ndarray,  # [B]
    rope_cos: Optional[jnp.ndarray] = None,  # [S_video, head_dim]
    rope_sin: Optional[jnp.ndarray] = None,
    ofs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns the denoiser output ``[B, F, out_channels, H, W]``."""
    b, f, c, h, w = hidden_states.shape
    p = cfg.patch_size
    pt = cfg.patch_size_t or 1
    dim = cfg.inner_dim

    # time (+ofs) embedding
    t_emb = L.sinusoidal_timestep_embedding(timestep, dim, flip_sin_to_cos=True)
    temb = L.timestep_embedding_mlp(params["time_embedding"], t_emb.astype(hidden_states.dtype))
    if cfg.ofs_embed_dim is not None and ofs is not None:
        ofs_emb = L.sinusoidal_timestep_embedding(ofs, cfg.ofs_embed_dim, flip_sin_to_cos=True)
        temb = temb + L.timestep_embedding_mlp(
            params["ofs_embedding"], ofs_emb.astype(hidden_states.dtype)
        )

    # patchify: [B, F, C, H, W] → [B, (F/pt)·(H/p)·(W/p), ...] → linear.
    # Flatten minor order follows diffusers so plain-transposed checkpoint
    # weights line up: 1.0 (pt=None) is conv2d semantics (C, ph, pw); 1.5
    # (pt set) is the CogVideoXPatchEmbed linear layout (pt, ph, pw, C).
    if cfg.patch_size_t is None:
        x = hidden_states.reshape(b, f, c, h // p, p, w // p, p)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [B, F, H', W', C, p, p]
        x = x.reshape(b, f * (h // p) * (w // p), c * p * p)
    else:
        x = hidden_states.transpose(0, 1, 3, 4, 2)  # [B, F, H, W, C]
        x = x.reshape(b, f // pt, pt, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B, F', H', W', pt, p, p, C]
        x = x.reshape(b, (f // pt) * (h // p) * (w // p), pt * p * p * c)
    video = L.linear(params["patch_embed"]["proj"], x)
    text = L.linear(params["patch_embed"]["text_proj"], encoder_hidden_states.astype(video.dtype))

    # scan over weight-stacked blocks; rope tables padded with identity rows
    # for the text prefix (see _block)
    if rope_cos is not None:
        text_len = text.shape[1]
        d = cfg.attention_head_dim
        rc = jnp.concatenate(
            [jnp.ones((text_len, d), jnp.float32), jnp.asarray(rope_cos, jnp.float32)], axis=0
        )
        rs = jnp.concatenate(
            [jnp.zeros((text_len, d), jnp.float32), jnp.asarray(rope_sin, jnp.float32)], axis=0
        )
    else:
        rc = rs = None

    def body(carry, bp, ctx, consts):
        hdn, enc = carry
        (temb_,) = ctx
        rc_, rs_ = consts
        hdn, enc = _block(cfg, bp, hdn, enc, temb_, rc_, rs_)
        return hdn, enc

    from alg_tpu.sharding.pipeline import run_blocks

    video, text = run_blocks(
        body, (video, text), params["blocks"], ctx=(temb,), consts=(rc, rs)
    )

    # final norm over the joint stream, then slice the video part
    joint = jnp.concatenate([text, video], axis=1)
    joint = L.layer_norm(params["norm_final"], joint, cfg.norm_eps)
    video = joint[:, text.shape[1] :]

    # AdaLayerNorm head: silu(temb) → (shift, scale), norm·(1+scale)+shift
    mod = L.linear(params["norm_out"]["linear"], L.silu(temb))
    shift, scale = jnp.split(mod, 2, axis=-1)
    video = L.layer_norm(params["norm_out"]["norm"], video, cfg.norm_eps)
    video = video * (1 + scale[:, None]) + shift[:, None]
    out = L.linear(params["proj_out"], video)  # [B, S, pt·p·p·out_c]

    # unpatchify (diffusers output reshape: proj_out minor order is
    # (C, ph, pw) for 1.0 and (C, pt, ph, pw) for 1.5)
    oc = cfg.out_channels
    if cfg.patch_size_t is None:
        out = out.reshape(b, f, h // p, w // p, oc, p, p)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6)  # [B, F, C, H', p, W', p]
        return out.reshape(b, f, oc, h, w)
    out = out.reshape(b, f // pt, h // p, w // p, oc, pt, p, p)
    out = out.transpose(0, 1, 5, 4, 2, 6, 3, 7)  # [B, F', pt, C, H', p, W', p]
    return out.reshape(b, f, oc, h, w)
