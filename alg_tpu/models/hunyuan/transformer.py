"""HunyuanVideo DiT — JAX/Pallas implementation.

Parity target: diffusers ``HunyuanVideoTransformer3DModel`` (token_replace
I2V variant) as driven by the reference
(``pipeline_hunyuan_video_image2video_lowpass.py:31,1243-1252``):

  * dual-stream ("double") MMDiT blocks — separate video/text streams with
    AdaLN-zero modulation, joint attention (video tokens first, text after,
    padded text masked via ``kv_len``), RMS-normed q/k, 3D RoPE on video
    tokens only — followed by single-stream blocks over the concatenated
    sequence with parallel attention+MLP and a fused output projection;
  * llama text embeds pass through a 2-block token refiner conditioned on
    (timestep, masked-mean pooled text);
  * conditioning embedding = timestep + CLIP-pooled text projection +
    *distilled guidance* embedding (``guidance_scale·1000``,
    ``:1115-1119``) — there is no CFG batching unless ``true_cfg_scale>1``;
  * token_replace: the first latent frame holds the clean image latent, so
    its tokens are modulated with the t=0 embedding while the rest use the
    current timestep (``:1266-1270`` re-pins frame 0 after each step).

Defaults = HunyuanVideo-I2V 13B: dim 3072 (24 heads × 128), 20 double + 40
single blocks, rope axes (16, 56, 56) @ theta 256.
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
class HunyuanVideoTransformerConfig:
    in_channels: int = 16
    out_channels: int = 16
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    num_layers: int = 20  # double-stream blocks
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 2
    patch_size_t: int = 1
    text_embed_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    rope_theta: float = 256.0
    rope_axes_dim: Tuple[int, int, int] = (16, 56, 56)
    image_condition_type: str = "token_replace"  # or None (T2V)

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_hunyuan_transformer(key, cfg: HunyuanVideoTransformerConfig, dtype=jnp.float32):
    dim = cfg.inner_dim
    mlp = int(dim * cfg.mlp_ratio)
    keys = iter(jax.random.split(key, 64 + 24 * (cfg.num_layers + cfg.num_single_layers + cfg.num_refiner_layers)))

    def lin(i, o, bias=True):
        return L.init_linear(next(keys), i, o, bias=bias, dtype=dtype)

    p_in = cfg.in_channels * cfg.patch_size_t * cfg.patch_size**2
    params = {
        "x_embedder": lin(p_in, dim),
        "context_embedder": {
            "input_embedder": lin(cfg.text_embed_dim, dim),
            "t_embedder": {"linear_1": lin(256, dim), "linear_2": lin(dim, dim)},
            "c_embedder": {"linear_1": lin(cfg.text_embed_dim, dim), "linear_2": lin(dim, dim)},
            "blocks": [
                {
                    "norm1": L.init_layer_norm(dim, dtype=dtype),
                    "attn": {
                        "to_q": lin(dim, dim),
                        "to_k": lin(dim, dim),
                        "to_v": lin(dim, dim),
                        "to_out": lin(dim, dim),
                    },
                    "norm2": L.init_layer_norm(dim, dtype=dtype),
                    "ff": L.init_mlp(next(keys), dim, mlp, dtype=dtype),
                    "ada": lin(dim, 2 * dim),
                }
                for _ in range(cfg.num_refiner_layers)
            ],
        },
        "time_text_embed": {
            "timestep_embedder": {"linear_1": lin(256, dim), "linear_2": lin(dim, dim)},
            "text_embedder": {"linear_1": lin(cfg.pooled_projection_dim, dim), "linear_2": lin(dim, dim)},
        },
        "norm_out": {"linear": lin(dim, 2 * dim)},  # AdaLayerNormContinuous (no affine LN)
        "proj_out": lin(dim, cfg.patch_size_t * cfg.patch_size**2 * cfg.out_channels),
    }
    if cfg.guidance_embeds:
        params["time_text_embed"]["guidance_embedder"] = {
            "linear_1": lin(256, dim),
            "linear_2": lin(dim, dim),
        }

    def double_block():
        return {
            "norm1_linear": lin(dim, 6 * dim),
            "norm1_context_linear": lin(dim, 6 * dim),
            "attn": {
                "to_q": lin(dim, dim),
                "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "to_out": lin(dim, dim),
                "add_q_proj": lin(dim, dim),
                "add_k_proj": lin(dim, dim),
                "add_v_proj": lin(dim, dim),
                "to_add_out": lin(dim, dim),
                "norm_q": L.init_rms_norm(cfg.attention_head_dim, dtype=dtype),
                "norm_k": L.init_rms_norm(cfg.attention_head_dim, dtype=dtype),
                "norm_added_q": L.init_rms_norm(cfg.attention_head_dim, dtype=dtype),
                "norm_added_k": L.init_rms_norm(cfg.attention_head_dim, dtype=dtype),
            },
            "ff": L.init_mlp(next(keys), dim, mlp, dtype=dtype),
            "ff_context": L.init_mlp(next(keys), dim, mlp, dtype=dtype),
        }

    def single_block():
        return {
            "norm_linear": lin(dim, 3 * dim),
            "attn": {
                "to_q": lin(dim, dim),
                "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "norm_q": L.init_rms_norm(cfg.attention_head_dim, dtype=dtype),
                "norm_k": L.init_rms_norm(cfg.attention_head_dim, dtype=dtype),
            },
            "proj_mlp": lin(dim, mlp),
            "proj_out": lin(dim + mlp, dim),
        }

    blocks = [double_block() for _ in range(cfg.num_layers)]
    params["transformer_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    sblocks = [single_block() for _ in range(cfg.num_single_layers)]
    params["single_transformer_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *sblocks)
    return params


def hunyuan_rope(cfg: HunyuanVideoTransformerConfig, num_latent_frames: int, latent_height: int, latent_width: int):
    """(cos, sin) ``[S_video, head_dim]`` — axes (t, h, w) dims (16, 56, 56)
    @ theta 256, interleaved-pair convention."""
    dt, dh, dw = cfg.rope_axes_dim
    f = num_latent_frames // cfg.patch_size_t
    hh = latent_height // cfg.patch_size
    ww = latent_width // cfg.patch_size
    ang_t = R.rope_frequencies(dt, np.arange(f), cfg.rope_theta)
    ang_h = R.rope_frequencies(dh, np.arange(hh), cfg.rope_theta)
    ang_w = R.rope_frequencies(dw, np.arange(ww), cfg.rope_theta)
    at = np.broadcast_to(ang_t[:, None, None, :], (f, hh, ww, ang_t.shape[-1]))
    ah = np.broadcast_to(ang_h[None, :, None, :], (f, hh, ww, ang_h.shape[-1]))
    aw = np.broadcast_to(ang_w[None, None, :, :], (f, hh, ww, ang_w.shape[-1]))
    angles = np.concatenate([at, ah, aw], axis=-1).reshape(f * hh * ww, -1)
    return R.cos_sin_interleaved(angles)


# ---------------------------------------------------------------------------
# forward helpers
# ---------------------------------------------------------------------------


def _mlp_embed(p, x):
    return L.linear(p["linear_2"], L.silu(L.linear(p["linear_1"], x)))


def _token_refiner(p, cfg, text_embeds, text_mask, timestep):
    """HunyuanVideoTokenRefiner: 2 self-attn blocks over the text with AdaLN
    gates from (timestep, masked-mean text)."""
    dim = cfg.inner_dim
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    t_freq = L.sinusoidal_timestep_embedding(timestep, 256, flip_sin_to_cos=True)
    temb = _mlp_embed(p["t_embedder"], t_freq.astype(text_embeds.dtype))
    if text_mask is None:
        pooled = text_embeds.mean(axis=1)
    else:
        m = text_mask.astype(text_embeds.dtype)[..., None]
        pooled = (text_embeds * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    temb = temb + _mlp_embed(p["c_embedder"], pooled)

    x = L.linear(p["input_embedder"], text_embeds)
    kv_len = None if text_mask is None else text_mask.sum(axis=1).astype(jnp.int32)
    b, s, _ = x.shape

    def heads(t):
        return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    for blk in p["blocks"]:
        gates = L.linear(blk["ada"], L.silu(temb))
        gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)
        xn = L.layer_norm(blk["norm1"], x, 1e-6)
        q = heads(L.linear(blk["attn"]["to_q"], xn))
        k = heads(L.linear(blk["attn"]["to_k"], xn))
        v = heads(L.linear(blk["attn"]["to_v"], xn))
        o = attention(q, k, v, kv_len=kv_len)
        o = L.linear(blk["attn"]["to_out"], o.transpose(0, 2, 1, 3).reshape(b, s, dim))
        x = x + o * gate_msa[:, None]
        xn = L.layer_norm(blk["norm2"], x, 1e-6)
        x = x + L.mlp(blk["ff"], xn, act=L.silu) * gate_mlp[:, None]
    return x


def _dual_modulate(mod6, mod6_tr, x, first_len, eps=1e-6):
    """token_replace AdaLN: first-frame tokens use the t=0 modulation."""
    def split6(m):
        return [c[:, None] for c in jnp.split(m, 6, axis=-1)]

    s, sc, g, s2, sc2, g2 = split6(mod6)
    if mod6_tr is None:
        xn = L.layer_norm({}, x, eps) * (1 + sc) + s
        return xn, g, sc2, s2, g2, None, None, None
    ts, tsc, tg, ts2, tsc2, tg2 = split6(mod6_tr)
    xn = L.layer_norm({}, x, eps)
    n = first_len
    xn = jnp.concatenate([xn[:, :n] * (1 + tsc) + ts, xn[:, n:] * (1 + sc) + s], axis=1)
    return xn, g, sc2, s2, g2, tg, (tsc2, ts2), tg2


def _gate_concat(x, delta, gate, gate_tr, first_len):
    if gate_tr is None:
        return x + delta * gate
    n = first_len
    return x + jnp.concatenate([delta[:, :n] * gate_tr, delta[:, n:] * gate], axis=1)


def hunyuan_transformer(
    params,
    cfg: HunyuanVideoTransformerConfig,
    hidden_states: jnp.ndarray,  # [B, C, F, h, w] (reference layout)
    timestep: jnp.ndarray,  # [B] float
    encoder_hidden_states: jnp.ndarray,  # [B, S_text, text_embed_dim] (llama)
    encoder_attention_mask: Optional[jnp.ndarray],  # [B, S_text]
    pooled_projections: jnp.ndarray,  # [B, 768] CLIP pooled
    guidance: Optional[jnp.ndarray] = None,  # [B] = guidance_scale*1000
    rope_cos: Optional[np.ndarray] = None,
    rope_sin: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    b, c, f, h, w = hidden_states.shape
    dim = cfg.inner_dim
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    p, pt = cfg.patch_size, cfg.patch_size_t
    token_replace = cfg.image_condition_type == "token_replace"

    # patchify [B,C,F,h,w] → [B, S, C·pt·p·p]
    x = hidden_states.reshape(b, c, f // pt, pt, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    seq_v = (f // pt) * (h // p) * (w // p)
    x = x.reshape(b, seq_v, c * pt * p * p)
    x = L.linear(params["x_embedder"], x)
    first_frame_len = (h // p) * (w // p)

    # conditioning embeddings
    tte = params["time_text_embed"]
    t_freq = L.sinusoidal_timestep_embedding(timestep, 256, flip_sin_to_cos=True)
    temb = _mlp_embed(tte["timestep_embedder"], t_freq.astype(x.dtype))
    temb = temb + _mlp_embed(tte["text_embedder"], pooled_projections.astype(x.dtype))
    if cfg.guidance_embeds and guidance is not None:
        g_freq = L.sinusoidal_timestep_embedding(guidance, 256, flip_sin_to_cos=True)
        temb = temb + _mlp_embed(tte["guidance_embedder"], g_freq.astype(x.dtype))
    temb_tr = None
    if token_replace:
        t0 = L.sinusoidal_timestep_embedding(jnp.zeros_like(timestep), 256, flip_sin_to_cos=True)
        temb_tr = _mlp_embed(tte["timestep_embedder"], t0.astype(x.dtype))
        temb_tr = temb_tr + _mlp_embed(tte["text_embedder"], pooled_projections.astype(x.dtype))
        if cfg.guidance_embeds and guidance is not None:
            g_freq = L.sinusoidal_timestep_embedding(guidance, 256, flip_sin_to_cos=True)
            temb_tr = temb_tr + _mlp_embed(tte["guidance_embedder"], g_freq.astype(x.dtype))

    # text refiner
    text = _token_refiner(
        params["context_embedder"], cfg, encoder_hidden_states.astype(x.dtype), encoder_attention_mask, timestep
    )
    seq_t = text.shape[1]

    # joint-attention kv mask: [video; text] — video fully valid
    if encoder_attention_mask is not None:
        kv_len = seq_v + encoder_attention_mask.sum(axis=1).astype(jnp.int32)
    else:
        kv_len = None

    # rope tables padded with identity for the TEXT suffix
    if rope_cos is not None:
        rc = np.concatenate([np.asarray(rope_cos, np.float32), np.ones((seq_t, hd), np.float32)], axis=0)
        rs = np.concatenate([np.asarray(rope_sin, np.float32), np.zeros((seq_t, hd), np.float32)], axis=0)
    else:
        rc = rs = None

    def heads(t):
        # batch derived from the input (not the closed-over b): bodies run on
        # microbatches under pipeline parallelism (sharding/pipeline.py)
        return t.reshape(t.shape[0], -1, nh, hd).transpose(0, 2, 1, 3)

    def unheads(t):
        return t.transpose(0, 2, 1, 3).reshape(t.shape[0], -1, dim)

    # ---- double-stream blocks
    def double_fn(carry, bp, ctx, consts):
        xx, tt = carry
        temb, temb_tr, kv_len = ctx  # shadow the closures: ctx microbatches
        rc, rs = consts  # under pipeline parallelism (sharding/pipeline.py)
        mod = L.linear(bp["norm1_linear"], L.silu(temb))
        mod_tr = L.linear(bp["norm1_linear"], L.silu(temb_tr)) if token_replace else None
        xn, g_msa, sc_mlp, s_mlp, g_mlp, tg_msa, tr_mlp, tg_mlp = _dual_modulate(
            mod, mod_tr, xx, first_frame_len
        )
        cmod = L.linear(bp["norm1_context_linear"], L.silu(temb))
        cs, csc, cg, cs2, csc2, cg2 = [cc[:, None] for cc in jnp.split(cmod, 6, axis=-1)]
        tn = L.layer_norm({}, tt, 1e-6) * (1 + csc) + cs

        a = bp["attn"]
        q = L.rms_norm(a["norm_q"], heads(L.linear(a["to_q"], xn)), 1e-6, offset=0.0)
        k = L.rms_norm(a["norm_k"], heads(L.linear(a["to_k"], xn)), 1e-6, offset=0.0)
        v = heads(L.linear(a["to_v"], xn))
        cq = L.rms_norm(a["norm_added_q"], heads(L.linear(a["add_q_proj"], tn)), 1e-6, offset=0.0)
        ck = L.rms_norm(a["norm_added_k"], heads(L.linear(a["add_k_proj"], tn)), 1e-6, offset=0.0)
        cv = heads(L.linear(a["add_v_proj"], tn))
        qj = jnp.concatenate([q, cq], axis=2)
        kj = jnp.concatenate([k, ck], axis=2)
        vj = jnp.concatenate([v, cv], axis=2)
        if rc is not None:
            from alg_tpu.ops.qk_prep import rope_interleaved

            qj = rope_interleaved(qj, jnp.asarray(rc), jnp.asarray(rs))
            kj = rope_interleaved(kj, jnp.asarray(rc), jnp.asarray(rs))
        oj = attention(qj, kj, vj, kv_len=kv_len, stable=False)
        oj = unheads(oj)
        xo, to = oj[:, :seq_v], oj[:, seq_v:]
        xx = _gate_concat(xx, L.linear(a["to_out"], xo), g_msa, tg_msa, first_frame_len)
        tt = tt + L.linear(a["to_add_out"], to) * cg

        # video ff with dual modulation
        xn2 = L.layer_norm({}, xx, 1e-6)
        if token_replace:
            tsc2, ts2 = tr_mlp
            n = first_frame_len
            xn2 = jnp.concatenate(
                [xn2[:, :n] * (1 + tsc2) + ts2, xn2[:, n:] * (1 + sc_mlp) + s_mlp], axis=1
            )
        else:
            xn2 = xn2 * (1 + sc_mlp) + s_mlp
        xx = _gate_concat(xx, L.mlp(bp["ff"], xn2, act=L.gelu_tanh), g_mlp, tg_mlp, first_frame_len)

        tn2 = L.layer_norm({}, tt, 1e-6) * (1 + csc2) + cs2
        tt = tt + L.mlp(bp["ff_context"], tn2, act=L.gelu_tanh) * cg2
        return (xx, tt)

    from alg_tpu.sharding.pipeline import run_blocks

    block_ctx = (temb, temb_tr, kv_len)
    x, text = run_blocks(
        double_fn, (x, text), params["transformer_blocks"],
        ctx=block_ctx, consts=(rc, rs),
    )

    # ---- single-stream blocks over [video; text]
    joint = jnp.concatenate([x, text], axis=1)

    def single_fn(xx, bp, ctx, consts):
        temb, temb_tr, kv_len = ctx  # shadow the closures (see double_fn)
        rc, rs = consts
        mod = L.linear(bp["norm_linear"], L.silu(temb))
        s_, sc_, g_ = [m[:, None] for m in jnp.split(mod, 3, axis=-1)]
        if token_replace:
            mod_tr = L.linear(bp["norm_linear"], L.silu(temb_tr))
            ts_, tsc_, tg_ = [m[:, None] for m in jnp.split(mod_tr, 3, axis=-1)]
            xn = L.layer_norm({}, xx, 1e-6)
            n = first_frame_len
            xn = jnp.concatenate(
                [xn[:, :n] * (1 + tsc_) + ts_, xn[:, n:] * (1 + sc_) + s_], axis=1
            )
        else:
            xn = L.layer_norm({}, xx, 1e-6) * (1 + sc_) + s_
            tg_ = None
        a = bp["attn"]
        q = L.rms_norm(a["norm_q"], heads(L.linear(a["to_q"], xn)), 1e-6, offset=0.0)
        k = L.rms_norm(a["norm_k"], heads(L.linear(a["to_k"], xn)), 1e-6, offset=0.0)
        v = heads(L.linear(a["to_v"], xn))
        if rc is not None:
            from alg_tpu.ops.qk_prep import rope_interleaved

            q = rope_interleaved(q, jnp.asarray(rc), jnp.asarray(rs))
            k = rope_interleaved(k, jnp.asarray(rc), jnp.asarray(rs))
        o = unheads(attention(q, k, v, kv_len=kv_len, stable=False))
        mlp_out = L.silu(L.linear(bp["proj_mlp"], xn))
        out = L.linear(bp["proj_out"], jnp.concatenate([o, mlp_out], axis=-1))
        if token_replace:
            n = first_frame_len
            xx = xx + jnp.concatenate([out[:, :n] * tg_, out[:, n:] * g_], axis=1)
        else:
            xx = xx + out * g_
        return xx

    joint = run_blocks(
        single_fn, joint, params["single_transformer_blocks"],
        ctx=block_ctx, consts=(rc, rs),
    )
    x = joint[:, :seq_v]

    # output head: AdaLayerNormContinuous (chunk order: scale first)
    mod = L.linear(params["norm_out"]["linear"], L.silu(temb))
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = L.layer_norm({}, x, 1e-6) * (1 + scale[:, None]) + shift[:, None]
    x = L.linear(params["proj_out"], x)

    oc = cfg.out_channels
    x = x.reshape(b, f // pt, h // p, w // p, pt, p, p, oc)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, oc, f, h, w)
