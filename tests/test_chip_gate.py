"""Bounded on-TPU gate — `pytest tests/ -m chip` (VERDICT r4 #5).

Compiled-kernel parity for the Pallas units the samplers/training dispatch
to — the pieces the CPU suite can only run in interpret mode — plus a
sampler segment and a QLoRA train step on the real backend. Everything is
sized so the whole `-m chip` selection (this file + test_attention.py + the
chip tier of test_attention_bwd.py) finishes in ~10 minutes on the tunneled
v5e, compiles included. This is the gate that catches TPU-only breakage the
CPU suite cannot (the r3 `_pallas_call_jvp_rule` lesson).

On CPU the whole module skips (no TPU backend).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.ops.attention import _xla_attention
from alg_tpu.ops.flash_attention import supports_flash

pytestmark = [
    pytest.mark.chip,
    pytest.mark.skipif(
        not supports_flash(None, None, None, None), reason="no TPU backend"
    ),
]


def _dit_like_qkv(rng, b, h, s, d):
    q = rng.randn(b, h, s, d).astype(np.float32)
    k = rng.randn(b, h, s, d).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True) * np.sqrt(d)
    k = k / np.linalg.norm(k, axis=-1, keepdims=True) * np.sqrt(d)
    v = rng.randn(b, h, s, d).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


# ---------------------------------------------------------------------------
# int8 kernel, COMPILED (the CPU suite runs it interpret-only)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("pv", [False, True])
def test_int8_kernel_compiled_matches_interpret(d, pv):
    """The Mosaic-compiled int8 kernel must compute the same quantized math
    as its interpret-mode twin (which the CPU tests pin against the plain-JAX
    quantized reference): fp32 op-order differences only."""
    from alg_tpu.ops.flash_attention_int8 import flash_attention_int8

    rng = np.random.RandomState(0)
    q, k, v = _dit_like_qkv(rng, 1, 2, 384, d)
    scale = d**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=128, block_k=128, pv_int8=pv)
    ref = flash_attention_int8(
        q, k, v, scale, block_q=128, block_k=128, pv_int8=pv, interpret=True
    )
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # pv: a one-code round-half flip on P is ~1e-3 on that element
    assert err.max() < (3e-3 if pv else 1e-4), err.max()
    # and drift vs exact attention stays at the int8 level
    exact = _xla_attention(q, k, v, scale)
    derr = np.abs(np.asarray(out) - np.asarray(exact))
    rms = float(np.sqrt((np.asarray(exact) ** 2).mean()))
    assert derr.mean() / rms < 3e-2, (derr.mean(), rms)


def test_int8_kernel_compiled_kv_len():
    """kv_len masking (Hunyuan joint sequence) through the compiled kernel."""
    from alg_tpu.ops.flash_attention_int8 import flash_attention_int8

    rng = np.random.RandomState(1)
    s = 384
    kv_len = jnp.asarray([299, 384], jnp.int32)
    q, k, v = _dit_like_qkv(rng, 2, 2, s, 128)
    out = flash_attention_int8(
        q, k, v, 128**-0.5, block_q=128, block_k=128, pv_int8=True, kv_len=kv_len
    )
    exact = _xla_attention(q, k, v, 128**-0.5, kv_len=kv_len)
    mask = (np.arange(s)[None, :] < np.asarray(kv_len)[:, None])[:, None, :, None]
    err = np.abs(np.asarray(out) - np.asarray(exact)) * mask
    rms = float(np.sqrt((np.asarray(exact) ** 2 * mask).sum() / mask.sum() / 128 / 2))
    assert err.mean() / rms < 5e-2, (err.mean(), rms)


def test_int8_kernel_compiled_production_blocks():
    """One call at the production block-picker path (S with no aligned
    divisor → padded default blocks) at D=128 — the Wan/Hunyuan geometry
    class, shrunk to a gate-sized sequence."""
    from alg_tpu.ops.flash_attention_int8 import flash_attention_int8

    rng = np.random.RandomState(2)
    q, k, v = _dit_like_qkv(rng, 1, 2, 1541, 128)  # 1541 prime-ish → pad path
    out = flash_attention_int8(q, k, v, 128**-0.5, pv_int8=True)
    exact = _xla_attention(q, k, v, 128**-0.5)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    rms = float(np.sqrt((np.asarray(exact) ** 2).mean()))
    assert out.shape == (1, 2, 1541, 128)
    assert err.mean() / rms < 3e-2, (err.mean(), rms)


# ---------------------------------------------------------------------------
# fused qk-prep kernels, COMPILED
# ---------------------------------------------------------------------------


def test_qk_prep_compiled_matches_xla():
    from alg_tpu.models import layers as L
    from alg_tpu.models import rope as R
    from alg_tpu.ops.qk_prep import qk_norm_rope

    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(2, 3, 256, 64).astype(np.float32)).astype(jnp.bfloat16)
    normp = {
        "scale": jnp.asarray(1.0 + 0.1 * r.randn(64).astype(np.float32)),
        "bias": jnp.asarray(0.1 * r.randn(64).astype(np.float32)),
    }
    ang = r.rand(256, 32).astype(np.float32) * 6.28
    cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=1))
    sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=1))
    ref = R.apply_rope_interleaved(L.layer_norm(normp, x, 1e-6), cos, sin)
    out = qk_norm_rope(x, normp, cos, sin, 1e-6, force="pallas")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=1e-2
    )


def test_rope_interleaved_compiled_matches_xla():
    from alg_tpu.models import rope as R
    from alg_tpu.ops.qk_prep import rope_interleaved

    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(1, 2, 256, 128).astype(np.float32)).astype(jnp.bfloat16)
    ang = r.rand(256, 64).astype(np.float32) * 6.28
    cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=1))
    sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=1))
    ref = R.apply_rope_interleaved(x, cos, sin)
    out = rope_interleaved(x, cos, sin)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=1e-2
    )


# ---------------------------------------------------------------------------
# sampler segment + QLoRA step on the real backend
# ---------------------------------------------------------------------------


def test_sampler_segment_pallas_vs_xla():
    """A short shipped-sampler run (ALG 3-pass + 2-pass segments) with the
    Pallas attention default must match the same run forced through the XLA
    attention path — the whole segmented-scan/gather/filter machinery on the
    TPU backend."""
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        init_cogvideox_transformer,
        init_cogvideox_vae,
    )
    from alg_tpu.ops.attention import set_attention_impl
    from alg_tpu.pipelines import CogVideoXPipeline

    tcfg = CogVideoXTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=64,  # flash-kernel head_dim
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=2,
        sample_height=8,
        sample_width=12,
        max_text_seq_length=5,
    )
    vcfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4,
        layers_per_block=1, norm_num_groups=4,
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg),
        vae_cfg=vcfg,
        vae_params=init_cogvideox_vae(jax.random.PRNGKey(1), vcfg),
    )
    r = np.random.RandomState(5)
    kwargs = dict(
        image=r.rand(1, 3, 64, 96).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(r.randn(1, 5, 12).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(r.randn(1, 5, 12).astype(np.float32)),
        height=64,
        width=96,
        num_frames=9,
        num_inference_steps=4,
        guidance_scale=6.0,
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.5,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.3,  # step 0 is 3-pass at 4 steps
        seed=42,
        output_type="latent",
    )
    out_pallas = np.asarray(pipe(**kwargs))
    set_attention_impl("xla")
    try:
        out_xla = np.asarray(pipe(**kwargs))
    finally:
        set_attention_impl(None)
    assert np.isfinite(out_pallas).all()
    np.testing.assert_allclose(out_pallas, out_xla, atol=5e-4, rtol=1e-3)


def test_qlora_step_chip():
    """One QLoRA training step (int8 frozen base + attached adapters +
    dequantized-weight custom VJP) on the TPU backend — the r5 on-chip
    training record's mechanics, gate-sized."""
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.quant import quantize_transformer_params
    from alg_tpu.training import (
        TrainConfig,
        init_lora_params,
        make_cogvideox_vpred_loss,
        make_lora_loss,
        make_train_step,
    )

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=2, attention_head_dim=64, in_channels=8,
        out_channels=4, time_embed_dim=16, text_embed_dim=12, num_layers=2,
        sample_height=4, sample_width=4, max_text_seq_length=4,
    )
    base = quantize_transformer_params(
        init_cogvideox_transformer(jax.random.PRNGKey(0), cfg), mode="w8"
    )
    loras = init_lora_params(jax.random.PRNGKey(1), base, rank=2)
    loss = make_lora_loss(make_cogvideox_vpred_loss(cfg), None, attach=True)
    step, opt = make_train_step(loss, TrainConfig(learning_rate=1e-3))
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 2, 4, 8, 8).astype(np.float32)),
        "image_latents": jnp.asarray(rng.randn(2, 2, 4, 8, 8).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(rng.randn(2, 3, 12).astype(np.float32)),
    }
    loras, _, m = jax.jit(step)(loras, opt.init(loras), batch, jax.random.PRNGKey(1), base)
    assert np.isfinite(float(m["loss"]))
