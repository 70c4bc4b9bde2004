"""Hooks parity for Wan/Hunyuan (VERDICT r1 item 10): step observers on both
samplers (reference callback_on_step_end analogs, ``...wan...py:929-941``,
``...hunyuan...py:1272-1283``), LoRA merges for both DiTs (reference loader
mixins ``...wan...py:128``, ``...hunyuan...py:224``), and Wan input validation
(``...wan...py:318-370``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models.wan import (
    WanTransformerConfig,
    WanVAEConfig,
    init_wan_transformer,
    init_wan_vae,
    wan_rope,
    wan_transformer,
)
from alg_tpu.models.hunyuan import (
    HunyuanVideoTransformerConfig,
    init_hunyuan_transformer,
)
from alg_tpu.pipelines import HunyuanVideoPipeline, WanPipeline
from alg_tpu.schedulers import UniPCConfig


@pytest.fixture(scope="module")
def wan_pipe():
    tcfg = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=12, in_channels=12, out_channels=4,
        num_layers=2, ffn_dim=32, freq_dim=16, text_dim=8, image_dim=10,
    )
    vcfg = WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
        latents_mean=tuple(float(x) for x in np.linspace(-0.5, 0.5, 4)),
        latents_std=tuple(float(x) for x in np.linspace(1.0, 2.0, 4)),
    )
    return WanPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_wan_transformer(jax.random.PRNGKey(0), tcfg),
        vae_cfg=vcfg,
        vae_params=init_wan_vae(jax.random.PRNGKey(1), vcfg),
        scheduler_cfg=UniPCConfig(flow_shift=5.0),
    )


def _wan_kwargs(rng_seed=1):
    rng = np.random.RandomState(rng_seed)
    return dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        image_embeds=jnp.asarray(rng.randn(1, 5, 10).astype(np.float32)),
        height=32, width=32, num_frames=9, num_inference_steps=4,
        guidance_scale=5.0, seed=42,
        use_low_pass_guidance=True, lp_filter_type="down_up",
        lp_filter_in_latent=True, lp_resize_factor=0.4,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0, schedule_interval_end_time=0.4,
        output_type="latent",
    )


def test_wan_step_observer_matches_scan(wan_pipe):
    base = wan_pipe(**_wan_kwargs())
    seen = []
    observed = wan_pipe(**_wan_kwargs(), step_observer=lambda i, lat: seen.append((i, lat.copy())))
    assert [i for i, _ in seen] == [0, 1, 2, 3]
    np.testing.assert_allclose(observed, base, atol=1e-5)
    np.testing.assert_allclose(seen[-1][1], base, atol=1e-5)
    # intermediate latents must differ from the final ones (real per-step data)
    assert not np.allclose(seen[0][1], base)


def test_wan_check_inputs_image_required(wan_pipe):
    kw = _wan_kwargs()
    kw["image"] = None
    with pytest.raises(ValueError, match="image"):
        wan_pipe(**kw)


def test_wan_check_inputs_prompt_conflict(wan_pipe):
    kw = _wan_kwargs()
    kw["prompt"] = "a prompt"
    with pytest.raises(ValueError, match="both prompt and prompt_embeds"):
        wan_pipe(**kw)


@pytest.fixture(scope="module")
def hunyuan_pipe():
    from alg_tpu.models.hunyuan import init_hunyuan_vae
    from alg_tpu.models.hunyuan.vae import HunyuanVAEConfig

    tcfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    vcfg = HunyuanVAEConfig(
        latent_channels=4, block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        norm_num_groups=4,
    )
    return HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_hunyuan_transformer(jax.random.PRNGKey(0), tcfg),
        vae_cfg=vcfg,
        vae_params=init_hunyuan_vae(jax.random.PRNGKey(1), vcfg),
    )


def _hunyuan_kwargs():
    rng = np.random.RandomState(0)
    return dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 12).astype(np.float32)),
        pooled_prompt_embeds=jnp.asarray(rng.randn(1, 6).astype(np.float32)),
        prompt_attention_mask=jnp.asarray(np.ones((1, 7), np.int32)),
        height=32, width=32, num_frames=9, num_inference_steps=3,
        guidance_scale=6.0, true_cfg_scale=1.0, i2v_stable=True,
        use_low_pass_guidance=True, lp_filter_type="down_up",
        lp_filter_in_latent=True, lp_resize_factor=0.625,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0, schedule_interval_end_time=0.5,
        output_type="latent", seed=42,
    )


def test_hunyuan_step_observer_matches_scan(hunyuan_pipe):
    base = hunyuan_pipe(**_hunyuan_kwargs())
    seen = []
    observed = hunyuan_pipe(
        **_hunyuan_kwargs(), step_observer=lambda i, lat: seen.append((i, lat.copy()))
    )
    assert [i for i, _ in seen] == [0, 1, 2]
    np.testing.assert_allclose(observed, base, atol=1e-5)
    np.testing.assert_allclose(seen[-1][1], base, atol=1e-5)


# ---------------------------------------------------------------------------
# LoRA merges
# ---------------------------------------------------------------------------


def test_merge_lora_wan_exact_and_forward_changes():
    from alg_tpu.io.lora import merge_lora_wan

    tcfg = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=12, in_channels=12, out_channels=4,
        num_layers=2, ffn_dim=32, freq_dim=16, text_dim=8, image_dim=10,
    )
    params = init_wan_transformer(jax.random.PRNGKey(0), tcfg)
    dim = tcfg.num_attention_heads * tcfg.attention_head_dim
    rng = np.random.RandomState(1)
    a1 = rng.randn(3, dim).astype(np.float32) * 0.1
    b1 = rng.randn(dim, 3).astype(np.float32) * 0.1
    a2 = rng.randn(3, dim).astype(np.float32) * 0.1
    b2 = rng.randn(tcfg.ffn_dim, 3).astype(np.float32) * 0.1
    lora = {
        "blocks.1.attn2.to_q.lora_A.weight": a1,
        "blocks.1.attn2.to_q.lora_B.weight": b1,
        "blocks.0.ffn.net.0.proj.lora_A.weight": a2,
        "blocks.0.ffn.net.0.proj.lora_B.weight": b2,
    }
    merged = merge_lora_wan(params, lora, scale=0.5)

    w0 = np.asarray(params["blocks"]["attn2"]["to_q"]["kernel"])
    w1 = np.asarray(merged["blocks"]["attn2"]["to_q"]["kernel"])
    np.testing.assert_allclose(w1[0], w0[0])
    np.testing.assert_allclose(w1[1], w0[1] + 0.5 * (b1 @ a1).T, atol=1e-6)
    f0 = np.asarray(params["blocks"]["ffn"]["fc_in"]["kernel"])
    f1 = np.asarray(merged["blocks"]["ffn"]["fc_in"]["kernel"])
    np.testing.assert_allclose(f1[0], f0[0] + 0.5 * (b2 @ a2).T, atol=1e-6)
    np.testing.assert_allclose(f1[1], f0[1])
    # untouched leaves stay the same objects
    assert merged["blocks"]["attn1"]["to_q"]["kernel"] is params["blocks"]["attn1"]["to_q"]["kernel"]

    # forward output changes
    rope_cos, rope_sin = wan_rope(tcfg, 2, 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 2, 4, 4))
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 8))
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 10))
    t = jnp.array([500.0])
    o1 = wan_transformer(params, tcfg, x, t, txt, img, rope_cos, rope_sin)
    o2 = wan_transformer(merged, tcfg, x, t, txt, img, rope_cos, rope_sin)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_merge_lora_hunyuan_double_and_single_stacks():
    from alg_tpu.io.lora import merge_lora_hunyuan

    tcfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=2, num_single_layers=2, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    params = init_hunyuan_transformer(jax.random.PRNGKey(0), tcfg)
    dim = tcfg.num_attention_heads * tcfg.attention_head_dim
    mlp = int(dim * tcfg.mlp_ratio)
    rng = np.random.RandomState(2)
    a1 = rng.randn(3, dim).astype(np.float32) * 0.1
    b1 = rng.randn(dim, 3).astype(np.float32) * 0.1
    a2 = rng.randn(3, dim).astype(np.float32) * 0.1
    b2 = rng.randn(mlp, 3).astype(np.float32) * 0.1
    lora = {
        "transformer_blocks.0.attn.add_q_proj.lora_A.weight": a1,
        "transformer_blocks.0.attn.add_q_proj.lora_B.weight": b1,
        "single_transformer_blocks.1.proj_mlp.lora_A.weight": a2,
        "single_transformer_blocks.1.proj_mlp.lora_B.weight": b2,
    }
    merged = merge_lora_hunyuan(params, lora, scale=1.0)

    w0 = np.asarray(params["transformer_blocks"]["attn"]["add_q_proj"]["kernel"])
    w1 = np.asarray(merged["transformer_blocks"]["attn"]["add_q_proj"]["kernel"])
    np.testing.assert_allclose(w1[0], w0[0] + (b1 @ a1).T, atol=1e-6)
    np.testing.assert_allclose(w1[1], w0[1])
    s0 = np.asarray(params["single_transformer_blocks"]["proj_mlp"]["kernel"])
    s1 = np.asarray(merged["single_transformer_blocks"]["proj_mlp"]["kernel"])
    np.testing.assert_allclose(s1[0], s0[0])
    np.testing.assert_allclose(s1[1], s0[1] + (b2 @ a2).T, atol=1e-6)
    # untouched stacks/leaves share objects
    assert (
        merged["transformer_blocks"]["attn"]["to_q"]["kernel"]
        is params["transformer_blocks"]["attn"]["to_q"]["kernel"]
    )
    assert (
        merged["single_transformer_blocks"]["attn"]["to_q"]["kernel"]
        is params["single_transformer_blocks"]["attn"]["to_q"]["kernel"]
    )


def test_merge_lora_wan_unmapped_raises():
    from alg_tpu.io.lora import merge_lora_wan

    tcfg = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=12, in_channels=12, out_channels=4,
        num_layers=1, ffn_dim=32, freq_dim=16, text_dim=8,
    )
    params = init_wan_transformer(jax.random.PRNGKey(0), tcfg)
    lora = {
        "blocks.0.bogus.lora_A.weight": np.zeros((2, 24), np.float32),
        "blocks.0.bogus.lora_B.weight": np.zeros((24, 2), np.float32),
    }
    with pytest.raises(KeyError):
        merge_lora_wan(params, lora)
