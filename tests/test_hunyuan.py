"""HunyuanVideo model + pipeline tests (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models.hunyuan import (
    HunyuanVideoTransformerConfig,
    HunyuanVAEConfig,
    hunyuan_rope,
    hunyuan_transformer,
    hunyuan_vae_decode,
    hunyuan_vae_encode,
    init_hunyuan_transformer,
    init_hunyuan_vae,
)
from alg_tpu.pipelines import HunyuanVideoPipeline


def _tiny_dit_cfg():
    return HunyuanVideoTransformerConfig(
        in_channels=4,
        out_channels=4,
        num_attention_heads=2,
        attention_head_dim=8,
        num_layers=1,
        num_single_layers=2,
        num_refiner_layers=1,
        mlp_ratio=2.0,
        text_embed_dim=12,
        pooled_projection_dim=6,
        rope_axes_dim=(2, 4, 2),  # wait: must sum to head_dim/... (t+h+w = d/2·2)
    )


def test_hunyuan_transformer_shapes():
    # rope axes must sum to head_dim (here 8): (2, 4, 2)? axes dims are per-axis
    # feature sizes; sum must equal head_dim
    cfg = HunyuanVideoTransformerConfig(
        in_channels=4,
        out_channels=4,
        num_attention_heads=2,
        attention_head_dim=8,
        num_layers=1,
        num_single_layers=2,
        num_refiner_layers=1,
        mlp_ratio=2.0,
        text_embed_dim=12,
        pooled_projection_dim=6,
        rope_axes_dim=(2, 4, 2),
    )
    key = jax.random.PRNGKey(0)
    params = init_hunyuan_transformer(key, cfg)
    x = jax.random.normal(key, (2, 4, 3, 4, 4))  # [B, C, F, h, w]
    text = jax.random.normal(key, (2, 7, 12))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.int32))
    pooled = jax.random.normal(key, (2, 6))
    cos, sin = hunyuan_rope(cfg, 3, 4, 4)
    assert cos.shape == (3 * 2 * 2, 8)
    out = jax.jit(
        lambda p, x, t, e, m, pl: hunyuan_transformer(
            p, cfg, x, t, e, m, pl, guidance=jnp.array([6000.0, 6000.0]), rope_cos=cos, rope_sin=sin
        )
    )(params, x, jnp.array([500.0, 900.0]), text, mask, pooled)
    assert out.shape == (2, 4, 3, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_hunyuan_transformer_guidance_matters():
    cfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    key = jax.random.PRNGKey(0)
    params = init_hunyuan_transformer(key, cfg)
    x = jax.random.normal(key, (1, 4, 2, 4, 4))
    text = jax.random.normal(key, (1, 5, 12))
    pooled = jax.random.normal(key, (1, 6))
    cos, sin = hunyuan_rope(cfg, 2, 4, 4)
    t = jnp.array([500.0])
    o1 = hunyuan_transformer(params, cfg, x, t, text, None, pooled, jnp.array([6000.0]), cos, sin)
    o2 = hunyuan_transformer(params, cfg, x, t, text, None, pooled, jnp.array([1000.0]), cos, sin)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def _tiny_vae_cfg():
    return HunyuanVAEConfig(
        block_out_channels=(8, 16, 16, 16), latent_channels=4, layers_per_block=1, norm_num_groups=4
    )


def test_hunyuan_vae_shapes():
    cfg = _tiny_vae_cfg()
    params = init_hunyuan_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32, 32, 3))
    mean, logvar = hunyuan_vae_encode(params, cfg, x)
    assert mean.shape == (1, 3, 4, 4, 4)
    rec = hunyuan_vae_decode(params, cfg, mean)
    assert rec.shape == (1, 9, 32, 32, 3)
    assert bool(jnp.isfinite(rec).all())


@pytest.fixture(scope="module")
def pipe():
    tcfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    vcfg = _tiny_vae_cfg()
    key = jax.random.PRNGKey(0)
    return HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_hunyuan_transformer(key, tcfg),
        vae_cfg=vcfg,
        vae_params=init_hunyuan_vae(jax.random.PRNGKey(1), vcfg),
    )


def _embeds(b=1):
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(b, 7, 12).astype(np.float32)),
        jnp.asarray(rng.randn(b, 6).astype(np.float32)),
        jnp.asarray(np.ones((b, 7), np.int32)),
    )


def test_hunyuan_pipeline_single_pass_alg(pipe):
    """Shipped config path: true_cfg 1.0, ALG on → single pass with filtered
    conditioning; token_replace pins frame 0 to the clean image latent."""
    emb, pooled, mask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    lat = pipe(
        image=img,
        prompt_embeds=emb,
        pooled_prompt_embeds=pooled,
        prompt_attention_mask=mask,
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=3,
        guidance_scale=6.0,
        true_cfg_scale=1.0,
        i2v_stable=True,
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.625,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.5,
        output_type="latent",
        seed=42,
    )
    assert lat.shape == (1, 4, 3, 4, 4)
    assert np.isfinite(lat).all()
    # frame 0 must equal the clean image latent (token_replace re-pinning)
    import jax.numpy as jnp2

    x = jnp.asarray(img, jnp.float32)[:, None].transpose(0, 1, 3, 4, 2)
    from alg_tpu.models.hunyuan import hunyuan_vae_encode as enc

    mean, _ = enc(pipe.vae_params, pipe.vae_cfg, x)
    il = np.asarray(mean.transpose(0, 4, 1, 2, 3)) * pipe.vae_cfg.scaling_factor
    np.testing.assert_allclose(lat[:, :, 0], il[:, :, 0], atol=1e-4)


def test_hunyuan_pipeline_true_cfg(pipe):
    emb, pooled, mask = _embeds()
    nemb, npooled, nmask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    video = pipe(
        image=img,
        prompt_embeds=emb,
        pooled_prompt_embeds=pooled,
        prompt_attention_mask=mask,
        negative_prompt_embeds=nemb,
        negative_pooled_prompt_embeds=npooled,
        negative_prompt_attention_mask=nmask,
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=2,
        guidance_scale=6.0,
        true_cfg_scale=2.0,
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.5,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.6,
        output_type="np",
        seed=42,
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()


def test_hunyuan_lp_img_embeds_asserts(pipe):
    emb, pooled, mask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    with pytest.raises(AssertionError):
        pipe(image=img, prompt_embeds=emb, pooled_prompt_embeds=pooled, prompt_attention_mask=mask,
             height=32, width=32, num_frames=9, num_inference_steps=2, enable_lp_img_embeds=True)


# ---------------------------------------------------------------------------
# latent_concat conditioning variant
# ---------------------------------------------------------------------------


def _latent_concat_pipe():
    tcfg = HunyuanVideoTransformerConfig(
        in_channels=9,  # 2·z + 1 for z=4 (latents ⧺ cond ⧺ mask on channels)
        out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    vcfg = _tiny_vae_cfg()
    return HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_hunyuan_transformer(jax.random.PRNGKey(0), tcfg),
        vae_cfg=vcfg,
        vae_params=init_hunyuan_vae(jax.random.PRNGKey(1), vcfg),
    )


def test_hunyuan_latent_concat_input_assembly(monkeypatch):
    """Channel layout must be [latents(z) ⧺ cond(z) ⧺ mask(1)] with the cond
    image latent on frame 0 only and mask 1 on frame 0 only; scheduler steps
    the FULL latents (no token-replace re-pinning)."""
    import alg_tpu.pipelines.hunyuan as H
    from alg_tpu.core.rng import NoiseSource
    from alg_tpu.schedulers import FlowMatchEulerConfig, flow_match_euler_step, make_flow_match_euler_plan

    pipe = _latent_concat_pipe()

    def stub_transformer(params, cfg, x, t, text, mask, pooled, guidance=None, rope_cos=None, rope_sin=None):
        # prediction = cond channels + mask channel → directly observable
        return x[:, 4:8] + x[:, 8:9]

    monkeypatch.setattr(H, "hunyuan_transformer", stub_transformer)

    emb, pooled, mask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    lat = pipe(
        image=img,
        prompt_embeds=emb,
        pooled_prompt_embeds=pooled,
        prompt_attention_mask=mask,
        height=32, width=32, num_frames=9, num_inference_steps=1,
        guidance_scale=6.0, true_cfg_scale=1.0, i2v_stable=False,
        image_condition_type="latent_concat",
        output_type="latent", seed=42,
    )

    # expected: il = mean-encode(img)·scale zero-padded to 3 frames; mask on
    # frame 0; one full Euler step over ALL frames; first frame dropped
    x = jnp.asarray(img, jnp.float32)[:, None].transpose(0, 1, 3, 4, 2)
    mean, _ = hunyuan_vae_encode(pipe.vae_params, pipe.vae_cfg, x)
    il = np.asarray(mean.transpose(0, 4, 1, 2, 3)) * pipe.vae_cfg.scaling_factor  # [1,4,1,4,4]
    cond = np.concatenate([il, np.zeros((1, 4, 2, 4, 4), np.float32)], axis=2)
    cmask = np.zeros((1, 1, 3, 4, 4), np.float32)
    cmask[:, :, 0] = 1.0
    noise_pred = cond + cmask
    latents0 = NoiseSource(seed=42).randn((1, 4, 3, 4, 4))
    plan = make_flow_match_euler_plan(
        FlowMatchEulerConfig(shift=7.0, invert_sigmas=False),
        sigmas=np.linspace(1.0, 0.0, 2)[:-1],
    )
    expected = np.asarray(
        flow_match_euler_step(plan, 0, jnp.asarray(noise_pred), jnp.asarray(latents0))
    )[:, :, 1:]
    np.testing.assert_allclose(lat, expected, atol=1e-5)


def test_hunyuan_pipeline_latent_concat_e2e():
    """Single-pass distilled-guidance ALG run with latent_concat: latent
    output drops the conditioning frame; pixel output drops 4 frames."""
    pipe = _latent_concat_pipe()
    emb, pooled, mask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    common = dict(
        image=img, prompt_embeds=emb, pooled_prompt_embeds=pooled,
        prompt_attention_mask=mask, height=32, width=32, num_frames=9,
        num_inference_steps=2, guidance_scale=6.0, true_cfg_scale=1.0,
        i2v_stable=True, image_condition_type="latent_concat", seed=42,
        use_low_pass_guidance=True, lp_filter_type="down_up",
        lp_filter_in_latent=True, lp_resize_factor=0.625,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0, schedule_interval_end_time=0.6,
    )
    lat = pipe(output_type="latent", **common)
    assert lat.shape == (1, 4, 2, 4, 4)
    assert np.isfinite(lat).all()
    video = pipe(output_type="np", **common)
    assert video.shape == (1, 5, 32, 32, 3)  # 9 pixel frames − 4 dropped
    assert np.isfinite(video).all()


def test_hunyuan_latent_concat_rejects_wrong_in_channels(pipe):
    emb, pooled, mask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    with pytest.raises(ValueError, match="in_channels"):
        pipe(
            image=img, prompt_embeds=emb, pooled_prompt_embeds=pooled,
            prompt_attention_mask=mask, height=32, width=32, num_frames=9,
            num_inference_steps=1, image_condition_type="latent_concat",
            output_type="latent",
        )


def test_hunyuan_cache_interval(pipe):
    """cache_interval>1 on the shipped single-pass ALG path: ALG-active steps
    are always computed (their conditioning varies per step), cached steps
    reuse the previous prediction; observer dispatch equals scan dispatch."""
    emb, pooled, mask = _embeds()
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    kwargs = dict(
        image=img, prompt_embeds=emb, pooled_prompt_embeds=pooled,
        prompt_attention_mask=mask, height=32, width=32, num_frames=9,
        num_inference_steps=4, guidance_scale=6.0, true_cfg_scale=1.0,
        i2v_stable=True, seed=42, output_type="latent",
        use_low_pass_guidance=True, lp_filter_type="down_up",
        lp_filter_in_latent=True, lp_resize_factor=0.625,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0, schedule_interval_end_time=0.3,
    )
    exact = pipe(**kwargs)
    cached = pipe(cache_interval=3, **kwargs)
    assert np.isfinite(cached).all()
    assert not np.allclose(exact, cached)
    # token_replace re-pinning survives caching: frame 0 stays the clean latent
    np.testing.assert_allclose(cached[:, :, 0], exact[:, :, 0], atol=1e-5)
    obs = pipe(cache_interval=3, step_observer=lambda i, lat: None, **kwargs)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(cached), atol=1e-5)
