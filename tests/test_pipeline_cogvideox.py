"""End-to-end CogVideoX pipeline tests on tiny shapes (BASELINE config #1
scale: few frames, 2-4 steps, fp32). Validates the jit'd segmented denoise
loop, the 2/3-pass switching, and ALG behavioral properties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    CogVideoXVAEConfig,
    init_cogvideox_transformer,
    init_cogvideox_vae,
)
from alg_tpu.pipelines import CogVideoXPipeline


@pytest.fixture(scope="module")
def pipe():
    tcfg = CogVideoXTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=2,
        sample_height=4,
        sample_width=4,
        max_text_seq_length=5,
    )
    vcfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1, norm_num_groups=4
    )
    key = jax.random.PRNGKey(0)
    return CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_cogvideox_transformer(key, tcfg),
        vae_cfg=vcfg,
        vae_params=init_cogvideox_vae(jax.random.PRNGKey(1), vcfg),
    )


def _embeds(seed, b=1):
    return jnp.asarray(np.random.RandomState(seed).randn(b, 5, 12).astype(np.float32))


def _image():
    return np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1


COMMON = dict(
    height=32,
    width=32,
    num_frames=9,  # → 3 latent frames
    num_inference_steps=4,
    output_type="np",
)


def test_basic_cfg_run(pipe):
    video = pipe(
        image=_image(),
        prompt_embeds=_embeds(1),
        negative_prompt_embeds=_embeds(2),
        guidance_scale=6.0,
        seed=42,
        **COMMON,
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_alg_run_differs_and_interval_switch(pipe):
    kw = dict(image=_image(), prompt_embeds=_embeds(1), negative_prompt_embeds=_embeds(2), guidance_scale=6.0, seed=42)
    base = pipe(output_type="latent", **kw, **{k: v for k, v in COMMON.items() if k != "output_type"})
    alg = pipe(
        output_type="latent",
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.25,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.4,  # 4 steps: i/3 <= 0.4 → steps 0,1 are 3-pass
        **kw,
        **{k: v for k, v in COMMON.items() if k != "output_type"},
    )
    assert base.shape == alg.shape
    assert not np.allclose(base, alg)


def test_alg_identity_filter_matches_baseline(pipe):
    """strength never active ⇒ identical latents to the non-ALG path (the
    2-pass ALG branch conditions on the identity-filtered latent)."""
    kw = dict(image=_image(), prompt_embeds=_embeds(1), negative_prompt_embeds=_embeds(2), guidance_scale=6.0, seed=42)
    base = pipe(output_type="latent", **kw, **{k: v for k, v in COMMON.items() if k != "output_type"})
    alg_noop = pipe(
        output_type="latent",
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.25,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.9,  # never hits with 4 steps? i/3 ∈ {0,.33,.67,1} → step 3!
        schedule_interval_end_time=0.95,
        **kw,
        **{k: v for k, v in COMMON.items() if k != "output_type"},
    )
    np.testing.assert_allclose(base, alg_noop, atol=1e-5)


def test_no_cfg_single_pass(pipe):
    video = pipe(
        image=_image(),
        prompt_embeds=_embeds(1),
        guidance_scale=1.0,
        seed=42,
        **COMMON,
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()


def test_seed_determinism(pipe):
    kw = dict(image=_image(), prompt_embeds=_embeds(1), negative_prompt_embeds=_embeds(2), guidance_scale=6.0)
    a = pipe(seed=42, output_type="latent", **kw, **{k: v for k, v in COMMON.items() if k != "output_type"})
    b = pipe(seed=42, output_type="latent", **kw, **{k: v for k, v in COMMON.items() if k != "output_type"})
    c = pipe(seed=7, output_type="latent", **kw, **{k: v for k, v in COMMON.items() if k != "output_type"})
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_pixel_space_alg(pipe):
    video = pipe(
        image=_image(),
        prompt_embeds=_embeds(1),
        negative_prompt_embeds=_embeds(2),
        guidance_scale=6.0,
        seed=42,
        use_low_pass_guidance=True,
        lp_filter_type="gaussian_blur",
        lp_filter_in_latent=False,
        lp_blur_sigma=2.0,
        lp_blur_kernel_size=0.2,
        lp_strength_schedule_type="linear",
        schedule_linear_start_weight=1.0,
        schedule_linear_end_weight=0.0,
        schedule_linear_end_time=1.0,
        **COMMON,
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()


def test_dpm_scheduler_runs(pipe):
    import dataclasses

    pipe_dpm = dataclasses.replace(pipe, scheduler="dpm")
    video = pipe_dpm(
        image=_image(),
        prompt_embeds=_embeds(1),
        negative_prompt_embeds=_embeds(2),
        guidance_scale=6.0,
        seed=42,
        **COMMON,
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()
