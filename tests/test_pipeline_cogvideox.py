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


def test_cache_interval_semantics(pipe, monkeypatch):
    """Step caching (beyond-parity, cache_interval>1): the DiT runs only on
    compute steps (every k-th + the final); cached steps reuse the previous
    prediction. Pinned independently: a timestep-keyed stub transformer makes
    noise_pred == t/1000, so the expected trajectory is reproducible in the
    test from the public DDIM plan/step alone, with the caching rule
    reimplemented here."""
    from alg_tpu.pipelines import cogvideox as M
    from alg_tpu.schedulers import ddim_step, make_ddim_plan

    def stub_transformer(params, cfg, x, embeds, t, cos, sin, ofs=None):
        c_out = x.shape[2] // 2
        return jnp.broadcast_to(
            (t / 1000.0).reshape(-1, 1, 1, 1, 1).astype(x.dtype), x[:, :, :c_out].shape
        )

    monkeypatch.setattr(M, "cogvideox_transformer", stub_transformer)

    n_steps = 5
    kwargs = dict(
        image=_image(),
        prompt_embeds=_embeds(1),
        negative_prompt_embeds=_embeds(2),
        guidance_scale=6.0,
        seed=42,
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=n_steps,
        output_type="latent",
    )
    out_exact = pipe(**kwargs)
    out_cached = pipe(cache_interval=2, **kwargs)
    assert not np.allclose(out_exact, out_cached)

    # independent reference: same plan, same stub predictions, caching rule
    # reimplemented here (compute on i % 2 == 0 and the last step)
    plan = make_ddim_plan(pipe.scheduler_cfg, n_steps)
    ts = np.asarray(plan.timesteps)
    # reproduce latents0: same draws as the pipeline (VAE posterior draw
    # first, then the init noise) — easiest is to ask the pipeline for its
    # exact-step-0 state by running with num_inference_steps=... simpler:
    # replicate via NoiseSource ordering
    b, lat_f, c, h, w = out_exact.shape
    noise = NoiseSource(seed=42)
    _posterior = noise.randn((b, c, 1, h, w))  # vae_encode_sample draw
    latents = jnp.asarray(noise.randn((b, lat_f, c, h, w)), jnp.float32)
    prev = None
    for i in range(n_steps):
        if i % 2 == 0 or i == n_steps - 1:
            prev = jnp.full_like(latents, float(ts[i]) / 1000.0)
        latents = ddim_step(plan, i, prev, latents).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(latents), atol=1e-6)


def test_cache_interval_observer_path_matches_scan(pipe):
    """cache_interval through the observer (per-step) dispatch equals the
    chunked-scan dispatch, and ALG 3-pass steps are always computed."""
    kwargs = dict(
        image=_image(),
        prompt_embeds=_embeds(1),
        negative_prompt_embeds=_embeds(2),
        guidance_scale=6.0,
        seed=42,
        cache_interval=3,
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.25,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.4,
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=4,
        output_type="latent",
    )
    scan = pipe(**kwargs)
    seen = []
    obs = pipe(step_observer=lambda i, lat: seen.append(i), **kwargs)
    assert seen == [0, 1, 2, 3]
    np.testing.assert_allclose(np.asarray(obs), np.asarray(scan), atol=1e-5)
