"""Cooperative interruption (reference ``self._interrupt`` checked each step,
``pipeline_cogvideox_image2video_lowpass.py:1006-1007``): setting
``pipe.interrupt`` from a step observer stops the run after the current step
and returns the partial latents."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
        num_attention_heads=2, attention_head_dim=16, in_channels=8, out_channels=4,
        time_embed_dim=16, text_embed_dim=12, num_layers=2,
        sample_height=8, sample_width=8, max_text_seq_length=5,
    )
    vcfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    )
    return CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg),
        vae_cfg=vcfg,
        vae_params=init_cogvideox_vae(jax.random.PRNGKey(1), vcfg),
    )


def _kwargs():
    rng = np.random.RandomState(1)
    return dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 5, 12).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 5, 12).astype(np.float32)),
        height=32, width=32, num_frames=5, num_inference_steps=4,
        guidance_scale=6.0, seed=42, output_type="latent",
    )


def test_interrupt_via_observer_stops_early(pipe):
    pipe.interrupt = False
    full = pipe(**_kwargs())

    seen = []

    def observer(i, lat):
        seen.append(i)
        if i == 1:
            pipe.interrupt = True

    try:
        partial = pipe(**_kwargs(), step_observer=observer)
    finally:
        pipe.interrupt = False
    assert seen == [0, 1]  # stopped after step 1
    assert partial.shape == full.shape
    assert not np.allclose(partial, full)  # genuinely earlier state


def test_interrupt_preset_returns_initial_latents(pipe):
    pipe.interrupt = True
    try:
        out = pipe(**_kwargs())
    finally:
        pipe.interrupt = False
    assert np.isfinite(out).all()
