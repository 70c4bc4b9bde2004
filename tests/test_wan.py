"""Wan model + pipeline tests (tiny shapes) and CLIP parity vs transformers."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from alg_tpu.models.clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_text_encode,
    clip_vision_hidden_states,
)
from alg_tpu.models.wan import (
    WanTransformerConfig,
    WanVAEConfig,
    init_wan_transformer,
    init_wan_vae,
    wan_rope,
    wan_transformer,
    wan_vae_decode,
    wan_vae_encode,
)
from alg_tpu.io import weights as W


def _tiny_wan_cfg():
    return WanTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=12,
        in_channels=9,  # 4 latent + 4 mask-ish + 1, arbitrary for test
        out_channels=4,
        num_layers=2,
        ffn_dim=32,
        freq_dim=16,
        text_dim=8,
        image_dim=10,
        patch_size=(1, 2, 2),
    )


def test_wan_transformer_shapes():
    cfg = _tiny_wan_cfg()
    key = jax.random.PRNGKey(0)
    params = init_wan_transformer(key, cfg)
    x = jax.random.normal(key, (2, 9, 3, 4, 6))  # [B, C, F, h, w]
    text = jax.random.normal(key, (2, 7, 8))
    img = jax.random.normal(key, (2, 5, 10))
    cos, sin = wan_rope(cfg, 3, 4, 6)
    assert cos.shape == (3 * 2 * 3, 12)
    out = jax.jit(
        lambda p, x, t, tx, im: wan_transformer(p, cfg, x, t, tx, im, jnp.asarray(cos), jnp.asarray(sin))
    )(params, x, jnp.array([500.0, 900.0]), text, img)
    assert out.shape == (2, 4, 3, 4, 6)
    assert bool(jnp.isfinite(out).all())


def test_wan_transformer_image_conditioning_matters():
    cfg = _tiny_wan_cfg()
    key = jax.random.PRNGKey(0)
    params = init_wan_transformer(key, cfg)
    x = jax.random.normal(key, (1, 9, 2, 4, 4))
    text = jax.random.normal(key, (1, 7, 8))
    cos, sin = wan_rope(cfg, 2, 4, 4)
    i1 = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 10))
    i2 = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 10))
    t = jnp.array([500.0])
    o1 = wan_transformer(params, cfg, x, t, text, i1, cos, sin)
    o2 = wan_transformer(params, cfg, x, t, text, i2, cos, sin)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def _tiny_wan_vae_cfg():
    return WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1)


def test_wan_vae_shapes():
    cfg = _tiny_wan_vae_cfg()
    params = init_wan_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32, 32, 3))
    mean, logvar = wan_vae_encode(params, cfg, x)
    # (F-1)/4+1 = 3 latent frames, 8x spatial
    assert mean.shape == (1, 3, 4, 4, 4) and logvar.shape == mean.shape
    rec = wan_vae_decode(params, cfg, mean)
    assert rec.shape == (1, 9, 32, 32, 3)
    assert bool(jnp.isfinite(rec).all())


def test_wan_vae_single_frame():
    cfg = _tiny_wan_vae_cfg()
    params = init_wan_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 16, 3))
    mean, _ = wan_vae_encode(params, cfg, x)
    assert mean.shape == (1, 1, 2, 2, 4)


# ---------------------------------------------------------------------------
# pipeline (tiny end-to-end)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wan_pipe():
    from alg_tpu.pipelines import WanPipeline
    from alg_tpu.schedulers import UniPCConfig

    tcfg = WanTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=12,
        in_channels=12,  # 4 latent + 4 mask + 4 cond
        out_channels=4,
        num_layers=2,
        ffn_dim=32,
        freq_dim=16,
        text_dim=8,
        image_dim=10,
    )
    vcfg = WanVAEConfig(
        base_dim=8,
        z_dim=4,
        dim_mult=(1, 2, 2, 2),
        num_res_blocks=1,
        latents_mean=tuple(float(x) for x in np.linspace(-0.5, 0.5, 4)),
        latents_std=tuple(float(x) for x in np.linspace(1.0, 2.0, 4)),
    )
    key = jax.random.PRNGKey(0)
    return WanPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_wan_transformer(key, tcfg),
        vae_cfg=vcfg,
        vae_params=init_wan_vae(jax.random.PRNGKey(1), vcfg),
        scheduler_cfg=UniPCConfig(flow_shift=5.0),
    )


def test_wan_pipeline_alg_run(wan_pipe):
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    rng = np.random.RandomState(1)
    emb = jnp.asarray(rng.randn(1, 7, 8).astype(np.float32))
    neg = jnp.asarray(rng.randn(1, 7, 8).astype(np.float32))
    img_emb = jnp.asarray(rng.randn(1, 5, 10).astype(np.float32))
    video = wan_pipe(
        image=img,
        prompt_embeds=emb,
        negative_prompt_embeds=neg,
        image_embeds=img_emb,
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=4,
        guidance_scale=5.0,
        seed=42,
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.4,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.4,
        output_type="np",
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()


def test_wan_pipeline_identity_filter_matches_baseline(wan_pipe):
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    rng = np.random.RandomState(1)
    emb = jnp.asarray(rng.randn(1, 7, 8).astype(np.float32))
    neg = jnp.asarray(rng.randn(1, 7, 8).astype(np.float32))
    img_emb = jnp.asarray(rng.randn(1, 5, 10).astype(np.float32))
    kw = dict(
        image=img, prompt_embeds=emb, negative_prompt_embeds=neg, image_embeds=img_emb,
        height=32, width=32, num_frames=9, num_inference_steps=3, guidance_scale=5.0,
        seed=42, output_type="latent",
    )
    base = wan_pipe(**kw)
    noop = wan_pipe(
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_resize_factor=0.4,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.8,
        schedule_interval_end_time=0.9,  # 3 steps: norms {0, .5, 1} → never active
        **kw,
    )
    np.testing.assert_allclose(base, noop, atol=1e-5)


def test_wan_guidance_microbatch_matches_batched(wan_pipe):
    """guidance_microbatch=1 (sequential CFG/ALG passes, the Wan-14B single-chip
    memory knob) must reproduce the batched sampler: batch is a parallel dim in
    every op, so per-sample results are identical up to fp accumulation order."""
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    rng = np.random.RandomState(1)
    kw = dict(
        image=img,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        image_embeds=jnp.asarray(rng.randn(1, 5, 10).astype(np.float32)),
        height=32, width=32, num_frames=9, num_inference_steps=4,
        guidance_scale=5.0, seed=42, output_type="latent",
        use_low_pass_guidance=True, lp_filter_type="down_up",
        lp_filter_in_latent=True, lp_resize_factor=0.4,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.4,  # exercises the 3-pass segment
    )
    base = wan_pipe(**kw)
    wan_pipe.guidance_microbatch = 1
    try:
        micro = wan_pipe(**kw)
    finally:
        wan_pipe.guidance_microbatch = 0
    np.testing.assert_allclose(np.asarray(base), np.asarray(micro), atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# CLIP parity vs transformers
# ---------------------------------------------------------------------------


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel as HFModel

    hf_cfg = HFCfg(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        hidden_act="gelu",
    )
    params = W.convert_clip_vision(model.state_dict(), cfg)
    px = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(px), output_hidden_states=True)
    ours = clip_vision_hidden_states(params, cfg, jnp.asarray(px))
    # hidden_states[-2]: the Wan conditioning tensor
    np.testing.assert_allclose(
        np.asarray(ours[-2]), ref.hidden_states[-2].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(ours[-1]), ref.hidden_states[-1].numpy(), atol=2e-4)


def test_clip_text_parity():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel as HFModel

    hf_cfg = HFCfg(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=12,
        hidden_act="quick_gelu",
        eos_token_id=98,
        bos_token_id=97,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=12,
        hidden_act="quick_gelu",
        eos_token_id=98,
    )
    params = W.convert_clip_text(model.state_dict(), cfg)
    ids = np.array([[97, 5, 7, 98, 0, 0], [97, 11, 13, 17, 19, 98]], dtype=np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids))
    hidden, pooled = clip_text_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden), ref.last_hidden_state.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-4)


def test_wan_flf2v_last_image(wan_pipe):
    """FLF2V: `last_image` conditions the final frame too (reference
    :403-412, :436-447) — mask marks first AND last pixel frames, the
    condition video carries the last image, and the full sampler runs."""
    # mask block semantics
    mask = wan_pipe._mask_block(1, 9, 3, 4, 4)  # first-frame only
    mask_fl = wan_pipe._mask_block(1, 9, 3, 4, 4, last_image=object())
    assert mask.shape == mask_fl.shape == (1, 4, 3, 4, 4)
    # first latent frame: all 4 repeats set in both
    np.testing.assert_array_equal(mask[:, :, 0], 1.0)
    np.testing.assert_array_equal(mask_fl[:, :, 0], 1.0)
    # last latent frame: only FLF2V marks it (one repeat slot — pixel frame 8)
    assert mask[:, :, -1].sum() == 0.0
    assert mask_fl[:, :, -1].sum() > 0.0

    # condition build differs only through the last-frame content
    rng = np.random.RandomState(3)
    first = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    last = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    cond_plain = np.asarray(wan_pipe._build_condition(first, 1, 9, 32, 32, None))
    cond_fl = np.asarray(wan_pipe._build_condition(first, 1, 9, 32, 32, last))
    assert cond_plain.shape == cond_fl.shape == (1, 8, 3, 4, 4)  # 4 mask + 4 latent
    assert not np.allclose(cond_plain[:, 4:, -1], cond_fl[:, 4:, -1])

    # e2e: the sampler accepts last_image and produces a finite video
    rng = np.random.RandomState(1)
    video = wan_pipe(
        image=first,
        last_image=last,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        image_embeds=jnp.asarray(rng.randn(1, 5, 10).astype(np.float32)),
        height=32, width=32, num_frames=9, num_inference_steps=2,
        guidance_scale=5.0, seed=42, output_type="np",
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()


def test_wan_flf2v_batched_serving(wan_pipe):
    """Per-request FLF2V through serve_batch: each request carries its own
    last_image; rows of a batch-2 serve equal the corresponding batch-1
    serves (deterministic per-prompt/image stubs + per-request seeds), and
    presence must be all-or-none / Wan-only."""
    from alg_tpu.serving import BatchRequest, serve_batch

    def stub_prompt(prompts, max_len=512):
        return jnp.asarray(
            np.stack(
                [np.random.RandomState(len(p) * 7 + 1).randn(7, 8) for p in prompts]
            ).astype(np.float32)
        )

    def stub_image(image):
        seed = int(abs(float(np.asarray(image).sum())) * 997) % (2**31)
        return jnp.asarray(np.random.RandomState(seed).randn(1, 5, 10).astype(np.float32))

    wan_pipe.encode_prompt = stub_prompt
    wan_pipe.encode_image = stub_image
    if wan_pipe.clip_params is None:
        wan_pipe.clip_params = {}  # sentinel: serving calls the stubbed encode_image

    rng = np.random.RandomState(11)
    imgs = [rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1 for _ in range(2)]
    lasts = [rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1 for _ in range(2)]
    reqs = [
        BatchRequest(prompt="aa", image=imgs[0], seed=42, last_image=lasts[0]),
        BatchRequest(prompt="bbb", image=imgs[1], seed=7, last_image=lasts[1]),
    ]
    kwargs = dict(height=32, width=32, num_frames=9, num_inference_steps=2,
                  guidance_scale=5.0, output_type="latent")

    batch2 = np.asarray(serve_batch(wan_pipe, reqs, **kwargs))
    single0 = np.asarray(serve_batch(wan_pipe, reqs[:1], **kwargs))
    single1 = np.asarray(serve_batch(wan_pipe, reqs[1:], **kwargs))
    assert batch2.shape == (2, 4, 3, 4, 4)
    np.testing.assert_allclose(batch2[0], single0[0], atol=1e-5)
    np.testing.assert_allclose(batch2[1], single1[0], atol=1e-5)

    # FLF2V conditioning must actually change the result
    no_last = [BatchRequest(prompt=r.prompt, image=r.image, seed=r.seed) for r in reqs]
    plain = np.asarray(serve_batch(wan_pipe, no_last, **kwargs))
    assert not np.allclose(plain, batch2)

    # mixed presence rejected
    with pytest.raises(ValueError, match="ALL requests"):
        serve_batch(wan_pipe, [reqs[0], no_last[1]], **kwargs)


def test_wan_cache_interval(wan_pipe):
    """cache_interval>1: cached run differs from exact, is finite, and the
    observer (per-step) dispatch equals the chunked-scan dispatch. The cache
    RULE itself is pinned independently in test_pipeline_cogvideox (identical
    implementation across pipelines)."""
    img = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    rng = np.random.RandomState(1)
    kwargs = dict(
        image=img,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        image_embeds=jnp.asarray(rng.randn(1, 5, 10).astype(np.float32)),
        height=32, width=32, num_frames=9, num_inference_steps=4,
        guidance_scale=5.0, seed=42, output_type="latent",
        use_low_pass_guidance=True, lp_filter_type="down_up",
        lp_filter_in_latent=True, lp_resize_factor=0.4,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0, schedule_interval_end_time=0.3,
    )
    exact = wan_pipe(**kwargs)
    cached = wan_pipe(cache_interval=2, **kwargs)
    assert np.isfinite(cached).all()
    assert not np.allclose(exact, cached)
    obs = wan_pipe(cache_interval=2, step_observer=lambda i, lat: None, **kwargs)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(cached), atol=1e-5)


def test_condition_tiled_encode_dispatches_per_tile(wan_pipe):
    """r5 OOM regression guard: _build_condition must NOT trace the spatial
    tile loop into one program — inside a single jit XLA holds every tile's
    encoder activations concurrently (measured 49 GB at the shipped
    81f@480x832 Wan condition). Each tile call must execute eagerly, i.e.
    the per-tile encode sees CONCRETE arrays and returns concrete arrays."""
    import alg_tpu.models.vae_tiling as vt

    wan_pipe.vae_encode_tiling = True  # force the tiled branch at tiny scale
    wan_pipe._enc_jit = None  # rebuild (fixture may be shared)
    seen = []
    real_tiled_encode = vt.tiled_encode

    def spy(encode_fn, x, spatial_scale, **kw):
        def probe(xt):
            out = encode_fn(xt)
            seen.append((type(xt), type(out)))
            assert not isinstance(xt, jax.core.Tracer), "tile input is traced"
            assert not isinstance(out, jax.core.Tracer), "tile output is traced"
            return out

        return real_tiled_encode(probe, x, spatial_scale, **kw)

    vt.tiled_encode, orig = spy, vt.tiled_encode
    try:
        cond = wan_pipe._build_condition(
            np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32),
            1, 9, 64, 64, None,
        )
    finally:
        vt.tiled_encode = orig
        wan_pipe.vae_encode_tiling = None
        wan_pipe._enc_jit = None
    assert seen, "tiled branch did not run"
    assert cond.shape[1] == 8  # 4 mask + 4 latent channels
