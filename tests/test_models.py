"""Model-architecture tests.

T5/UMT5 are parity-tested against tiny randomly-initialized ``transformers``
torch models with weights converted through the real loader path — this
validates both the architecture and the checkpoint name-mapping. The video
models are validated structurally (shapes, temporal causality, jit).
"""

import dataclasses
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from alg_tpu.models.t5 import T5Config, init_t5_encoder, t5_encode, relative_position_buckets
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    CogVideoXVAEConfig,
    cogvideox_rope,
    cogvideox_transformer,
    cogvideox_vae_decode,
    cogvideox_vae_encode,
    init_cogvideox_transformer,
    init_cogvideox_vae,
)
from alg_tpu.io import weights as W


# ---------------------------------------------------------------------------
# T5 / UMT5 parity vs transformers
# ---------------------------------------------------------------------------


def _tiny_hf_t5(umt5: bool):
    if umt5:
        from transformers import UMT5Config as HFConfig, UMT5EncoderModel as HFModel
    else:
        from transformers import T5Config as HFConfig, T5EncoderModel as HFModel
    hf_cfg = HFConfig(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        per_layer_relative_bias=umt5,
    )
    return model, cfg


@pytest.mark.parametrize("umt5", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_t5_parity_vs_transformers(umt5, with_mask):
    model, cfg = _tiny_hf_t5(umt5)
    params = W.convert_t5_encoder(model.state_dict(), cfg)
    ids = np.array([[5, 17, 99, 3, 1, 0, 0, 0], [42, 7, 1, 0, 0, 0, 0, 0]], dtype=np.int64)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask) if with_mask else None,
        ).last_hidden_state.numpy()
    ours = np.asarray(
        t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask) if with_mask else None)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_relative_buckets_match_transformers():
    from transformers.models.t5.modeling_t5 import T5Attention

    ctx = torch.arange(9)[:, None]
    mem = torch.arange(9)[None, :]
    ref = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    ours = relative_position_buckets(9, 9, 32, 128)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# CogVideoX DiT
# ---------------------------------------------------------------------------


def _tiny_dit_cfg():
    return CogVideoXTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=2,
        sample_height=16,
        sample_width=24,
        max_text_seq_length=5,
    )


def test_cogvideox_transformer_shapes_and_jit():
    cfg = _tiny_dit_cfg()
    key = jax.random.PRNGKey(0)
    params = init_cogvideox_transformer(key, cfg)
    cos, sin = cogvideox_rope(cfg, 32, 48, 3)
    assert cos.shape == (3 * 2 * 3, 16)
    x = jax.random.normal(key, (2, 3, 8, 4, 6))
    txt = jax.random.normal(key, (2, 5, 12))

    fn = jax.jit(
        lambda p, x, t, ts: cogvideox_transformer(p, cfg, x, t, ts, jnp.asarray(cos), jnp.asarray(sin))
    )
    out = fn(params, x, txt, jnp.array([999.0, 500.0]))
    assert out.shape == (2, 3, 4, 4, 6)
    assert bool(jnp.isfinite(out).all())
    # timestep must modulate the output
    out2 = fn(params, x, txt, jnp.array([10.0, 10.0]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_cogvideox_rope_slice_mode_for_1_5():
    """patch_size_t set (CogVideoX-1.5) → 'slice' grid: plain arange
    positions instead of the centered-crop linspace."""
    cfg_10 = _tiny_dit_cfg()
    cfg_15 = dataclasses.replace(cfg_10, patch_size_t=2)
    cos10, _ = cogvideox_rope(cfg_10, 32, 48, 4)
    cos15, _ = cogvideox_rope(cfg_15, 32, 48, 4)
    # 1.0: one rope row per latent frame; 1.5: one per temporal *patch*
    assert cos10.shape == (4 * 2 * 3, 16)
    assert cos15.shape == (2 * 2 * 3, 16)
    # the spatial grids differ whenever the crop region is offset from origin
    assert not np.allclose(cos10[: 2 * 3], cos15[: 2 * 3])


def test_cogvideox_transformer_text_conditioning():
    cfg = _tiny_dit_cfg()
    key = jax.random.PRNGKey(0)
    params = init_cogvideox_transformer(key, cfg)
    cos, sin = cogvideox_rope(cfg, 32, 48, 2)
    x = jax.random.normal(key, (1, 2, 8, 4, 6))
    t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 12))
    t2 = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    ts = jnp.array([500.0])
    o1 = cogvideox_transformer(params, cfg, x, t1, ts, cos, sin)
    o2 = cogvideox_transformer(params, cfg, x, t2, ts, cos, sin)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


# ---------------------------------------------------------------------------
# CogVideoX VAE
# ---------------------------------------------------------------------------


def _tiny_vae_cfg():
    return CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1, norm_num_groups=4
    )


def test_vae_shapes():
    cfg = _tiny_vae_cfg()
    params = init_cogvideox_vae(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 32, 32, 3))
    mean, logvar = cogvideox_vae_encode(params, cfg, x)
    # (F-1)/4+1 latent frames, 8x spatial
    assert mean.shape == (1, 3, 4, 4, 4) and logvar.shape == mean.shape
    rec = cogvideox_vae_decode(params, cfg, mean)
    assert rec.shape == (1, 9, 32, 32, 3)


def test_vae_single_frame():
    cfg = _tiny_vae_cfg()
    params = init_cogvideox_vae(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32, 3))
    mean, _ = cogvideox_vae_encode(params, cfg, x)
    assert mean.shape == (1, 1, 4, 4, 4)
    rec = cogvideox_vae_decode(params, cfg, mean)
    assert rec.shape == (1, 1, 32, 32, 3)


def test_tiled_decode_matches_whole():
    """Tiled decode must match the whole-clip decode away from tile seams and
    stay close at the blended seams (diffusers-equivalent assembly)."""
    from alg_tpu.models.vae_tiling import tiled_decode

    cfg = _tiny_vae_cfg()
    params = init_cogvideox_vae(jax.random.PRNGKey(1), cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, 16, 4))
    fn = jax.jit(lambda p, zt: cogvideox_vae_decode(p, cfg, zt))
    whole = np.asarray(fn(params, z))
    tiled = np.asarray(
        tiled_decode(lambda zt: fn(params, zt), z, cfg.spatial_scale, tile_latent=8, stride_latent=6)
    )
    assert tiled.shape == whole.shape
    # interiors of tiles match exactly; seams blend (bounded difference)
    diff = np.abs(tiled - whole)
    assert diff.mean() < 0.15, diff.mean()
    assert np.isfinite(tiled).all()


def test_causal_conv_and_pool_are_temporally_causal():
    """The conv/pool primitives must be strictly causal (frame t sees only
    frames ≤ t). The full encoder is *not* strictly causal — GroupNorm couples
    all frames, exactly as in the torch reference — so causality is asserted
    at the primitive level."""
    from alg_tpu.models.cogvideox.vae import causal_conv3d, _temporal_pool2, _init_conv3d

    p = _init_conv3d(jax.random.PRNGKey(0), 3, 3, 3, 2, 2, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8, 8, 2))
    y1 = causal_conv3d(p, x)
    x2 = x.at[:, 3:].add(1.0)
    y2 = causal_conv3d(p, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :3]), np.asarray(y2[:, :3]), atol=1e-6)
    assert not np.allclose(np.asarray(y1[:, 3:]), np.asarray(y2[:, 3:]))

    # causal pool: frame 0 kept verbatim, pairs averaged; F → (F+1)/2 for odd F
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 4, 4, 2))
    pz = _temporal_pool2(z)
    assert pz.shape[1] == 3
    np.testing.assert_allclose(np.asarray(pz[:, 0]), np.asarray(z[:, 0]))
    np.testing.assert_allclose(np.asarray(pz[:, 1]), np.asarray(0.5 * (z[:, 1] + z[:, 2])), atol=1e-6)
