"""Tiled VAE encode parity (VERDICT r1 item 9).

Mirrors the tiled-decode test: encoding through overlapping pixel tiles with
latent seam blending must match the whole-image encode away from seams and
stay bounded at the seams, for every leaf of the (mean, logvar) moments
pytree and for all three VAE families. Reference relief analog:
``pipeline_hunyuan_video_image2video_lowpass.py:601-628``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models.cogvideox.vae import (
    CogVideoXVAEConfig,
    cogvideox_vae_encode,
    init_cogvideox_vae,
)
from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode


def test_auto_tile_encode_threshold():
    # conditioning-frame encodes must match the reference bit-for-bit, so
    # single-frame encodes NEVER auto-tile (ADVICE r2: tiled != untiled)
    assert not auto_tile_encode(1, 480, 720)  # single-frame 480p: untiled
    assert not auto_tile_encode(1, 1280, 720)  # single-frame 720p: untiled
    assert auto_tile_encode(81, 480, 832)  # Wan condition video: tiled
    assert not auto_tile_encode(5, 96, 128)  # tiny multi-frame clip: untiled
    # explicit override (reference enable_vae_tiling analog) wins outright
    assert auto_tile_encode(1, 64, 64, override=True)
    assert not auto_tile_encode(81, 480, 832, override=False)


def test_tiled_encode_matches_whole_cogvideox():
    cfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    )
    params = init_cogvideox_vae(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 96, 128, 3))
    fn = jax.jit(lambda p, xt: cogvideox_vae_encode(p, cfg, xt))
    mean_w, logvar_w = fn(params, x)
    mean_t, logvar_t = tiled_encode(
        lambda xt: fn(params, xt), x, cfg.spatial_scale, tile_px=64, stride_px=48
    )
    assert mean_t.shape == mean_w.shape and logvar_t.shape == logvar_w.shape
    # tile interiors match closely; blended seams stay bounded
    assert np.abs(np.asarray(mean_t) - np.asarray(mean_w)).mean() < 0.15
    assert np.abs(np.asarray(logvar_t) - np.asarray(logvar_w)).mean() < 0.15
    assert np.isfinite(np.asarray(mean_t)).all()


def test_tiled_encode_single_leaf_wan():
    from alg_tpu.models.wan.vae import WanVAEConfig, init_wan_vae, wan_vae_encode

    cfg = WanVAEConfig(base_dim=16, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1)
    params = init_wan_vae(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 96, 128, 3))
    fn = jax.jit(lambda p, xt: wan_vae_encode(p, cfg, xt)[0])
    whole = np.asarray(fn(params, x))
    tiled = np.asarray(
        tiled_encode(lambda xt: fn(params, xt), x, cfg.spatial_scale, tile_px=64, stride_px=48)
    )
    assert tiled.shape == whole.shape
    assert np.abs(tiled - whole).mean() < 0.2
    assert np.isfinite(tiled).all()


def test_tiled_encode_small_input_passthrough():
    """Inputs within one tile must go through the untiled path unchanged."""
    cfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    )
    params = init_cogvideox_vae(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
    fn = jax.jit(lambda p, xt: cogvideox_vae_encode(p, cfg, xt))
    mean_w, _ = fn(params, x)
    mean_t, _ = tiled_encode(lambda xt: fn(params, xt), x, cfg.spatial_scale)
    np.testing.assert_array_equal(np.asarray(mean_t), np.asarray(mean_w))
