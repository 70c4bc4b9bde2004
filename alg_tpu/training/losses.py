"""Training objectives for the three DiT families.

The reference is strictly inference-only — SURVEY §0/§5 record "no training"
— so this module is the framework's beyond-parity training tier: the losses
that the shipped samplers invert, in the exact model-input layouts the
pipelines use, so a fine-tuned checkpoint drops straight back into them.

* CogVideoX trains with **v-prediction** under its SNR-shifted, zero-terminal-
  SNR DDIM schedule (``schedulers/ddim_cogvideox.make_alphas_cumprod``):
  ``x_t = √ā·x₀ + √(1−ā)·ε``, target ``v = √ā·ε − √(1−ā)·x₀``.
* Wan and HunyuanVideo train with **flow matching** (rectified flow):
  ``x_t = (1−σ)·x₀ + σ·ε``, target velocity ``u = ε − x₀``, with the same
  timestep shift their samplers use (``σ' = s·σ / (1 + (s−1)·σ)``) and
  logit-normal σ sampling (the SD3/movie-gen recipe) or uniform.

Batches are **latent-space pytrees**: VAE latents and text embeddings are
precomputed once by the frozen encoders (the standard video fine-tune
recipe); only the DiT trains. Model-input assembly mirrors the pipelines:

* CogVideoX: channel-concat ``[x_t ⧺ image_latents]`` on axis 2 of
  ``[B, F, C, H, W]`` (reference ``...cogvideox...py:1060-1070``).
* Wan: channel-concat ``[x_t ⧺ 20-ch mask+latent condition]`` on axis 1 of
  ``[B, C, F, h, w]`` (reference ``...wan...py:882-901``).
* Hunyuan (token_replace): temporal concat ``[image_latents, x_t[:, :, 1:]]``
  on the frame axis, loss masked to frames 1+ — frame 0 is re-pinned by the
  sampler every step and carries no learning signal (reference
  ``...hunyuan...py:1263-1270``).

All losses are pure jittable functions ``(params, batch, key) → scalar`` once
closed over their static config/tables; compute runs in the params' dtype,
the MSE reduction in fp32.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# flow-matching time sampling
# ---------------------------------------------------------------------------


def shift_sigmas(sigmas: jnp.ndarray, shift: float) -> jnp.ndarray:
    """The samplers' timestep shift: ``σ' = s·σ / (1 + (s−1)·σ)``."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def sample_flow_sigmas(
    key,
    batch_size: int,
    shift: float = 1.0,
    sampling: str = "logit_normal",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
) -> jnp.ndarray:
    """Per-sample σ ∈ (0, 1): logit-normal (default, concentrates signal at
    mid-noise where the model learns most) or uniform, then shifted like the
    inference schedule."""
    if sampling == "logit_normal":
        u = jax.nn.sigmoid(
            jax.random.normal(key, (batch_size,), jnp.float32) * logit_std + logit_mean
        )
    elif sampling == "uniform":
        u = jax.random.uniform(key, (batch_size,), jnp.float32, 1e-5, 1.0 - 1e-5)
    else:
        raise ValueError(f"unknown sigma sampling {sampling!r}")
    return shift_sigmas(u, shift)


def _bcast(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def _cast_floats(tree, dtype):
    """Cast floating leaves (mixed-precision compute); None = passthrough."""
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


# ---------------------------------------------------------------------------
# CogVideoX — v-prediction
# ---------------------------------------------------------------------------


def make_cogvideox_vpred_loss(
    cfg,
    alphas_cumprod: Optional[np.ndarray] = None,
    rope_cos: Optional[np.ndarray] = None,
    rope_sin: Optional[np.ndarray] = None,
    num_train_timesteps: int = 1000,
    compute_dtype=None,
):
    """``loss(params, batch, key)`` for CogVideoX v-prediction fine-tuning.

    batch: ``latents [B,F,C,H,W]`` (clean x₀), ``image_latents`` (zero-padded
    conditioning, same shape), ``encoder_hidden_states [B,S,text_dim]``.

    ``compute_dtype=jnp.bfloat16`` is mixed-precision training: params stay
    fp32 masters (AdamW moments too), the forward casts them — and the model
    inputs — to bf16 at the loss boundary; autodiff upcasts gradients back
    to fp32 through the cast. The target/MSE stay fp32 either way.
    """
    from alg_tpu.models.cogvideox import cogvideox_transformer
    from alg_tpu.schedulers import CogVideoXDDIMConfig
    from alg_tpu.schedulers.ddim_cogvideox import make_alphas_cumprod

    if alphas_cumprod is None:
        alphas_cumprod = make_alphas_cumprod(CogVideoXDDIMConfig())
    ac = jnp.asarray(alphas_cumprod, jnp.float32)

    def loss_fn(params, batch, key):
        x0 = batch["latents"]
        cond = batch["image_latents"]
        embeds = batch["encoder_hidden_states"]
        kt, kn = jax.random.split(key)
        b = x0.shape[0]
        t = jax.random.randint(kt, (b,), 0, num_train_timesteps)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        x0f = x0.astype(jnp.float32)
        sa = _bcast(jnp.sqrt(ac[t]), x0.ndim)
        sb = _bcast(jnp.sqrt(1.0 - ac[t]), x0.ndim)
        xt = sa * x0f + sb * noise
        target = sa * noise - sb * x0f
        cd = compute_dtype or x0.dtype
        model_in = jnp.concatenate([xt.astype(cd), cond.astype(cd)], axis=2)
        pred = cogvideox_transformer(
            _cast_floats(params, compute_dtype), cfg, model_in,
            _cast_floats(embeds, compute_dtype), t.astype(jnp.float32),
            rope_cos, rope_sin,
        )
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    return loss_fn


# ---------------------------------------------------------------------------
# Wan — flow matching
# ---------------------------------------------------------------------------


def make_wan_flow_loss(
    cfg,
    shift: float = 5.0,
    sampling: str = "logit_normal",
    rope_cos: Optional[np.ndarray] = None,
    rope_sin: Optional[np.ndarray] = None,
    compute_dtype=None,
):
    """``loss(params, batch, key)`` for Wan flow-matching fine-tuning.

    batch: ``latents [B,C,F,h,w]`` (clean x₀, VAE-normalized), ``condition
    [B,20,F,h,w]`` (mask ⧺ conditioning latents, fixed — it is input-only),
    ``encoder_hidden_states [B,512,text_dim]``, optional
    ``encoder_hidden_states_image [B,257,image_dim]``.
    """
    from alg_tpu.models.wan import wan_transformer

    def loss_fn(params, batch, key):
        x0 = batch["latents"]
        cond = batch["condition"]
        text = batch["encoder_hidden_states"]
        img = batch.get("encoder_hidden_states_image")
        ks, kn = jax.random.split(key)
        sigma = sample_flow_sigmas(ks, x0.shape[0], shift=shift, sampling=sampling)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        x0f = x0.astype(jnp.float32)
        s = _bcast(sigma, x0.ndim)
        xt = (1.0 - s) * x0f + s * noise
        target = noise - x0f
        cd = compute_dtype or x0.dtype
        model_in = jnp.concatenate([xt.astype(cd), cond.astype(cd)], axis=1)
        pred = wan_transformer(
            _cast_floats(params, compute_dtype), cfg, model_in, sigma * 1000.0,
            _cast_floats(text, compute_dtype), _cast_floats(img, compute_dtype),
            rope_cos, rope_sin,
        )
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    return loss_fn


# ---------------------------------------------------------------------------
# HunyuanVideo — flow matching with token-replace conditioning
# ---------------------------------------------------------------------------


def make_hunyuan_flow_loss(
    cfg,
    shift: float = 7.0,
    sampling: str = "logit_normal",
    guidance_scale: float = 6.0,
    rope_cos: Optional[np.ndarray] = None,
    rope_sin: Optional[np.ndarray] = None,
    compute_dtype=None,
):
    """``loss(params, batch, key)`` for HunyuanVideo flow-matching fine-tuning.

    batch: ``latents [B,C,F,h,w]`` (clean x₀), ``image_latents [B,C,1,h,w]``
    (scaled conditioning first frame), ``encoder_hidden_states`` +
    ``encoder_attention_mask`` (Llava) and ``pooled_projections`` (CLIP).

    For the distilled (guidance-embed) model the training guidance input is a
    constant ``guidance_scale·1000`` — matching what the sampler feeds at
    inference (reference ``...hunyuan...py:1115-1119``). With token_replace
    conditioning the first latent frame is replaced by the clean image latent
    in the model input and EXCLUDED from the loss (the sampler re-pins it
    every step).
    """
    from alg_tpu.models.hunyuan import hunyuan_transformer

    token_replace = cfg.image_condition_type == "token_replace"

    def loss_fn(params, batch, key):
        x0 = batch["latents"]
        image_latents = batch["image_latents"]
        text = batch["encoder_hidden_states"]
        mask = batch.get("encoder_attention_mask")
        pooled = batch["pooled_projections"]
        ks, kn = jax.random.split(key)
        sigma = sample_flow_sigmas(ks, x0.shape[0], shift=shift, sampling=sampling)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        x0f = x0.astype(jnp.float32)
        s = _bcast(sigma, x0.ndim)
        cd = compute_dtype or x0.dtype
        xt = ((1.0 - s) * x0f + s * noise).astype(cd)
        target = noise - x0f
        if token_replace:
            model_in = jnp.concatenate([image_latents.astype(cd), xt[:, :, 1:]], axis=2)
        else:
            model_in = xt
        guidance = None
        if cfg.guidance_embeds:
            guidance = jnp.full((x0.shape[0],), guidance_scale * 1000.0, jnp.float32)
        pred = hunyuan_transformer(
            _cast_floats(params, compute_dtype), cfg, model_in, sigma * 1000.0,
            _cast_floats(text, compute_dtype), mask,
            _cast_floats(pooled, compute_dtype),
            guidance=guidance, rope_cos=rope_cos, rope_sin=rope_sin,
        )
        err = (pred.astype(jnp.float32) - target) ** 2
        if token_replace:
            err = err[:, :, 1:]  # frame 0 carries no learning signal
        return jnp.mean(err)

    return loss_fn
