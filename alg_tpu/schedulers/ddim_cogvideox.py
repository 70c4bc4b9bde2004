"""CogVideoX DDIM scheduler — pure-JAX, fully precomputed.

Reproduces the diffusers ``CogVideoXDDIMScheduler`` semantics used by the
reference pipeline (``pipeline_cogvideox_image2video_lowpass.py:31,1111-1112``):
scaled-linear betas, SNR-shifted alphas_cumprod, zero-terminal-SNR rescale,
v-prediction, and the a_t/b_t deterministic update

    prev = a_t * sample + b_t * pred_x0,
    a_t  = sqrt((1 - ā_prev) / (1 - ā_t)),
    b_t  = sqrt(ā_prev) - sqrt(ā_t) * a_t.

TPU-native design: the timestep grid is static per run, so every per-step
scalar (a_t, b_t, x0-conversion coefficients) is precomputed host-side into
``[T]`` tables; the in-loop step is two gathers + fused multiply-adds, fully
traceable through ``lax.scan`` with a dynamic step index and zero host sync.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CogVideoXDDIMConfig:
    """Defaults = THUDM/CogVideoX-5b-I2V shipped scheduler config."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    snr_shift_scale: float = 3.0
    rescale_betas_zero_snr: bool = True
    set_alpha_to_one: bool = True
    timestep_spacing: str = "trailing"
    steps_offset: int = 0
    prediction_type: str = "v_prediction"


def make_alphas_cumprod(cfg: CogVideoXDDIMConfig) -> np.ndarray:
    """Training alphas_cumprod after SNR shift + zero-terminal-SNR rescale."""
    t = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, t, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, t, dtype=np.float64)
    else:
        raise ValueError(f"Unsupported beta_schedule {cfg.beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)

    # SNR shift: a <- a / (s + (1 - s) a); identity at s=1
    s = cfg.snr_shift_scale
    alphas_cumprod = alphas_cumprod / (s + (1.0 - s) * alphas_cumprod)

    if cfg.rescale_betas_zero_snr:
        # rescale sqrt(ā) affinely so the terminal value is exactly 0
        ab_sqrt = np.sqrt(alphas_cumprod)
        ab0, abT = ab_sqrt[0], ab_sqrt[-1]
        ab_sqrt = (ab_sqrt - abT) * (ab0 / (ab0 - abT))
        alphas_cumprod = ab_sqrt**2
    return alphas_cumprod


def make_timesteps(cfg: CogVideoXDDIMConfig, num_inference_steps: int) -> np.ndarray:
    """Inference timestep grid for the configured spacing (descending)."""
    t = cfg.num_train_timesteps
    n = num_inference_steps
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, t - 1, n).round()[::-1].astype(np.int64)
    elif cfg.timestep_spacing == "leading":
        step_ratio = t // n
        ts = (np.arange(0, n) * step_ratio).round()[::-1].astype(np.int64) + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = t / n
        ts = np.round(np.arange(t, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"Unsupported timestep_spacing {cfg.timestep_spacing!r}")
    return ts.copy()


@dataclasses.dataclass(frozen=True)
class CogVideoXDDIMPlan:
    """Per-step coefficient tables for one sampling run (all ``[T]`` fp32).

    ``eta > 0`` (reference ``prepare_extra_step_kwargs``,
    ``...cogvideox...py:446-461,988``) switches :func:`ddim_step` to the
    stochastic DDIM update — coefficients ``sqrt(ā_prev)``,
    ``sqrt(1 − ā_prev − σ²)`` and ``σ = η·sqrt((1−ā_prev)/(1−ā_t)·(1−ā_t/ā_prev))``
    are precomputed per step; the per-step variance noise is pre-generated
    host-side from the run's torch-ordered generator (same pattern as
    ``dpm_noise``) and fed to the jitted loop as an input."""

    timesteps: np.ndarray  # [T] int64 (for conditioning embeddings)
    a_t: np.ndarray  # [T]
    b_t: np.ndarray  # [T]
    sqrt_alpha: np.ndarray  # [T] sqrt(ā_t) for x0 conversion
    sqrt_beta: np.ndarray  # [T] sqrt(1 - ā_t)
    prediction_type: str
    init_noise_sigma: float = 1.0
    eta: float = 0.0
    sqrt_alpha_prev: np.ndarray = None  # [T] sqrt(ā_prev)
    eps_coef: np.ndarray = None  # [T] sqrt(1 - ā_prev - σ²)
    std: np.ndarray = None  # [T] σ (already scaled by η)


def make_ddim_plan(
    cfg: CogVideoXDDIMConfig, num_inference_steps: int, timesteps=None, eta: float = 0.0
) -> CogVideoXDDIMPlan:
    """``timesteps``: optional custom descending grid (reference
    retrieve_timesteps custom-timesteps path, ...cogvideox...py:95-151).
    ``eta``: DDIM stochasticity (0 = deterministic, the shipped default)."""
    ac = make_alphas_cumprod(cfg)
    if timesteps is not None:
        import numpy as _np

        ts = _np.asarray(timesteps, dtype=_np.int64)
        num_inference_steps = len(ts)
    else:
        ts = make_timesteps(cfg, num_inference_steps)
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(ac[0])

    prev_ts = ts - cfg.num_train_timesteps // num_inference_steps
    alpha_t = ac[ts]
    alpha_prev = np.where(prev_ts >= 0, ac[np.clip(prev_ts, 0, None)], final_alpha)

    a_t = np.sqrt((1.0 - alpha_prev) / (1.0 - alpha_t))
    b_t = np.sqrt(alpha_prev) - np.sqrt(alpha_t) * a_t

    # stochastic-DDIM tables (η > 0): σ² = η²·(1−ā_prev)/(1−ā_t)·(1−ā_t/ā_prev)
    var = (1.0 - alpha_prev) / (1.0 - alpha_t) * (1.0 - alpha_t / np.maximum(alpha_prev, 1e-20))
    std = eta * np.sqrt(np.maximum(var, 0.0))
    eps_coef = np.sqrt(np.maximum(1.0 - alpha_prev - std**2, 0.0))

    # coefficient tables stay HOST-side numpy: embedding them at trace time
    # costs no device->host fetch (ir_constant of a TPU-resident array must
    # round-trip through the axon tunnel, which fails mid-queue)
    return CogVideoXDDIMPlan(
        timesteps=ts,
        a_t=a_t.astype(np.float32),
        b_t=b_t.astype(np.float32),
        sqrt_alpha=np.sqrt(alpha_t).astype(np.float32),
        sqrt_beta=np.sqrt(1.0 - alpha_t).astype(np.float32),
        prediction_type=cfg.prediction_type,
        eta=float(eta),
        sqrt_alpha_prev=np.sqrt(alpha_prev).astype(np.float32),
        eps_coef=eps_coef.astype(np.float32),
        std=std.astype(np.float32),
    )


def predict_x0(plan, i, model_output: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """Model-output → x0 conversion for the configured prediction type."""
    sa = jnp.asarray(plan.sqrt_alpha)[i]
    sb = jnp.asarray(plan.sqrt_beta)[i]
    if plan.prediction_type == "v_prediction":
        return sa * sample - sb * model_output
    if plan.prediction_type == "epsilon":
        return (sample - sb * model_output) / sa
    if plan.prediction_type == "sample":
        return model_output
    raise ValueError(f"Unsupported prediction_type {plan.prediction_type!r}")


def predict_eps(plan, i, model_output: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """Model-output → ε conversion for the configured prediction type."""
    sa = jnp.asarray(plan.sqrt_alpha)[i]
    sb = jnp.asarray(plan.sqrt_beta)[i]
    if plan.prediction_type == "v_prediction":
        return sb * sample + sa * model_output
    if plan.prediction_type == "epsilon":
        return model_output
    if plan.prediction_type == "sample":
        return (sample - sa * model_output) / sb
    raise ValueError(f"Unsupported prediction_type {plan.prediction_type!r}")


def ddim_step(
    plan: CogVideoXDDIMPlan,
    i,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray = None,
) -> jnp.ndarray:
    """One DDIM step; ``i`` may be a traced index.

    Deterministic a_t/b_t update at η = 0 (the shipped path, bit-identical to
    before); at η > 0 the stochastic update
    ``sqrt(ā_prev)·x0 + sqrt(1−ā_prev−σ²)·ε + σ·noise`` with the pre-generated
    per-step ``noise`` (reference generator draw inside ``scheduler.step``)."""
    x0 = predict_x0(plan, i, model_output, sample)
    if plan.eta == 0.0:
        return jnp.asarray(plan.a_t)[i] * sample + jnp.asarray(plan.b_t)[i] * x0
    if noise is None:
        raise ValueError("ddim_step with eta > 0 needs the pre-generated per-step noise")
    eps = predict_eps(plan, i, model_output, sample)
    return (
        jnp.asarray(plan.sqrt_alpha_prev)[i] * x0
        + jnp.asarray(plan.eps_coef)[i] * eps
        + jnp.asarray(plan.std)[i] * noise
    )
