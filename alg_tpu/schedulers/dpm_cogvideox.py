"""CogVideoX DPM scheduler (SDE-DPM-Solver++(2M) variant) — pure-JAX.

Reproduces the diffusers ``CogVideoXDPMScheduler`` used by the reference when
the model ships a DPM scheduler (``pipeline_cogvideox_image2video_lowpass.py:
1113-1122``): same noise schedule as the CogVideoX DDIM (SNR shift +
zero-terminal-SNR), v-prediction → x0, then the stochastic update

    λ_t    = log(sqrt(ā_t / (1-ā_t)));  h = λ_prev − λ_t;  r = h_last / h
    mult1  = sqrt((1-ā_prev)/(1-ā_t)) · exp(−h)
    mult2  = expm1(−2h) · sqrt(ā_prev)
    σ_n    = sqrt(1-ā_prev) · sqrt(1 − exp(−2h))
    D      = (1 + 1/(2r)) x0 − (1/(2r)) x0_old        (2nd order; x0 on step 0)
    prev   = mult1 · sample − mult2 · D + σ_n · noise

The ``old_pred_original_sample`` threading of the reference loop becomes
scheduler state carried through ``lax.scan``. The step index and timestep grid
are static, so every scalar above is a precomputed ``[T]`` table; per-step
noise is supplied by the caller (pre-generated host-side for torch parity, or
folded JAX PRNG keys).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from alg_tpu.schedulers.ddim_cogvideox import (
    CogVideoXDDIMConfig,
    make_alphas_cumprod,
    make_timesteps,
)


@dataclasses.dataclass(frozen=True)
class CogVideoXDPMPlan:
    timesteps: jnp.ndarray  # [T] int
    mult1: jnp.ndarray  # [T]
    mult2: jnp.ndarray  # [T]
    mult3: jnp.ndarray  # [T]  (1 + 1/(2r); 1.0 on step 0 → D = x0)
    mult4: jnp.ndarray  # [T]  (1/(2r); 0.0 on step 0)
    mult_noise: jnp.ndarray  # [T]
    sqrt_alpha: jnp.ndarray  # [T]
    sqrt_beta: jnp.ndarray  # [T]
    prediction_type: str
    init_noise_sigma: float = 1.0


def make_dpm_plan(cfg: CogVideoXDDIMConfig, num_inference_steps: int, timesteps=None) -> CogVideoXDPMPlan:
    ac = make_alphas_cumprod(cfg)
    if timesteps is not None:
        ts = np.asarray(timesteps, dtype=np.int64)
        num_inference_steps = len(ts)
    else:
        ts = make_timesteps(cfg, num_inference_steps)
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(ac[0])

    prev_ts = ts - cfg.num_train_timesteps // num_inference_steps
    a_t = ac[ts]
    a_prev = np.where(prev_ts >= 0, ac[np.clip(prev_ts, 0, None)], final_alpha)
    # "back" timestep = previous loop iteration's t (reference passes
    # timesteps[i-1]; None on step 0 → first-order update)
    a_back = np.concatenate([[a_t[0]], a_t[:-1]])

    # step 0: a_back == a_t (λ diff is 0/0 with zero-terminal-SNR ā=0) — its
    # second-order coefficients are overwritten below, so silence the NaNs
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.log(np.sqrt(a_t / (1.0 - a_t)))
        lam_prev = np.log(np.sqrt(a_prev / np.maximum(1.0 - a_prev, 1e-20)))
        lam_back = np.log(np.sqrt(a_back / (1.0 - a_back)))
        h = lam_prev - lam
        h_last = lam - lam_back
        r = h_last / h

    mult1 = np.sqrt((1.0 - a_prev) / (1.0 - a_t)) * np.exp(-h)
    mult2 = np.expm1(-2.0 * h) * np.sqrt(a_prev)
    mult_noise = np.sqrt(1.0 - a_prev) * np.sqrt(1.0 - np.exp(-2.0 * h))
    mult3 = 1.0 + 1.0 / (2.0 * r)
    mult4 = 1.0 / (2.0 * r)
    # step 0 has no history: first-order update (D = x0)
    mult3[0] = 1.0
    mult4[0] = 0.0

    # tables stay host-side numpy (no device fetch at trace time)
    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return CogVideoXDPMPlan(
        timesteps=ts,
        mult1=f32(mult1),
        mult2=f32(mult2),
        mult3=f32(mult3),
        mult4=f32(mult4),
        mult_noise=f32(mult_noise),
        sqrt_alpha=f32(np.sqrt(a_t)),
        sqrt_beta=f32(np.sqrt(1.0 - a_t)),
        prediction_type=cfg.prediction_type,
    )


def dpm_step(
    plan: CogVideoXDPMPlan,
    i,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    old_pred_x0: jnp.ndarray,
    noise: jnp.ndarray,
):
    """One SDE-DPM++ step. Returns ``(prev_sample, pred_x0)``.

    ``old_pred_x0`` is the previous step's returned ``pred_x0`` (contents
    ignored on step 0 — the plan zeroes its coefficient). ``noise`` is a
    standard-normal tensor shaped like ``sample``.
    """
    t = lambda tab: jnp.asarray(tab)
    if plan.prediction_type == "v_prediction":
        x0 = t(plan.sqrt_alpha)[i] * sample - t(plan.sqrt_beta)[i] * model_output
    elif plan.prediction_type == "epsilon":
        x0 = (sample - t(plan.sqrt_beta)[i] * model_output) / t(plan.sqrt_alpha)[i]
    else:
        x0 = model_output
    denoised_d = t(plan.mult3)[i] * x0 - t(plan.mult4)[i] * old_pred_x0
    prev = t(plan.mult1)[i] * sample - t(plan.mult2)[i] * denoised_d + t(plan.mult_noise)[i] * noise
    return prev, x0
