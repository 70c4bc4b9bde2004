"""Flow-matching Euler scheduler — pure-JAX.

Reproduces the diffusers ``FlowMatchEulerDiscreteScheduler`` configuration the
reference uses for HunyuanVideo (``run.py:82-86``: ``flow_shift`` +
``invert_sigmas`` from YAML; explicit ``sigmas = linspace(1, 0, steps+1)[:-1]``
passed by the pipeline, ``pipeline_hunyuan_video_image2video_lowpass.py:
1111-1112``) and Wan's default flow-matching path.

Sigma grid (static per run):
    σ_i  (from linspace or custom)  →  time shift  σ' = s·σ / (1 + (s−1)·σ)
    invert_sigmas: σ ← 1 − σ (ascending grid, terminal 1); else terminal 0.
    timesteps = σ' · num_train_timesteps

Step:  x_{i+1} = x_i + (σ_{i+1} − σ_i) · v   — one gather + one FMA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerConfig:
    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False
    invert_sigmas: bool = False


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerPlan:
    timesteps: jnp.ndarray  # [T] float32
    sigmas: jnp.ndarray  # [T+1] float32 (terminal appended)
    init_noise_sigma: float = 1.0


def make_flow_match_euler_plan(
    cfg: FlowMatchEulerConfig,
    num_inference_steps: Optional[int] = None,
    sigmas: Optional[Sequence[float]] = None,
) -> FlowMatchEulerPlan:
    """Build the sigma/timestep grid; pass either a step count or custom sigmas."""
    if sigmas is None:
        if num_inference_steps is None:
            raise ValueError("Provide num_inference_steps or sigmas")
        # default grid: timesteps linspace(t_max, 1) → σ = t / T
        ts = np.linspace(1.0, cfg.num_train_timesteps, num_inference_steps, dtype=np.float64)[::-1]
        sig = ts / cfg.num_train_timesteps
    else:
        sig = np.asarray(sigmas, dtype=np.float64)

    if not cfg.use_dynamic_shifting:
        sig = cfg.shift * sig / (1.0 + (cfg.shift - 1.0) * sig)

    if cfg.invert_sigmas:
        sig = 1.0 - sig
        ts_out = sig * cfg.num_train_timesteps
        sig_full = np.concatenate([sig, [1.0]])
    else:
        ts_out = sig * cfg.num_train_timesteps
        sig_full = np.concatenate([sig, [0.0]])

    # tables stay host-side numpy (no device fetch at trace time)
    return FlowMatchEulerPlan(
        timesteps=ts_out.astype(np.float32),
        sigmas=sig_full.astype(np.float32),
    )


def flow_match_euler_step(plan: FlowMatchEulerPlan, i, model_output: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """x_{i+1} = x_i + (σ_{i+1} − σ_i) · v. fp32 accumulate (diffusers casts too)."""
    sig = jnp.asarray(plan.sigmas)
    dt = sig[i + 1] - sig[i]
    return (sample.astype(jnp.float32) + dt * model_output.astype(jnp.float32)).astype(sample.dtype)
