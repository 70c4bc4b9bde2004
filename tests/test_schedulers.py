"""Scheduler math tests via exact analytic invariants.

No diffusers in the environment (zero egress), so instead of golden files these
tests verify the algebraic identities each solver must satisfy exactly:
  * DDIM: maps points on a fixed (x0, eps) trajectory onto the same trajectory.
  * SDE-DPM++: preserves the forward marginal coefficients (x0/noise algebra).
  * Flow solvers: integrate straight-line (constant-velocity) paths exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from alg_tpu.schedulers import (
    CogVideoXDDIMConfig,
    FlowMatchEulerConfig,
    UniPCConfig,
    ddim_step,
    dpm_step,
    flow_match_euler_step,
    make_ddim_plan,
    make_dpm_plan,
    make_flow_match_euler_plan,
    make_unipc_plan,
    unipc_init_state,
    unipc_step,
)
from alg_tpu.schedulers.ddim_cogvideox import make_alphas_cumprod, make_timesteps

pytestmark = pytest.mark.fast


def test_ddim_timesteps_trailing():
    cfg = CogVideoXDDIMConfig()
    ts = make_timesteps(cfg, 50)
    assert ts[0] == 999 and ts[1] == 979 and ts[-1] == 19 and len(ts) == 50


def test_alphas_cumprod_zero_terminal_snr():
    cfg = CogVideoXDDIMConfig()
    ac = make_alphas_cumprod(cfg)
    assert ac.shape == (1000,)
    assert abs(ac[-1]) < 1e-12  # zero terminal SNR
    assert 0.99 < ac[0] <= 1.0
    # SNR shift identity at scale 1
    ac_noshift = make_alphas_cumprod(
        CogVideoXDDIMConfig(snr_shift_scale=1.0, rescale_betas_zero_snr=False)
    )
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    np.testing.assert_allclose(ac_noshift, np.cumprod(1 - betas), rtol=1e-10)


def test_ddim_stays_on_trajectory(rng):
    cfg = CogVideoXDDIMConfig()
    plan = make_ddim_plan(cfg, 50)
    ac = make_alphas_cumprod(cfg)
    x0 = rng.randn(2, 4, 6).astype(np.float32)
    eps = rng.randn(2, 4, 6).astype(np.float32)

    ts = np.asarray(plan.timesteps)
    sample = np.sqrt(ac[ts[0]]) * x0 + np.sqrt(1 - ac[ts[0]]) * eps
    sample = jnp.asarray(sample.astype(np.float32))
    for i in range(50):
        t = ts[i]
        a = ac[t]
        v = (np.sqrt(a) * eps - np.sqrt(1 - a) * x0).astype(np.float32)
        sample = ddim_step(plan, i, jnp.asarray(v), sample)
        prev_t = t - 1000 // 50
        a_prev = ac[prev_t] if prev_t >= 0 else 1.0
        expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(np.asarray(sample), expected, atol=5e-5)
    # terminal step lands exactly on x0 (final_alpha_cumprod = 1)
    np.testing.assert_allclose(np.asarray(sample), x0, atol=5e-5)


def test_dpm_marginal_preservation():
    cfg = CogVideoXDDIMConfig()
    plan = make_dpm_plan(cfg, 50)
    ac = make_alphas_cumprod(cfg)
    ts = np.asarray(plan.timesteps)
    s_t = np.sqrt(ac[ts])
    c_t = np.sqrt(1 - ac[ts])
    prev_ts = ts - 20
    a_prev = np.where(prev_ts >= 0, ac[np.clip(prev_ts, 0, None)], 1.0)
    s_p, c_p = np.sqrt(a_prev), np.sqrt(1 - a_prev)

    m1 = np.asarray(plan.mult1)
    m2 = np.asarray(plan.mult2)
    mn = np.asarray(plan.mult_noise)
    # x0 coefficient: mult1·s_t − mult2 == s_prev
    np.testing.assert_allclose(m1 * s_t - m2, s_p, atol=2e-5)
    # noise variance: (mult1·c_t)² + mult_noise² == c_prev²
    np.testing.assert_allclose((m1 * c_t) ** 2 + mn**2, c_p**2, atol=2e-5)
    # second-order weights are an extrapolation: mult3 - mult4 == 1
    np.testing.assert_allclose(np.asarray(plan.mult3) - np.asarray(plan.mult4), 1.0, atol=1e-6)
    assert np.asarray(plan.mult4)[0] == 0.0  # no history at step 0


def test_dpm_step_constant_x0(rng):
    # with exact (constant) x0 predictions and zero noise, the deterministic
    # part of the update must land on the posterior-mean trajectory coefficient
    cfg = CogVideoXDDIMConfig()
    plan = make_dpm_plan(cfg, 10)
    x0 = rng.randn(3, 5).astype(np.float32)
    ac = make_alphas_cumprod(cfg)
    ts = np.asarray(plan.timesteps)
    sample = jnp.asarray((np.sqrt(ac[ts[0]]) * x0).astype(np.float32))
    old = jnp.zeros_like(sample)
    zero_noise = jnp.zeros_like(sample)
    for i in range(10):
        a = ac[ts[i]]
        v = (-np.sqrt(1 - a) * x0).astype(np.float32)  # eps=0 trajectory
        v = (np.sqrt(a) * np.zeros_like(x0) - np.sqrt(1 - a) * x0).astype(np.float32)
        sample, old = dpm_step(plan, i, jnp.asarray(v), sample, old, zero_noise)
        np.testing.assert_allclose(np.asarray(old), x0, atol=1e-4)  # x0 recovered each step
    np.testing.assert_allclose(np.asarray(sample), x0, atol=1e-3)


def test_flow_euler_grid_hunyuan():
    # Hunyuan: custom sigmas linspace(1,0,steps+1)[:-1], shift 7.0
    sig = np.linspace(1.0, 0.0, 11)[:-1]
    plan = make_flow_match_euler_plan(FlowMatchEulerConfig(shift=7.0), sigmas=sig)
    expected = 7.0 * sig / (1 + 6.0 * sig)
    np.testing.assert_allclose(np.asarray(plan.sigmas)[:-1], expected, rtol=1e-6)
    assert np.asarray(plan.sigmas)[-1] == 0.0
    np.testing.assert_allclose(np.asarray(plan.timesteps), expected * 1000, rtol=1e-6)
    assert np.asarray(plan.sigmas)[0] == 1.0  # shift keeps σ=1 fixed


def test_flow_euler_invert_sigmas():
    sig = np.linspace(1.0, 0.0, 6)[:-1]
    plan = make_flow_match_euler_plan(FlowMatchEulerConfig(shift=2.0, invert_sigmas=True), sigmas=sig)
    shifted = 2.0 * sig / (1 + sig)
    np.testing.assert_allclose(np.asarray(plan.sigmas)[:-1], 1 - shifted, rtol=1e-6)
    assert np.asarray(plan.sigmas)[-1] == 1.0


def test_flow_euler_exact_on_straight_path(rng):
    x0 = rng.randn(2, 3).astype(np.float32)
    eps = rng.randn(2, 3).astype(np.float32)
    plan = make_flow_match_euler_plan(FlowMatchEulerConfig(shift=5.0), num_inference_steps=8)
    sigmas = np.asarray(plan.sigmas)
    sample = jnp.asarray(sigmas[0] * eps + (1 - sigmas[0]) * x0)
    v = jnp.asarray(eps - x0)  # constant velocity ⇒ Euler is exact
    for i in range(8):
        sample = flow_match_euler_step(plan, i, v, sample)
        expected = sigmas[i + 1] * eps + (1 - sigmas[i + 1]) * x0
        np.testing.assert_allclose(np.asarray(sample), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sample), x0, atol=1e-5)


def test_unipc_grid_wan():
    plan = make_unipc_plan(UniPCConfig(flow_shift=5.0), num_inference_steps=50)
    sig = np.asarray(plan.sigmas)
    assert len(sig) == 51 and sig[-1] == 0.0
    assert sig[0] > sig[1] > sig[-2] > 0
    # first sigma: alphas linspace(1, 1e-3, 51) → raw σ_max = 1 - 1/1000 shifted
    raw = 1.0 - 1.0 / 1000
    np.testing.assert_allclose(sig[0], 5 * raw / (1 + 4 * raw), rtol=1e-6)
    ts = np.asarray(plan.timesteps)
    assert np.issubdtype(ts.dtype, np.integer) and ts[0] == int(sig[0] * 1000)


def test_unipc_exact_on_straight_path(rng):
    x0 = rng.randn(2, 4).astype(np.float32)
    eps = rng.randn(2, 4).astype(np.float32)
    plan = make_unipc_plan(UniPCConfig(flow_shift=3.0, solver_order=2), num_inference_steps=12)
    sigmas = np.asarray(plan.sigmas)
    sample = jnp.asarray(sigmas[0] * eps + (1 - sigmas[0]) * x0)
    state = unipc_init_state(plan, sample.shape)
    v = jnp.asarray(eps - x0)
    for i in range(12):
        sample, state = unipc_step(plan, i, v, sample, state)
        expected = sigmas[i + 1] * eps + (1 - sigmas[i + 1]) * x0
        np.testing.assert_allclose(np.asarray(sample), expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sample), x0, atol=1e-4)


def test_unipc_beats_euler_on_exponential_ode():
    """Order-2 UniPC must integrate dx/dσ = k·x far more accurately than
    order-1 Euler on the *same* sigma grid (analytic solution known)."""
    k = 1.3
    n = 16
    plan_u = make_unipc_plan(UniPCConfig(flow_shift=1.0, solver_order=2), num_inference_steps=n)
    sig = np.asarray(plan_u.sigmas, dtype=np.float64)
    plan_e = make_flow_match_euler_plan(FlowMatchEulerConfig(shift=1.0), sigmas=sig[:-1])
    true_final = 2.0 * np.exp(-k * sig[0])

    x = jnp.asarray(np.array([2.0], dtype=np.float32))
    for i in range(n):
        x = flow_match_euler_step(plan_e, i, k * x, x)
    err_euler = abs(float(np.asarray(x)[0]) - true_final)

    x = jnp.asarray(np.array([2.0], dtype=np.float32))
    state = unipc_init_state(plan_u, x.shape)
    for i in range(n):
        x, state = unipc_step(plan_u, i, k * x, x, state)
    err_unipc = abs(float(np.asarray(x)[0]) - true_final)

    assert err_unipc < err_euler / 5, (err_unipc, err_euler)
    assert err_unipc < 5e-3
