"""UniPC multistep scheduler (flow-sigma variant) — pure-JAX, fully precomputed.

Reproduces the diffusers ``UniPCMultistepScheduler`` configuration the
reference uses for Wan (``run.py:63``: re-initialized with ``flow_shift``;
``use_flow_sigmas=True``, ``prediction_type="flow_prediction"``,
``solver_order=2``, ``predict_x0=True``, ``solver_type="bh2"``,
``lower_order_final=True``).

TPU-native reformulation: UniPC's predictor (UniP) and corrector (UniC)
updates are linear combinations of the current sample, the stored x0
predictions, and the fresh x0 prediction, with scalar weights that depend only
on the (static) sigma grid and step index — the R/b linear systems, φ-function
values and r-ratios are all step-index functions. We therefore solve every
system host-side at plan time and bake the results into ``[T]`` /
``[T, order-1]`` coefficient tables. The in-loop step is pure fused
multiply-adds over a small ring of x0 buffers carried through ``lax.scan`` —
no linear solves, no data-dependent control flow, no host sync.

Update equations implemented (bh-form, predict_x0):
    hh = −h,  φ₁ = expm1(hh),  B_h = expm1(hh) (bh2) | hh (bh1)
    UniP:  x_{i+1} = (σ_{i+1}/σ_i)·x − α_{i+1}·φ₁·m_i − α_{i+1}·B_h·Σ_k ρᵖ_k·(m_{i−k}−m_i)/r_k
    UniC:  x_i ← (σ_i/σ_{i−1})·x_{i−1} − α_i·φ₁·m_{i−1}
                 − α_i·B_h·[Σ_k ρᶜ_k·(m_{i−1−k}−m_{i−1})/r_k + ρᶜ_last·(m_i−m_{i−1})]
with m = x0 predictions (flow: m = sample − σ·v), λ = log((1−σ)/σ),
h = λ_next − λ_cur, r_k = (λ_{−k} − λ_cur)/h, and ρ solved from the
Vandermonde-in-r system R ρ = b (b_j = j!·φ_{j+1}/B_h).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UniPCConfig:
    num_train_timesteps: int = 1000
    solver_order: int = 2
    flow_shift: float = 1.0
    solver_type: str = "bh2"  # bh1 | bh2
    lower_order_final: bool = True
    use_flow_sigmas: bool = True
    prediction_type: str = "flow_prediction"


def _lambda(sig: float) -> float:
    return float(np.log(1.0 - sig) - np.log(sig))


def _phi_b_coeffs(h: float, order: int, solver_type: str):
    """b vector of the UniPC system for signed step hh = -h (predict_x0)."""
    hh = -h
    h_phi_1 = np.expm1(hh)
    b_h = np.expm1(hh) if solver_type == "bh2" else hh
    b = []
    h_phi_k = h_phi_1 / hh - 1.0
    factorial_i = 1.0
    for j in range(1, order + 1):
        b.append(h_phi_k * factorial_i / b_h)
        factorial_i *= j + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    return np.array(b, dtype=np.float64), h_phi_1, b_h


@dataclasses.dataclass(frozen=True)
class UniPCPlan:
    timesteps: jnp.ndarray  # [T] int64 (diffusers casts flow timesteps to int)
    sigmas: jnp.ndarray  # [T+1] float32
    # predictor tables
    p_cx: jnp.ndarray  # [T]   σ_{i+1}/σ_i
    p_cm0: jnp.ndarray  # [T]  α_{i+1}·φ₁
    p_cd: jnp.ndarray  # [T, order-1]  α_{i+1}·B_h·ρᵖ_k / r_k  (0-padded)
    # corrector tables (row i corrects the sample arriving at step i)
    c_mask: jnp.ndarray  # [T]  1.0 where the corrector applies (i ≥ 1)
    c_cx: jnp.ndarray  # [T]   σ_i/σ_{i-1}
    c_cm0: jnp.ndarray  # [T]  α_i·φ₁(h_c)
    c_cd: jnp.ndarray  # [T, order-1]  α_i·B_h·ρᶜ_k / r_k  (0-padded)
    c_ct: jnp.ndarray  # [T]  α_i·B_h·ρᶜ_last
    solver_order: int
    init_noise_sigma: float = 1.0


class UniPCState(NamedTuple):
    """Scan-carried solver state.

    ``m``: x0-prediction history ``(m_{i-1}, m_{i-2}, ..., m_{i-order})``
    (zeros before they exist — their plan coefficients are zero then).
    ``last_sample``: the corrected sample of the previous step (UniC input).
    """

    m: tuple
    last_sample: jnp.ndarray


def _solve_rhos(r_ks: np.ndarray, b: np.ndarray, order: int, corrector: bool) -> np.ndarray:
    """ρ weights. diffusers special-cases small orders to closed forms."""
    rks = np.concatenate([r_ks, [1.0]])
    if corrector:
        if order == 1:
            return np.array([0.5])
        big_r = np.stack([rks ** (j) for j in range(order)])  # R[j,k] = r_k^j
        return np.linalg.solve(big_r, b)
    else:
        if order == 1:
            return np.zeros(0)
        if order == 2:
            return np.array([0.5])
        big_r = np.stack([rks ** (j) for j in range(order)])
        return np.linalg.solve(big_r[:-1, :-1], b[:-1])


def make_unipc_plan(
    cfg: UniPCConfig,
    num_inference_steps: Optional[int] = None,
    sigmas: Optional[Sequence[float]] = None,
) -> UniPCPlan:
    if not cfg.use_flow_sigmas:
        raise NotImplementedError("Only the flow-sigma UniPC variant is implemented (Wan path)")
    if sigmas is None:
        n = num_inference_steps
        alphas = np.linspace(1.0, 1.0 / cfg.num_train_timesteps, n + 1, dtype=np.float64)
        sig = 1.0 - alphas
        sig = np.flip(cfg.flow_shift * sig / (1.0 + (cfg.flow_shift - 1.0) * sig))[:-1].copy()
    else:
        sig = np.asarray(sigmas, dtype=np.float64)
        n = len(sig)
    timesteps = (sig * cfg.num_train_timesteps).astype(np.int64)
    sig_full = np.concatenate([sig, [0.0]])

    order = cfg.solver_order
    lam = [(_lambda(s) if s > 0 else np.inf) for s in sig_full]

    # static per-step orders (diffusers warmup + lower_order_final semantics)
    p_order = [min(order, i + 1, (n - i) if cfg.lower_order_final else order) for i in range(n)]
    c_order = [p_order[i - 1] if i > 0 else 1 for i in range(n)]

    p_cx = np.zeros(n)
    p_cm0 = np.zeros(n)
    p_cd = np.zeros((n, max(order - 1, 1)))
    c_mask = np.zeros(n)
    c_cx = np.zeros(n)
    c_cm0 = np.zeros(n)
    c_cd = np.zeros((n, max(order - 1, 1)))
    c_ct = np.zeros(n)

    for i in range(n):
        # ---- predictor: σ_i → σ_{i+1}
        s_cur, s_next = sig_full[i], sig_full[i + 1]
        a_next = 1.0 - s_next
        if s_next == 0.0:
            # terminal step: λ→∞, φ₁→−1, B_h→−1; update degenerates to x=m_i
            p_cx[i] = 0.0
            p_cm0[i] = -1.0
        else:
            h = lam[i + 1] - lam[i]
            b, h_phi_1, b_h = _phi_b_coeffs(h, p_order[i], cfg.solver_type)
            r_ks = np.array([(lam[i - k] - lam[i]) / h for k in range(1, p_order[i])])
            rhos_p = _solve_rhos(r_ks, b, p_order[i], corrector=False)
            p_cx[i] = s_next / s_cur
            p_cm0[i] = a_next * h_phi_1
            for k in range(1, p_order[i]):
                p_cd[i, k - 1] = a_next * b_h * rhos_p[k - 1] / r_ks[k - 1]

        # ---- corrector: recompute arrival at σ_i from σ_{i-1}
        if i > 0:
            c_mask[i] = 1.0
            s_prev = sig_full[i - 1]
            a_cur = 1.0 - s_cur
            h_c = lam[i] - lam[i - 1]
            oc = c_order[i]
            b, h_phi_1, b_h = _phi_b_coeffs(h_c, oc, cfg.solver_type)
            r_ks = np.array([(lam[i - 1 - k] - lam[i - 1]) / h_c for k in range(1, oc)])
            rhos_c = _solve_rhos(r_ks, b, oc, corrector=True)
            c_cx[i] = s_cur / s_prev
            c_cm0[i] = a_cur * h_phi_1
            for k in range(1, oc):
                c_cd[i, k - 1] = a_cur * b_h * rhos_c[k - 1] / r_ks[k - 1]
            c_ct[i] = a_cur * b_h * rhos_c[-1]

    # tables stay host-side numpy (no device fetch at trace time)
    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return UniPCPlan(
        timesteps=timesteps,
        sigmas=f32(sig_full),
        p_cx=f32(p_cx),
        p_cm0=f32(p_cm0),
        p_cd=f32(p_cd),
        c_mask=f32(c_mask),
        c_cx=f32(c_cx),
        c_cm0=f32(c_cm0),
        c_cd=f32(c_cd),
        c_ct=f32(c_ct),
        solver_order=order,
    )


def unipc_init_state(plan: UniPCPlan, sample_shape) -> UniPCState:
    # corrector at order o reaches back to m_{i-o} → keep `solver_order` buffers
    m = tuple(jnp.zeros(sample_shape, jnp.float32) for _ in range(plan.solver_order))
    return UniPCState(m=m, last_sample=jnp.zeros(sample_shape, jnp.float32))


def unipc_step(
    plan: UniPCPlan,
    i,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    state: UniPCState,
):
    """One UniC-then-UniP step. Returns ``(prev_sample, new_state)``.

    ``sample`` is the previous predictor's output at σ_i; ``model_output`` is
    the model evaluation at (sample, t_i). Mirrors diffusers' step(): convert
    to x0, correct the incoming sample using it, then predict σ_{i+1}.
    """
    x = sample.astype(jnp.float32)
    v = model_output.astype(jnp.float32)
    t = lambda tab: jnp.asarray(tab)
    sigma_i = t(plan.sigmas)[i]
    m_t = x - sigma_i * v  # flow_prediction → x0

    m_hist = [mm.astype(jnp.float32) for mm in state.m]  # m_hist[0] = m_{i-1}, [1] = m_{i-2}, ...
    m0 = m_hist[0]

    # ---- corrector (no-op at i=0 via mask)
    corr = t(plan.c_cx)[i] * state.last_sample.astype(jnp.float32) - t(plan.c_cm0)[i] * m0
    res = t(plan.c_ct)[i] * (m_t - m0)
    for k in range(1, plan.solver_order):
        res = res + t(plan.c_cd)[i, k - 1] * (m_hist[k] - m0)
    corr = corr - res
    x_used = jnp.where(t(plan.c_mask)[i] > 0, corr, x)

    # ---- predictor
    prev = t(plan.p_cx)[i] * x_used - t(plan.p_cm0)[i] * m_t
    for k in range(1, plan.solver_order):
        prev = prev - t(plan.p_cd)[i, k - 1] * (m_hist[k - 1] - m_t)

    new_m = tuple([m_t] + m_hist[:-1])
    new_state = UniPCState(m=new_m, last_sample=x_used)
    return prev.astype(sample.dtype), new_state
