"""Int8-QK^T Pallas flash attention for DiT self-attention (opt-in).

The v5e MXU runs int8×int8→int32 at 2× its bf16 rate (measured ~360 TOP/s vs
197 TFLOP/s, docs/PERF.md), and at CogVideoX's head_dim 64 the QK^T pass is
charged a full 128-contraction regardless — so an int8 QK^T halves the cost
of one of the two matmul legs of attention. This kernel quantizes Q and K to
int8 with per-(head, block) scales and computes the logits on the int8 MXU;
softmax and the P·V pass stay in fp32/bf16 exactly as in the bf16 kernel
(``flash_attention.py``).

Accuracy design (the scheme is the TPU analog of SageAttention's int8 QK^T,
arXiv 2410.02367 — per-block quantization + K smoothing):

  * **K mean-centering is exact**: ``k' = k − mean_seq(k)`` shifts every
    logit in a query row by the constant ``q·mean(k)``, which softmax is
    invariant to. It removes the common-mode component of K so the int8
    range covers the informative part.
  * **Per-(batch·head, block) scales**: amax/127 over each Q/K block. DiT
    q/k rows are per-head LayerNormed (+RoPE, norm-preserving) right before
    attention, so row maxima within a block are tightly clustered and
    block-granular scales lose little precision vs per-token.
  * Scales ride the scalar-prefetch channel (SMEM) — no VMEM layout games.
  * The softmax scale and the base-2 change of base fold into the Q scales.

What it deliberately does NOT support (falls back to the bf16 kernel):
dense self-attention only — no causal/kv_len/bias, no fused qk prolog, and
``head_dim % 128 != 0`` (the fused row-sum augmentation; D=64 is the target —
D=128 models already run at 163 TFLOP/s in bf16 and gain less from int8).

Opt-in because int8 logits change numerics (~1e-2 relative on P): enable via
``alg_tpu.ops.attention.set_attention_int8(True)`` or the serving/bench int8
modes. Drift is bounded by ``tests/test_attention_int8.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def quantize_qk_int8(q: jnp.ndarray, k: jnp.ndarray, scale: float, block_q: int, block_k: int):
    """Quantize post-prolog q/k ``[B, H, S, D]`` for the int8 kernel.

    Returns ``(q_int8, k_int8, sq_blk, sk_blk)`` where the blocked scale
    arrays are ``[B·H, S/block]`` fp32; ``sq_blk`` has ``scale·log2(e)``
    folded in so the kernel's exp2 argument is ``logits_int · sq · sk``.
    K is mean-centered over the sequence first (softmax-exact, see module
    docstring). S must divide the block sizes (callers pad first).
    """
    b, h, s, d = q.shape
    assert s % block_q == 0 and s % block_k == 0

    k = k.astype(jnp.float32) - k.astype(jnp.float32).mean(axis=2, keepdims=True)
    q = q.astype(jnp.float32)

    def blocked(x, blk):
        xb = x.reshape(b * h, s // blk, blk * d)
        amax = jnp.max(jnp.abs(xb), axis=-1)
        sc = jnp.maximum(amax, 1e-6) / 127.0  # [BH, nblk]
        xi = jnp.clip(
            jnp.round(xb / sc[:, :, None]), -127, 127
        ).astype(jnp.int8)
        return xi.reshape(b * h, s, d), sc

    q_int, sq_blk = blocked(q, block_q)
    k_int, sk_blk = blocked(k, block_k)
    return q_int, k_int, (sq_blk * (scale * LOG2E)).astype(jnp.float32), sk_blk.astype(jnp.float32)


def quantize_v_int8(v: jnp.ndarray, d_aug: int):
    """Per-(batch·head, channel) int8 quantization of V ``[BH, S, D]`` for the
    int8 P·V pass, augmented to ``d_aug`` lanes: lane ``D`` is the fused
    row-sum ones column — stored as the constant 127 with scale 1/127 so the
    dequantized denominator uses exactly the same quantized-P values as the
    numerator (self-consistent softmax normalization); lanes > D are zero.

    Returns ``(v_int [BH, S, d_aug] int8, sv [BH, d_aug] f32)``. The valid-row
    masking of the ones column happens in-kernel (padding rows must not count).
    """
    bh, s, d = v.shape
    vf = v.astype(jnp.float32)
    amax = jnp.max(jnp.abs(vf), axis=1)  # [BH, D]
    sv = jnp.maximum(amax, 1e-6) / 127.0
    vi = jnp.clip(jnp.round(vf / sv[:, None, :]), -127, 127).astype(jnp.int8)
    vi = jnp.pad(vi, [(0, 0), (0, 0), (0, d_aug - d)])
    vi = vi.at[:, :, d].set(127)
    sv = jnp.pad(sv, [(0, 0), (0, d_aug - d)])
    sv = sv.at[:, d].set(1.0 / 127.0)
    return vi, sv


def _kernel(
    sq_ref,  # [BH·nq] f32 scalar-prefetch: folded q-block scales
    sk_ref,  # [BH·nk] f32 scalar-prefetch: k-block scales
    q_ref,  # [1, bq, d] int8
    k_ref,  # [1, bk, d] int8
    v_ref,  # [1, bk, d] bf16/f32  |  [1, bk, d_aug] int8 when pv_int8
    *rest,  # (sv_ref [1, d_aug] f32 when pv_int8,) o_ref, acc_scr
    d: int,
    d_aug: int,
    block_k: int,
    sk_orig: int,
    nq: int,
    nk: int,
    pv_int8: bool = False,
    no_exp2: bool = False,
):
    if pv_int8:
        sv_ref, o_ref, acc_scr = rest
    else:
        o_ref, acc_scr = rest
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s32 = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [bq, bk] int8 MXU pass
    sc = sq_ref[bh * nq + qi] * sk_ref[bh * nk + ki]
    # bounded-logit fast path (same argument as the bf16 kernel): dequantized
    # logits match the true ones to ~1%, so |logit·log2e| stays ≪ 120 and the
    # fp32 exp2 is exact without a running max
    if no_exp2:  # perf control: is the kernel VPU-bound? (wrong numerics)
        p = s32.astype(jnp.float32) * sc
    else:
        p = jnp.exp2(s32.astype(jnp.float32) * sc)

    k_start = ki * block_k
    if pv_int8:
        # int8 P·V: per-(row, tile) scales on P (p > 0, so amax = rowmax);
        # V arrives pre-quantized per channel with the ones column at lane d
        # (quantize_v_int8). Both MXU legs now run at the 2x int8 rate; the
        # per-tile dequant fma is VPU work overlapped under the MXU.
        # Padded key columns (k_int = 0 ⇒ p = 1) are zeroed BEFORE the row
        # max: a spurious p = 1 would otherwise set the scale and crush the
        # real (possibly ≪ 1) probabilities to zero codes.
        kcol = k_start + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(kcol < sk_orig, p, 0.0)
        srow = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-37)  # [bq, 1]
        pi = jnp.round(p * (127.0 / srow)).astype(jnp.int8)
        acc32 = jax.lax.dot_general(
            pi, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc_scr[:] += acc32.astype(jnp.float32) * (srow * (1.0 / 127.0)) * sv_ref[0]
    else:
        # fused row-sum: ones column at lane d on valid key rows only — padded
        # keys (k_int = 0 ⇒ p = 1) contribute nothing to numerator (v rows
        # zero) or denominator (ones column zero)
        vrow = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, d_aug - d), 0)
        vlane = jax.lax.broadcasted_iota(jnp.int32, (block_k, d_aug - d), 1)
        extra = ((vlane == 0) & (vrow < sk_orig)).astype(v_ref.dtype)
        v_aug = jnp.concatenate([v_ref[0], extra], axis=1)  # [bk, d_aug]

        acc_scr[:] += jax.lax.dot_general(
            p.astype(v_aug.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_scr[:, d:d + 1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:, :d] / safe_l).astype(o_ref.dtype)


def _aligned_or_pad(s: int, default_q: int, default_k: int):
    """Block choice under the int8 kernel's VMEM pressure: both the int32
    logits tile and its fp32 exp2 live at [bq, bk]·4B, so bq·bk must stay
    ≤ ~1.3M elements (2 × 5.2 MB at 808×1616) inside the 16 MB scoped limit."""
    from alg_tpu.ops.flash_attention import _aligned_block

    cap = 808 * 1616  # measured-good joint tile (2 × 5.2 MB) — enforce it
    if s % default_q == 0 and s % default_k == 0:
        return default_q, default_k, s
    aq = _aligned_block(s, hi=1024)
    ak = _aligned_block(s, hi=2048)
    while aq and ak and aq * ak > cap:
        aq = _aligned_block(s, lo=256, hi=aq - 8)
    if aq and ak:
        return aq, ak, s
    sp = -(-s // default_k) * default_k
    return default_q, default_k, sp


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "pv_int8", "interpret", "no_exp2"),
)
def flash_attention_int8(
    q: jnp.ndarray,  # [B, H, S, D] bf16/f32 (post norm+rope)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
    pv_int8: bool = False,
    interpret: bool = False,
    no_exp2: bool = False,  # perf control only — wrong numerics
) -> jnp.ndarray:
    """Dense self-attention with int8 QK^T (see module docstring).

    ``pv_int8=True`` additionally runs the P·V pass on the int8 MXU: P
    quantizes per (query row, tile) — positive with rowmax = amax, so the
    scale is exact — and V per (batch·head, channel) via
    :func:`quantize_v_int8`; the fp32 accumulator dequantizes per tile.
    Both attention matmuls then run at the 2x int8 rate. Extra drift vs
    QK^T-only is ~the P rounding error (0.4 % of each row's max), bounded
    in tests/test_attention_int8.py.
    """
    b, h, s, d = q.shape
    if d % 128 == 0:
        raise ValueError("int8 kernel targets head_dim % 128 != 0 (fused row-sum)")
    if k.shape[2] != s:
        raise ValueError("int8 kernel is self-attention only")
    block_q, block_k, sp = _aligned_or_pad(s, block_q, block_k)
    if sp != s:
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    q_int, k_int, sq_blk, sk_blk = quantize_qk_int8(q, k, scale, block_q, block_k)
    vp = v.reshape(b * h, sp, d)
    nq, nk = sp // block_q, sp // block_k
    d_aug = -(-(d + 1) // 128) * 128

    kernel = functools.partial(
        _kernel, d=d, d_aug=d_aug, block_k=block_k, sk_orig=s, nq=nq, nk=nk,
        pv_int8=pv_int8, no_exp2=no_exp2,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, *_: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, *_: (bh, ki, 0), memory_space=pltpu.VMEM),
    ]
    if pv_int8:
        v_int, sv = quantize_v_int8(vp, d_aug)
        inputs = (sq_blk.reshape(-1), sk_blk.reshape(-1), q_int, k_int, v_int, sv)
        in_specs += [
            pl.BlockSpec((1, block_k, d_aug), lambda bh, qi, ki, *_: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_aug), lambda bh, qi, ki, *_: (bh, 0), memory_space=pltpu.VMEM),
        ]
        v_bytes = v_int.size + sv.size * 4
    else:
        inputs = (sq_blk.reshape(-1), sk_blk.reshape(-1), q_int, k_int, vp)
        in_specs += [
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, *_: (bh, ki, 0), memory_space=pltpu.VMEM),
        ]
        v_bytes = vp.size * vp.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * h, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, *_: (bh, qi, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_q, d_aug), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=(q_int.size + k_int.size) + v_bytes,
            transcendentals=b * h * sp * sp,
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, h, sp, d)[:, :, :s]
