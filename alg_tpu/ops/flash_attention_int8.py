"""Int8 Pallas flash attention for DiT self-attention (opt-in).

The v5e MXU runs int8×int8→int32 at 2× its bf16 rate (measured ~360 TOP/s vs
197 TFLOP/s, docs/PERF.md), and at CogVideoX's head_dim 64 the QK^T pass is
charged a full 128-contraction regardless — so an int8 QK^T halves the cost
of one of the two matmul legs of attention. This kernel quantizes Q and K to
int8 with per-(head, block) scales and computes the logits on the int8 MXU;
softmax stays in fp32. The P·V pass is bf16 by default (``"qk"`` mode) and
optionally also int8 (``pv_int8=True`` / ``"full"`` mode): P quantizes
per (query row, tile) with exact rowmax scales and V per (head, channel), so
BOTH attention matmuls run at the 2× int8 rate.

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

Head-dim handling: when ``head_dim % 128 != 0`` (CogVideoX D=64) the idle MXU
output lanes carry a fused row-sum ones column; when ``head_dim % 128 == 0``
(Wan/Hunyuan D=128 — no idle lanes) the softmax denominator accumulates in a
separate VPU scratch instead, same as the bf16 kernel's non-fused path.

What it deliberately does NOT support (falls back to the bf16 kernel):
dense self-attention only — no causal/bias and no fused qk prolog.
``kv_len`` (per-batch valid key length — Hunyuan's joint video+text
sequence) IS supported: the bound rides the scalar-prefetch channel.

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
    int8 P·V pass. When ``d_aug > D`` (head_dim not a lane multiple — the
    fused-row-sum layout), lane ``D`` is the fused row-sum ones column —
    stored as the constant 127 with scale 1/127 so the dequantized
    denominator uses exactly the same quantized-P values as the numerator
    (self-consistent softmax normalization); lanes > D are zero. With
    ``d_aug == D`` (head_dim % 128 == 0 — Wan/Hunyuan) no augmentation is
    applied; the kernel accumulates the denominator in a separate scratch.

    Returns ``(v_int [BH, S, d_aug] int8, sv [BH, d_aug] f32)``. The valid-row
    masking of the ones column happens in-kernel (padding rows must not count).
    """
    bh, s, d = v.shape
    vf = v.astype(jnp.float32)
    amax = jnp.max(jnp.abs(vf), axis=1)  # [BH, D]
    sv = jnp.maximum(amax, 1e-6) / 127.0
    vi = jnp.clip(jnp.round(vf / sv[:, None, :]), -127, 127).astype(jnp.int8)
    if d_aug > d:
        vi = jnp.pad(vi, [(0, 0), (0, 0), (0, d_aug - d)])
        vi = vi.at[:, :, d].set(127)
        sv = jnp.pad(sv, [(0, 0), (0, d_aug - d)])
        sv = sv.at[:, d].set(1.0 / 127.0)
    return vi, sv


def _kernel(
    sq_ref,  # [BH·nq] f32 scalar-prefetch: folded q-block scales
    sk_ref,  # [BH·nk] f32 scalar-prefetch: k-block scales
    *refs,  # (kvl_ref [BH] i32 when has_kvl,) q_ref, k_ref, v_ref,
    #         (sv_ref [1, 1, d_aug] f32 when pv_int8,) o_ref, acc_scr
    #         (, l_scr when not fused)
    d: int,
    d_aug: int,
    block_k: int,
    sk_orig: int,
    nq: int,
    nk: int,
    pv_int8: bool = False,
    fused: bool = True,
    has_kvl: bool = False,
    no_exp2: bool = False,
):
    kvl_ref = None
    if has_kvl:
        kvl_ref, *refs = refs
    q_ref, k_ref, v_ref, *rest = refs
    l_scr = None
    if not fused:
        *rest, l_scr = rest
    if pv_int8:
        sv_ref, o_ref, acc_scr = rest
    else:
        o_ref, acc_scr = rest
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    # valid-key bound: block/sequence padding always masks at sk_orig; with
    # kv_len additionally at the per-batch valid length (keys only — queries
    # past kv_len still produce (downstream-masked) outputs, matching the
    # bf16 kernel's semantics)
    bound = kvl_ref[bh] if has_kvl else sk_orig

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if l_scr is not None:
            l_scr[:] = jnp.zeros_like(l_scr)

    # int8 MXU pass. precision is pinned to DEFAULT: integer dots have no
    # "highest"-precision multi-pass form, and Mosaic rejects the global
    # jax_default_matmul_precision="highest" (test conftest) with
    # "Bad lhs type" if it is allowed to apply here
    s32 = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT,
    )  # [bq, bk]
    sc = sq_ref[bh * nq + qi] * sk_ref[bh * nk + ki]
    # bounded-logit fast path (same argument as the bf16 kernel): dequantized
    # logits match the true ones to ~1%, so |logit·log2e| stays ≪ 120 and the
    # fp32 exp2 is exact without a running max
    if no_exp2:  # perf control: is the kernel VPU-bound? (wrong numerics)
        p = s32.astype(jnp.float32) * sc
    else:
        p = jnp.exp2(s32.astype(jnp.float32) * sc)

    k_start = ki * block_k
    if (not fused) or has_kvl or pv_int8:
        # Explicit invalid-key masking, needed by any of:
        #  * not fused (head_dim % 128 == 0 — Wan/Hunyuan D=128): no idle MXU
        #    output lanes for a fused ones column, so the denominator
        #    accumulates in a separate VPU scratch and padded keys
        #    (k_int = 0 ⇒ p = 1) must be zeroed by hand;
        #  * kv_len: keys in [kv_len, S) carry REAL (text-padding) V rows —
        #    the maskless ones-column trick assumes zero V on invalid rows;
        #  * pv_int8: padded keys' p = 1 would set the per-row P scale and
        #    crush the real (possibly ≪ 1) probabilities to zero codes.
        # The fused non-pv kernel without kv_len stays maskless (zero-padded
        # V rows + gated ones column handle it for free).
        kcol = k_start + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(kcol < bound, p, 0.0)
    if pv_int8:
        # int8 P·V: per-(row, tile) scales on P (p > 0, so amax = rowmax);
        # V arrives pre-quantized per channel (quantize_v_int8) — with the
        # ones column at lane d on the fused layout. Both MXU legs now run
        # at the 2x int8 rate; the per-tile dequant fma is VPU work
        # overlapped under the MXU.
        srow = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-37)  # [bq, 1]
        pi = jnp.round(p * (127.0 / srow)).astype(jnp.int8)
        acc32 = jax.lax.dot_general(
            pi, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32, precision=jax.lax.Precision.DEFAULT,
        )
        acc_scr[:] += acc32.astype(jnp.float32) * (srow * (1.0 / 127.0)) * sv_ref[0]
        if not fused:
            # denominator from the SAME quantized-P codes as the numerator
            # (self-consistent normalization, like the fused ones column)
            l_scr[:, :1] += jnp.sum(pi.astype(jnp.float32), axis=1, keepdims=True) * (
                srow * (1.0 / 127.0)
            )
    elif fused:
        # fused row-sum: ones column at lane d on valid key rows only — padded
        # keys (k_int = 0 ⇒ p = 1) contribute nothing to numerator (v rows
        # zero) or denominator (ones column zero)
        vrow = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, d_aug - d), 0)
        vlane = jax.lax.broadcasted_iota(jnp.int32, (block_k, d_aug - d), 1)
        extra = ((vlane == 0) & (vrow < bound)).astype(v_ref.dtype)
        v_aug = jnp.concatenate([v_ref[0], extra], axis=1)  # [bk, d_aug]

        acc_scr[:] += jax.lax.dot_general(
            p.astype(v_aug.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc_scr[:] += jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_scr[:, d:d + 1] if fused else l_scr[:, :1]
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
    kv_len: jnp.ndarray = None,  # optional [B] i32: keys >= kv_len[b] masked
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

    ``kv_len`` masks keys at a per-batch valid length (Hunyuan's joint
    video+text sequence with padded text): the bound rides the scalar-
    prefetch channel and replaces the sequence-padding mask in-kernel.
    """
    b, h, s, d = q.shape
    if k.shape[2] != s:
        raise ValueError("int8 kernel is self-attention only")
    # head_dim % 128 != 0 (CogVideoX D=64): idle MXU output lanes carry a
    # fused row-sum ones column. head_dim % 128 == 0 (Wan/Hunyuan D=128): the
    # denominator accumulates in a separate VPU scratch instead.
    fused = d % 128 != 0
    block_q, block_k, sp = _aligned_or_pad(s, block_q, block_k)
    if sp != s:
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    q_int, k_int, sq_blk, sk_blk = quantize_qk_int8(q, k, scale, block_q, block_k)
    vp = v.reshape(b * h, sp, d)
    nq, nk = sp // block_q, sp // block_k
    d_aug = -(-(d + 1) // 128) * 128 if fused else d

    has_kvl = kv_len is not None
    kernel = functools.partial(
        _kernel, d=d, d_aug=d_aug, block_k=block_k, sk_orig=s, nq=nq, nk=nk,
        pv_int8=pv_int8, fused=fused, has_kvl=has_kvl, no_exp2=no_exp2,
    )
    scalars = [sq_blk.reshape(-1), sk_blk.reshape(-1)]
    if has_kvl:
        scalars.append(jnp.repeat(jnp.minimum(kv_len.astype(jnp.int32), s), h))
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, *_: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, *_: (bh, ki, 0), memory_space=pltpu.VMEM),
    ]
    if pv_int8:
        v_int, sv = quantize_v_int8(vp, d_aug)
        # sv rides as [BH, 1, d_aug] with a (1, 1, d_aug) block: compiled
        # Mosaic requires the trailing block dims to equal the array dims (a
        # 2D (1, d_aug) block over [BH, d_aug] is sublane-misaligned — the
        # interpret mode the CPU tests use tolerated it; the chip gate does
        # not)
        inputs = (*scalars, q_int, k_int, v_int, sv[:, None, :])
        in_specs += [
            pl.BlockSpec((1, block_k, d_aug), lambda bh, qi, ki, *_: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_aug), lambda bh, qi, ki, *_: (bh, 0, 0), memory_space=pltpu.VMEM),
        ]
        v_bytes = v_int.size + sv.size * 4
    else:
        inputs = (*scalars, q_int, k_int, vp)
        in_specs += [
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, *_: (bh, ki, 0), memory_space=pltpu.VMEM),
        ]
        v_bytes = vp.size * vp.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(b * h, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, *_: (bh, qi, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_q, d_aug), jnp.float32)]
        + ([] if fused else [pltpu.VMEM((block_q, 128), jnp.float32)]),
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
