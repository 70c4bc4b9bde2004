"""Pallas TPU flash attention (forward, inference).

Online-softmax tiling: grid ``(B·H, Sq/bq, Sk/bk)`` with the KV dimension
innermost ("arbitrary" semantics) so the running max/denominator/accumulator
live in VMEM scratch across KV iterations; the output block is written once on
the final KV step. fp32 logits and accumulation, bf16 MXU matmuls.

Replaces the reference stack's xformers fused attention (SURVEY §2.7) for the
video DiTs and all text encoders. Supports:
  * ``causal`` masking (Llama/Llava, CLIP text),
  * per-batch ``kv_len`` key masking (HunyuanVideo padded joint attention),
  * an additive ``bias`` broadcast over batch (T5 relative position bias),
with skip-fast-paths for fully-masked causal blocks.

Perf design (measured on v5e at the CogVideoX shape, B2·H48·S17776·D64):
  * At head_dim 64 the MXU charges a full 128-lane/128-contraction pass for
    both matmuls, so the padded-MXU ceiling is ~50% of peak; VPU work (exp2,
    casts, scale) overlaps fully with MXU passes and is effectively free.
  * Fused row-sum: when ``head_dim % 128 != 0`` V is augmented *in-kernel*
    with a ones column at lane ``d`` (valid rows only). The P·V matmul then
    yields ``[acc | Σp]`` in one pass — the softmax denominator comes out of
    the MXU's otherwise-idle output lanes for free, no separate VPU
    reduction, and no padded-key masking at all.
  * The softmax scale (and base-2 change of base) is applied to the logits
    tile in-kernel instead of pre-scaling Q host-side — saves a full XLA
    elementwise pass over Q per call.
  * Fused qk prolog: the DiT's per-head qk LayerNorm/RMSNorm and the
    interleaved-pair RoPE can run *inside* the kernel on the q/k tiles
    (``qk_norm`` / ``rope_cos``/``rope_sin``). As XLA fusions these two cost
    ~0.55 s per 42-layer forward purely in [B,H,S,D] materialization; as
    in-kernel VPU work on tiles they overlap the MXU passes. The transformed
    q block is computed once per (bh, qi) into scratch; k tiles transform per
    step. RoPE's pair rotation uses lane rolls + an even/odd select (never
    crosses a pair boundary), with cos/sin streamed as bf16 blocks.
  * Q and K/V rows are zero-padded to their block sizes. (A ragged query
    grid relying on masked boundary blocks was tried and is FASTER, but the
    out-of-bounds boundary DMAs intermittently killed the TPU worker at
    production shapes inside large compiled programs — do not reintroduce.)
    With the fused prolog, padded K rows become ``bias_k``-valued after the
    norm — harmless: the in-kernel ones column (and V rows) are zero there,
    so padded keys still contribute nothing to numerator or denominator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
LOG2E = 1.4426950408889634


def target_platform() -> str:
    """Best-effort platform the CURRENT trace will execute on.

    An active ``with mesh:`` context wins over the default backend: a pjit'd
    step over a CPU-device mesh (the multi-chip validation substitute while a
    TPU is attached) lowers for CPU, where ``pallas_call`` cannot lower —
    the trace must pick XLA kernels there even though ``jax.devices()[0]``
    is the TPU."""
    try:
        from jax._src import mesh as mesh_lib

        pm = mesh_lib.thread_resources.env.physical_mesh
        if not pm.empty:
            return pm.devices.flat[0].platform
    except Exception:  # pragma: no cover - internal API drift: fall through
        pass
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return "cpu"


def supports_flash(q, k, v, bias) -> bool:
    """Use the Pallas kernel on real TPU backends only (CPU tests use XLA)."""
    if target_platform() not in ("tpu", "axon"):
        return False
    # kernel constraints: seq lengths handled via padding inside flash_attention
    return True


def _rope_rot(x):
    """Interleaved-pair rotation (x0,x1)→(−x1,x0) via lane rolls (no reshape).
    The even-lane mask is built as a full-rank 2D iota — Mosaic cannot
    relayout a 1D→2D boolean broadcast at large sublane counts."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    even = (lane % 2) == 0
    return jnp.where(even, -jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))


def _fwd_kernel(
    kv_len_ref,  # [B] int32 scalar-prefetch (or [1] dummy)
    q_ref,  # [1, bq, d]
    k_ref,  # [1, bk, d]
    v_ref,  # [1, bk, d]
    bias_ref,  # [1, bq, bk] or None
    norm_refs,  # (q_scale, [q_bias], k_scale, [k_bias]) each [1, d], or ()
    rope_refs,  # (cos_q [bq, d], sin_q, cos_k [bk, d], sin_k) or ()
    o_ref,  # [1, bq, d]
    lse_ref,  # [1, bq, 128] f32 (broadcast lanes) or None
    scratch,  # dict: acc [bq, d_acc] f32; m [bq,128] if stable; l if not fused; qt [bq, d] if prolog
    *,
    scale: float,
    causal: bool,
    use_kv_len: bool,
    num_heads: int,
    block_q: int,
    block_k: int,
    sq_orig: int,
    sk: int,
    sk_orig: int,
    stable: bool,
    fused: bool,
    d: int,
    d_aug: int,
    qk_norm: Optional[str],
    norm_eps: float,
    has_rope: bool,
    prolog_k: bool,
):
    acc_scr = scratch["acc"]
    m_scr = scratch.get("m")
    l_scr = scratch.get("l")
    qt_scr = scratch.get("qt")

    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    def transform(x, scale_ref, bias_ref_, cos_ref, sin_ref):
        """Per-head norm + interleaved RoPE on a [n, d] tile (VPU, overlapped)."""
        if qk_norm == "layer":
            xf = x.astype(jnp.float32)
            mu = xf.mean(axis=-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
            xf = (xf - mu) * jax.lax.rsqrt(var + norm_eps)
            xf = xf * scale_ref[0].astype(jnp.float32) + bias_ref_[0].astype(jnp.float32)
            x = xf.astype(x.dtype)
        elif qk_norm == "rms":
            xf = x.astype(jnp.float32)
            xf = xf * jax.lax.rsqrt((xf * xf).mean(axis=-1, keepdims=True) + norm_eps)
            x = (xf * scale_ref[0].astype(jnp.float32)).astype(x.dtype)
        if has_rope:
            c = cos_ref[...].astype(x.dtype)
            s = sin_ref[...].astype(x.dtype)
            x = x * c + _rope_rot(x) * s
        return x

    has_prolog = qk_norm is not None or has_rope
    if has_prolog:
        qs = norm_refs[0] if qk_norm else None
        qb = norm_refs[1] if qk_norm == "layer" else None
        ks = kb = ck = sk_t = None
        if prolog_k and qk_norm:
            ks = norm_refs[-2 if qk_norm == "layer" else -1]
            kb = norm_refs[-1] if qk_norm == "layer" else None
        if has_rope:
            cq, sq_t = rope_refs[0], rope_refs[1]
            if prolog_k:
                ck, sk_t = rope_refs[2], rope_refs[3]
        else:
            cq = sq_t = None

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if stable:
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        if not fused:
            l_scr[:] = jnp.zeros_like(l_scr)
        if has_prolog:
            qt_scr[:] = transform(q_ref[0], qs, qb, cq, sq_t)

    q_start = qi * block_q
    k_start = ki * block_k

    # skip blocks entirely above the causal diagonal (offsets in ORIGINAL
    # coordinates: k padding sits beyond sk_orig)
    run = True
    if causal:
        run = k_start <= q_start + (sk_orig - sq_orig) + block_q - 1

    # fp32 inputs get full-precision MXU passes (fixed-seed parity runs);
    # bf16 inputs take the fast path
    # explicit DEFAULT for bf16: `None` would inherit the process-wide
    # jax_default_matmul_precision, and "highest" asks Mosaic for an fp32
    # contraction of bf16 vectors — unsupported ("Bad lhs type"). bf16 MXU
    # passes accumulate in fp32 regardless, so DEFAULT loses nothing.
    precision = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    @pl.when(run)
    def _compute():
        q = qt_scr[:] if has_prolog else q_ref[0]
        k = transform(k_ref[0], ks, kb, ck, sk_t) if (has_prolog and prolog_k) else k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # [bq, bk] raw logits
        # softmax in base 2: exp2 is the native VPU transcendental; the
        # combined scale·log2(e) multiply rides the same (MXU-overlapped,
        # effectively free) VPU pass as the masks below
        s = s * (scale * LOG2E)
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32) * LOG2E

        if causal:
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            s = jnp.where(col <= row + (sk_orig - sq_orig), s, _NEG_INF)

        # invalid-key masking is UNCONDITIONAL: a `jax.lax.cond` with a
        # vector-valued branch lowers catastrophically in Mosaic — the branch
        # value materializes through VMEM and serializes the tile pipeline
        # (measured 2x on the whole kernel: 184 -> 94 TFLOP/s at the Hunyuan
        # D=128 shape, r5). The iota+where pair is VPU work that fully
        # overlaps the MXU passes (same as the causal mask above and the int8
        # kernel), so masking every tile costs ~nothing.
        if use_kv_len:
            b = bh // num_heads
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col < kv_len_ref[b], s, _NEG_INF)
        elif not fused and sk_orig != sk:
            # non-fused path: padded keys contribute p = exp2(s_masked) to the
            # VPU denominator, so the padded tail must be masked
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col < sk_orig, s, _NEG_INF)
        # fused path needs NO padding mask: the in-kernel ones column is zero
        # on padded key rows, so they add 0 to both acc and denominator
        # (padded V rows are zero, so the numerator is safe either way)

        if fused:
            # augment V with a ones column at lane d (valid rows only): the
            # P·V pass then emits [acc | Σp] using the idle MXU output lanes
            vrow = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, d_aug - d), 0)
            vlane = jax.lax.broadcasted_iota(jnp.int32, (block_k, d_aug - d), 1)
            extra = ((vlane == 0) & (vrow < sk_orig)).astype(v_ref.dtype)
            v_aug = jnp.concatenate([v_ref[0], extra], axis=1)  # [bk, d_aug]
        else:
            v_aug = v_ref[0]

        if stable:
            m_prev = m_scr[:, :1]  # [bq, 1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next)  # [bq, bk] f32 (base-2 softmax)
            # the rescale applies uniformly to the fused sum column too:
            # l_next = alpha·l_prev + Σp is exactly lane d of the update below
            acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
                p.astype(v_aug.dtype), v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
            if not fused:
                l_prev = l_scr[:, :1]
                l_scr[:] = jnp.broadcast_to(
                    alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
                )
        else:
            # bounded-logit fast path: skip the running max — the softmax is
            # exact in fp32 as long as |logit·log2e| < ~120, which holds by a
            # wide margin for trained DiT attention. Masked logits (-1e30)
            # exp2 to exactly 0, so causal/kv_len masks still work.
            p = jnp.exp2(s)
            acc_scr[:] += jax.lax.dot_general(
                p.astype(v_aug.dtype), v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            if not fused:
                l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)

    @pl.when(ki == nk - 1)
    def _finalize():
        if fused:
            l = acc_scr[:, d:d + 1]
        else:
            l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:, :d] / safe_l).astype(o_ref.dtype)
        if lse_ref is not None:
            # base-2 log-sum-exp of the (scaled) logits row: the residual a
            # ring/sequence-parallel caller needs to merge partial outputs
            # (exp2-weighted). Fully-masked rows give -inf; the stable path's
            # running max is already in base-2 units.
            lse = jnp.log2(l)
            if stable:
                lse = lse + m_scr[:, :1]
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(jnp.float32)


def _aligned_block(s: int, lo: int = 512, hi: int = 2048) -> int:
    """Largest divisor of ``s`` in [lo, hi] that is a multiple of 8 (sublane);
    0 when none exists (caller falls back to padding)."""
    best = 0
    d = 8
    while d <= hi:
        if s % d == 0 and d >= lo:
            best = d
        d += 8
    return best


def _pad_to(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k", "stable", "qk_norm", "norm_eps", "prolog_k", "return_residuals"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    causal: bool = False,
    kv_len: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,  # None → auto (1024, seq-aligned if profitable)
    block_k: Optional[int] = None,  # None → auto (2048, seq-aligned if profitable)
    stable: bool = True,
    qk_norm: Optional[str] = None,  # None | "layer" | "rms"
    norm_eps: float = 1e-6,
    q_norm_scale: Optional[jnp.ndarray] = None,  # [d]
    q_norm_bias: Optional[jnp.ndarray] = None,  # [d] ("layer" only)
    k_norm_scale: Optional[jnp.ndarray] = None,
    k_norm_bias: Optional[jnp.ndarray] = None,
    rope_cos: Optional[jnp.ndarray] = None,  # [S, d] (S >= Sk)
    rope_sin: Optional[jnp.ndarray] = None,
    prolog_k: bool = True,
    return_residuals: bool = False,
) -> jnp.ndarray:
    """Flash attention over ``[B, H, S, D]``. Sequence dims are zero-padded
    to block multiples; padded keys are handled masklessly by the fused
    path's valid-row ones column, padded queries are sliced off. Optional
    fused qk prolog: per-head ``qk_norm`` then RoPE applied in-kernel (tables
    shared by q and k — self-attention positions).

    ``return_residuals=True`` additionally returns the per-row base-2
    log-sum-exp of the scaled logits, ``[B, H, Sq]`` f32 (-inf on fully
    masked rows) — what a ring-attention caller needs to exp2-merge partial
    outputs across KV chunks."""
    b, h, sq_orig, d = q.shape
    sk_orig = k.shape[2]
    # Explicit caller block sizes are honored verbatim; auto-selection below
    # applies only when BOTH are left at None (tools A/B-sweep explicit pairs).
    auto_blocks = block_q is None and block_k is None
    if block_q is None:
        block_q = 1024
    if block_k is None:
        block_k = 2048
    # Prefer block sizes that DIVIDE the sequence exactly: the pad of q/k/v to
    # block multiples plus the output slice are full extra HBM passes worth
    # ~7 ms/call at the CogVideoX shape (measured v5e: 94.8 ms default
    # 1024/2048 vs 87.4 ms aligned 1616/1616 — tools/bench_qk_prep.py).
    # Self-attention only, both blocks from the same divisor — mixed
    # aligned-Q/padded-K combinations miscompile (Mosaic crash, recorded).
    aligned_fired = False
    if auto_blocks and sq_orig == sk_orig and sq_orig % block_q != 0:
        # stable path carries extra per-query scratch (running max/denom):
        # 1616-row q blocks exceed the 16M scoped-vmem limit by ~0.4M there,
        # so cap its aligned block_q at 1024 (→ 808 for S=17776)
        aligned_q = _aligned_block(sq_orig, hi=1024 if stable else 2048)
        aligned_k = _aligned_block(sq_orig, hi=2048)
        # bound the JOINT tile too: the bq×bk fp32 logits buffer plus the
        # p tile cast to the input dtype must stay inside scoped vmem.
        # bf16 anchors (measured v5e): stable 1024×2048 and non-stable
        # 1616×1616 both fit; f32 inputs (parity runs) carry an f32 p tile —
        # (4+4)/(4+2) the bytes per logit element — e.g. 1000×2000 f32
        # overruns the 16M scope by 860K (measured), so scale the element
        # cap by the per-element logit bytes relative to the bf16 anchor.
        elem_p = max(jnp.dtype(q.dtype).itemsize, 2)
        cap = ((1024 * 2048) if stable else (1616 * 1616)) * 6 // (4 + elem_p)
        while aligned_q and aligned_k and aligned_q * aligned_k > cap:
            aligned_q = _aligned_block(sq_orig, lo=256, hi=aligned_q - 8)
        if aligned_q and aligned_k:
            block_q, block_k = aligned_q, aligned_k
            aligned_fired = True
    if auto_blocks and d >= 128 and not aligned_fired:
        # default-blocks path at head_dim>=128: the [bq,bk] logit/p/mask
        # buffers plus the d=128 q/k/v tiles overflow the 16M scoped-vmem
        # limit at 1024x2048 (measured 19.8M — Hunyuan S=28,132 with kv_len
        # masking, r4). 1024x1024 leaves >4M headroom. Aligned-divisor
        # selections above (e.g. Wan 1560x1560 at S=32,760) are measured
        # fits and keep their blocks.
        block_q, block_k = min(block_q, 1024), min(block_k, 1024)
    block_q = min(block_q, max(128, 1 << (sq_orig - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (sk_orig - 1).bit_length()))
    sq = -(-sq_orig // block_q) * block_q
    nq = sq // block_q
    sk = -(-sk_orig // block_k) * block_k

    # fused row-sum only when head_dim leaves idle MXU output lanes
    d_aug = -(-(d + 1) // 128) * 128
    fused = d % 128 != 0

    has_rope = rope_cos is not None
    if has_rope and sq_orig != sk_orig:
        raise ValueError("fused RoPE assumes self-attention (Sq == Sk)")

    qp = _pad_to(q, sq, 2).reshape(b * h, sq, d)
    kp = _pad_to(k, sk, 2).reshape(b * h, sk, d)
    vp = _pad_to(v, sk, 2).reshape(b * h, sk, d)

    use_kv_len = kv_len is not None
    kv_len_arr = kv_len.astype(jnp.int32) if use_kv_len else jnp.zeros((1,), jnp.int32)

    has_bias = bias is not None
    # index maps receive (*grid_indices, *scalar_prefetch_refs)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, _kv: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, _kv: (bh, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki, _kv: (bh, ki, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qp, kp, vp]
    n_bias = 0
    if has_bias:
        bias_b = jnp.broadcast_to(bias, (1,) + bias.shape[-3:]) if bias.ndim == 4 else bias[None]
        bias_full = _pad_to(_pad_to(bias_b.astype(jnp.float32), sq, -2), sk, -1)
        bh_bias = bias_full.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, block_k),
                lambda bh, qi, ki, _kv: (0, bh % bh_bias, qi, ki),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias_full)
        n_bias = 1

    n_norm = 0
    if qk_norm is not None:
        if qk_norm not in ("layer", "rms"):
            raise ValueError(f"qk_norm must be 'layer' or 'rms', got {qk_norm!r}")
        norm_arrs = [q_norm_scale]
        if qk_norm == "layer":
            norm_arrs.append(q_norm_bias)
        if prolog_k:
            norm_arrs.append(k_norm_scale)
            if qk_norm == "layer":
                norm_arrs.append(k_norm_bias)
        for arr in norm_arrs:
            in_specs.append(
                pl.BlockSpec((1, d), lambda bh, qi, ki, _kv: (0, 0), memory_space=pltpu.VMEM)
            )
            operands.append(jnp.asarray(arr).reshape(1, d))
        n_norm = len(norm_arrs)

    n_rope = 0
    if has_rope:
        # one bf16-for-bf16 table pair, streamed twice (q blocks and k blocks)
        smax = max(sq, sk)
        cos_p = _pad_to(jnp.asarray(rope_cos, q.dtype), smax, 0)
        sin_p = _pad_to(jnp.asarray(rope_sin, q.dtype), smax, 0)
        in_specs.append(pl.BlockSpec((block_q, d), lambda bh, qi, ki, _kv: (qi, 0), memory_space=pltpu.VMEM))
        operands.append(cos_p)
        in_specs.append(pl.BlockSpec((block_q, d), lambda bh, qi, ki, _kv: (qi, 0), memory_space=pltpu.VMEM))
        operands.append(sin_p)
        n_rope = 2
        if prolog_k:
            in_specs.append(pl.BlockSpec((block_k, d), lambda bh, qi, ki, _kv: (ki, 0), memory_space=pltpu.VMEM))
            operands.append(cos_p)
            in_specs.append(pl.BlockSpec((block_k, d), lambda bh, qi, ki, _kv: (ki, 0), memory_space=pltpu.VMEM))
            operands.append(sin_p)
            n_rope = 4

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        use_kv_len=use_kv_len,
        num_heads=h,
        block_q=block_q,
        block_k=block_k,
        sq_orig=sq_orig,
        sk=sk,
        sk_orig=sk_orig,
        stable=stable,
        fused=fused,
        d=d,
        d_aug=d_aug,
        qk_norm=qk_norm,
        norm_eps=norm_eps,
        has_rope=has_rope,
        prolog_k=prolog_k,
    )

    d_acc = d_aug if fused else d
    scratch_shapes = [pltpu.VMEM((block_q, d_acc), jnp.float32)]  # acc (+ fused Σp)
    scratch_keys = ["acc"]
    if stable:
        scratch_shapes.append(pltpu.VMEM((block_q, 128), jnp.float32))  # m
        scratch_keys.append("m")
    if not fused:
        scratch_shapes.append(pltpu.VMEM((block_q, 128), jnp.float32))  # l
        scratch_keys.append("l")
    if qk_norm is not None or has_rope:
        scratch_shapes.append(pltpu.VMEM((block_q, d), q.dtype))  # transformed q
        scratch_keys.append("qt")

    def body(kv_len_ref, *refs):
        i = 0
        q_ref, k_ref, v_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        bias_ref = refs[i] if n_bias else None
        i += n_bias
        norm_refs = refs[i : i + n_norm]
        i += n_norm
        rope_refs = refs[i : i + n_rope]
        i += n_rope
        o_ref = refs[i]
        i += 1
        lse_ref = None
        if return_residuals:
            lse_ref = refs[i]
            i += 1
        scratch = dict(zip(scratch_keys, refs[i:]))
        return kernel(
            kv_len_ref, q_ref, k_ref, v_ref, bias_ref, norm_refs, rope_refs, o_ref, lse_ref, scratch
        )

    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, _kv: (bh, qi, 0), memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((b * h, sq, d), q.dtype)]
    if return_residuals:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda bh, qi, ki, _kv: (bh, qi, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((b * h, sq, 128), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, nq, sk // block_k),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(kv_len_arr, *operands)

    if return_residuals:
        o, lse = out
        return (
            o.reshape(b, h, sq, d)[:, :, :sq_orig],
            lse.reshape(b, h, sq, 128)[:, :, :sq_orig, 0],
        )
    return out[0].reshape(b, h, sq, d)[:, :, :sq_orig]
