"""Fused per-head qk-norm + interleaved RoPE as a standalone Pallas kernel.

Round-2 profiling (docs/PERF.md) measured the XLA-fused per-head LayerNorm at
~0.29 s/step and RoPE at ~0.26 s/step on the CogVideoX forward (42 layers ×
q,k tensors of [2, 48, 17776, 64]) — together ~8 % of the step, an order of
magnitude above the minimal HBM traffic (one read + one write per tensor).
The r2 attempt to fuse these INTO the flash kernel lost (the K-side transform
recomputes on every query block — 36× redundant; ``tests/
test_attention_prolog.py``). This standalone kernel takes the other route:
one pass over the tensor, fp32 LayerNorm statistics over the head dim, the
roll-based interleaved rotation, one write — no recompute, no extra XLA
materialization passes.

Semantics are op-for-op those of ``models.layers.layer_norm`` (fp32 stats,
affine in fp32, cast back) followed by ``models.rope.apply_rope_interleaved``
(tables cast to the activation dtype, rotation expressed as lane rolls +
even/odd select) — validated against that composition in
``tests/test_qk_prep.py``.

Dispatch: production bf16 activations on a real TPU backend take the kernel;
fp32 parity runs, CPU tests, and mesh-sharded calls (GSPMD) keep the XLA
composition (identical numerics is the parity contract there).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alg_tpu.models import layers as L
from alg_tpu.models import rope as R


def _choose_block_s(s: int) -> int:
    """Largest block ≤ 2048 that divides ``s`` and is a multiple of 8; falls
    back to 0 (meaning: unsupported, use XLA) when none exists."""
    best = 0
    for cand in range(8, 2049, 8):
        if s % cand == 0:
            best = cand
    return best


def _roll_lane(y, shift):
    """Static lane roll via slicing (lowers on Mosaic and in interpret mode)."""
    if shift == -1:
        return jnp.concatenate([y[:, 1:], y[:, :1]], axis=1)
    return jnp.concatenate([y[:, -1:], y[:, :-1]], axis=1)


def _kernel(x_ref, scale_ref, bias_ref, cos_ref, sin_ref, o_ref, *, eps: float):
    x = x_ref[0]  # [block_s, D]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)

    c = cos_ref[...]
    s = sin_ref[...]
    # 2-D iota mask: a 1-D lane mask broadcast against [block_s, D] trips a
    # Mosaic relayout bug ("non-singleton logical dimension is replicated")
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    even = (lane % 2) == 0
    rot = jnp.where(even, -_roll_lane(y, -1), _roll_lane(y, 1))
    o_ref[0] = y * c + rot * s


@functools.partial(jax.jit, static_argnames=("eps", "block_s", "interpret"))
def _qk_prep_pallas(x, scale, bias, cos, sin, eps: float, block_s: int, interpret: bool):
    b, h, s, d = x.shape
    xr = x.reshape(b * h, s, d)
    # grid order (si, bh): consecutive steps share the cos/sin block, so the
    # tables DMA once per sequence block, not once per (head, block)
    grid = (s // block_s, b * h)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, d), lambda si, bh: (bh, si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda si, bh: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda si, bh: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda si, bh: (si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda si, bh: (si, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_s, d), lambda si, bh: (bh, si, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), x.dtype),
        interpret=interpret,
    )(xr, scale, bias, cos.astype(x.dtype), sin.astype(x.dtype))
    return out.reshape(b, h, s, d)


def _xla_compose(x, normp, cos, sin, eps):
    y = L.layer_norm(normp, x, eps)
    return R.apply_rope_interleaved(y, cos, sin)


# custom_vjp wrapper: a bare pallas_call has no VJP rule, so training (LoRA /
# full fine-tune on the TPU backend, where bf16 DiT activations take the
# fused kernel) would die in NotImplementedError. The backward is elementwise
# (LayerNorm + rotation) — differentiating the numerically-identical XLA
# composition recovers it exactly, and XLA's fused elementwise backward is
# already bandwidth-optimal there.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _qk_prep_diff(eps, block_s, interpret, x, scale, bias, cos, sin):
    return _qk_prep_pallas(x, scale, bias, cos, sin, eps, block_s, interpret)


def _qk_prep_diff_fwd(eps, block_s, interpret, x, scale, bias, cos, sin):
    out = _qk_prep_pallas(x, scale, bias, cos, sin, eps, block_s, interpret)
    return out, (x, scale, bias, cos, sin)


def _qk_prep_diff_bwd(eps, block_s, interpret, res, g):
    x, scale, bias, cos, sin = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_, c_, sn_: _xla_compose(x_, {"scale": s_, "bias": b_}, c_, sn_, eps),
        x, scale, bias, cos, sin,
    )
    return vjp(g)


_qk_prep_diff.defvjp(_qk_prep_diff_fwd, _qk_prep_diff_bwd)


def _rope_kernel(x_ref, cos_ref, sin_ref, o_ref):
    y = x_ref[0]  # [block_s, D]
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    even = (lane % 2) == 0
    rot = jnp.where(even, -_roll_lane(y, -1), _roll_lane(y, 1))
    o_ref[0] = y * cos_ref[...] + rot * sin_ref[...]


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _rope_pallas(x, cos, sin, block_s: int, interpret: bool):
    b, h, s, d = x.shape
    xr = x.reshape(b * h, s, d)
    grid = (s // block_s, b * h)
    out = pl.pallas_call(
        _rope_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, d), lambda si, bh: (bh, si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda si, bh: (si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda si, bh: (si, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_s, d), lambda si, bh: (bh, si, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), x.dtype),
        interpret=interpret,
    )(xr, cos.astype(x.dtype), sin.astype(x.dtype))
    return out.reshape(b, h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _rope_diff(block_s, interpret, x, cos, sin):
    return _rope_pallas(x, cos, sin, block_s, interpret)


def _rope_diff_fwd(block_s, interpret, x, cos, sin):
    return _rope_pallas(x, cos, sin, block_s, interpret), (x, cos, sin)


def _rope_diff_bwd(block_s, interpret, res, g):
    x, cos, sin = res
    _, vjp = jax.vjp(R.apply_rope_interleaved, x, cos, sin)
    return vjp(g)


_rope_diff.defvjp(_rope_diff_fwd, _rope_diff_bwd)


def rope_interleaved(
    x: jnp.ndarray,  # [B, H, S, D]
    cos: jnp.ndarray,  # [S, D]
    sin: jnp.ndarray,
    force: Optional[str] = None,  # None | "pallas" | "xla" (tests)
    interpret: bool = False,
) -> jnp.ndarray:
    """Interleaved-pair RoPE, fused to one HBM pass where profitable.

    Semantics are exactly ``models.rope.apply_rope_interleaved`` (tables cast
    to the activation dtype, lane-roll rotation). XLA lowers that composition
    with slice+concat rolls whose width-1 slices get lane-padded 128× — at
    Wan-14B scale ([3,40,32760,128] bf16) that is three ~960 MB HLO temps of
    pure padding per q/k (measured in the W4A8 OOM report, docs/ROUND4.md).
    The kernel reads each block once, rotates in VMEM, writes once. Backward
    (training) differentiates the identical XLA composition (pattern:
    ``_qk_prep_diff_bwd``). Models whose norm can't fuse per-head (Wan's
    full-inner-dim RMS norm) use this; per-head-norm models take
    ``qk_norm_rope``."""
    use_pallas = force == "pallas"
    if force is None:
        import os

        if os.environ.get("ALG_TPU_QK_PREP") == "xla":
            return R.apply_rope_interleaved(x, cos, sin)
        from alg_tpu.ops.attention import _MESH_CTX  # sharded calls stay on XLA
        from alg_tpu.ops.flash_attention import target_platform

        use_pallas = (
            target_platform() in ("tpu", "axon")
            and _MESH_CTX is None
            and x.dtype == jnp.bfloat16
            and x.ndim == 4
            and getattr(cos, "ndim", 0) == 2
            and x.shape[-1] in (64, 128)
            and cos.shape == (x.shape[2], x.shape[-1])
        )
    if use_pallas:
        block_s = _choose_block_s(x.shape[2])
        if block_s >= 128:
            return _rope_diff(block_s, interpret, x, jnp.asarray(cos), jnp.asarray(sin))
    return R.apply_rope_interleaved(x, cos, sin)


def qk_norm_rope(
    x: jnp.ndarray,  # [B, H, S, D]
    normp: dict,  # {"scale": [D], "bias": [D]}
    cos: Optional[jnp.ndarray],  # [S, D]
    sin: Optional[jnp.ndarray],
    eps: float,
    force: Optional[str] = None,  # None | "pallas" | "xla" (tests)
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-head LayerNorm then interleaved RoPE, fused where profitable."""
    if cos is None:
        return L.layer_norm(normp, x, eps)

    use_pallas = force == "pallas"
    if force is None:
        # Standalone A/B on v5e is a wash (kernel 4.67 ms/tensor vs 4.30 ms
        # XLA, tools/bench_qk_prep.py) but IN CONTEXT the kernel wins big:
        # the full 42-layer B=2 CogVideoX forward drops 6.42 s → 6.10 s
        # (tools/bench_attrib.py, r3) — inside the large program XLA's
        # norm+rope composition materializes extra passes that the standalone
        # microbench doesn't expose. Default ON for production TPU shapes;
        # opt out with ALG_TPU_QK_PREP=xla.
        import os

        if os.environ.get("ALG_TPU_QK_PREP") == "xla":
            return _xla_compose(x, normp, cos, sin, eps)
        from alg_tpu.ops.attention import _MESH_CTX  # sharded calls stay on XLA
        from alg_tpu.ops.flash_attention import target_platform

        use_pallas = (
            target_platform() in ("tpu", "axon")
            and _MESH_CTX is None
            and x.dtype == jnp.bfloat16
            and x.shape[-1] in (64, 128)
        )
    if use_pallas:
        block_s = _choose_block_s(x.shape[2])
        if block_s >= 128:
            return _qk_prep_diff(
                float(eps),
                block_s,
                interpret,
                x,
                normp["scale"],
                normp["bias"],
                jnp.asarray(cos),
                jnp.asarray(sin),
            )
    return _xla_compose(x, normp, cos, sin, eps)
