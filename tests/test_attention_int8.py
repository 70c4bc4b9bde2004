"""Int8-QK^T flash attention: kernel correctness + quantization drift bounds.

Two layers of checking (both CPU, kernel in interpret mode):

1. **Exactness vs the same quantized math in plain JAX** — proves the Pallas
   kernel computes precisely the intended quantized attention (blocking,
   scale bookkeeping, fused row-sum, padding) with no additional error.
2. **Drift vs exact fp32 attention** — bounds the int8 quantization error on
   DiT-like inputs (per-head LayerNormed q/k rows, the distribution the
   per-block scale design assumes; see ops/flash_attention_int8.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.ops.attention import _xla_attention
from alg_tpu.ops.flash_attention_int8 import (
    flash_attention_int8,
    quantize_qk_int8,
)

pytestmark = pytest.mark.fast


def _dit_like_qkv(rng, b, h, s, d):
    """Rows ~ LayerNorm output (unit-ish per-row scale), like post-qk-norm."""
    q = rng.randn(b, h, s, d).astype(np.float32)
    k = rng.randn(b, h, s, d).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True) * np.sqrt(d)
    k = k / np.linalg.norm(k, axis=-1, keepdims=True) * np.sqrt(d)
    # a common-mode K component that mean-centering should remove
    k = k + 3.0 * rng.randn(b, h, 1, d).astype(np.float32)
    v = rng.randn(b, h, s, d).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _quantized_reference(q, k, v, scale, block_q, block_k):
    """The kernel's intended math in plain JAX (same quantizer)."""
    b, h, s, d = q.shape
    q_int, k_int, sq_blk, sk_blk = quantize_qk_int8(q, k, scale, block_q, block_k)
    qi = q_int.reshape(b, h, s, d).astype(jnp.int32)
    ki = k_int.reshape(b, h, s, d).astype(jnp.int32)
    logits_int = jnp.einsum("bhqd,bhkd->bhqk", qi, ki)
    sq = jnp.repeat(sq_blk.reshape(b, h, -1), block_q, axis=2)  # [b,h,s]
    sk = jnp.repeat(sk_blk.reshape(b, h, -1), block_k, axis=2)
    expo = logits_int.astype(jnp.float32) * sq[..., :, None] * sk[..., None, :]
    p = jnp.exp2(expo)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v) / jnp.sum(p, axis=-1, keepdims=True)


@pytest.mark.parametrize("s,bq,bk", [(256, 128, 128), (384, 128, 384)])
def test_kernel_matches_quantized_reference(s, bq, bk):
    rng = np.random.RandomState(0)
    q, k, v = _dit_like_qkv(rng, 1, 2, s, 64)
    scale = 64**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=bq, block_k=bk, interpret=True)
    ref = _quantized_reference(q, k, v, scale, bq, bk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_kernel_pads_ragged_sequence():
    """S not divisible by any aligned block → zero-pad path; padded keys must
    contribute nothing (ones-column gating) and padded queries are sliced."""
    rng = np.random.RandomState(1)
    s = 200  # pads to 1024 with the default fallback blocks
    q, k, v = _dit_like_qkv(rng, 1, 1, s, 64)
    scale = 64**-0.5
    out = flash_attention_int8(q, k, v, scale, interpret=True)
    assert out.shape == (1, 1, s, 64)
    # drift-level agreement with exact attention proves pads didn't leak
    exact = _xla_attention(q, k, v, scale)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    assert err.mean() < 5e-3 and err.max() < 5e-2


def test_drift_vs_exact_attention_bounded():
    rng = np.random.RandomState(2)
    q, k, v = _dit_like_qkv(rng, 2, 4, 512, 64)
    scale = 64**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=256, block_k=256, interpret=True)
    exact = _xla_attention(q, k, v, scale)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    ref_rms = float(np.sqrt((np.asarray(exact) ** 2).mean()))
    # measured on this distribution: mean/rms ≈ 1.0e-2, max/rms ≈ 9.7e-2 —
    # the int8 reality (same order as W8A8 linears); bounds are regression
    # guards at ~1.5–2× the measured values
    assert err.mean() / ref_rms < 2e-2, (err.mean(), ref_rms)
    assert err.max() / ref_rms < 1.5e-1, (err.max(), ref_rms)


def test_mean_centering_is_softmax_exact():
    """Subtracting the K sequence-mean must not change exact attention —
    the invariance the int8 range reduction relies on."""
    rng = np.random.RandomState(3)
    q, k, v = _dit_like_qkv(rng, 1, 2, 128, 64)
    scale = 64**-0.5
    kc = k - k.mean(axis=2, keepdims=True)
    a = _xla_attention(q, k, v, scale)
    b = _xla_attention(q, kc, v, scale)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_rejects_unsupported_shapes():
    rng = np.random.RandomState(4)
    q2, k2, v2 = _dit_like_qkv(rng, 1, 1, 128, 64)
    with pytest.raises(ValueError, match="self-attention"):
        flash_attention_int8(q2, k2[:, :, :64], v2[:, :, :64], 64**-0.5, interpret=True)


# --- head_dim % 128 == 0 (Wan/Hunyuan D=128): the non-fused denominator path


@pytest.mark.parametrize("pv", [False, True])
def test_kernel_d128_matches_quantized_reference(pv):
    rng = np.random.RandomState(8)
    q, k, v = _dit_like_qkv(rng, 1, 2, 256, 128)
    scale = 128**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=128, block_k=128,
                               pv_int8=pv, interpret=True)
    if pv:
        ref = _quantized_reference_pv(q, k, v, scale, 128, 128)
        err = np.abs(np.asarray(out) - np.asarray(ref))
        assert err.mean() < 1e-5, err.mean()
        assert err.max() < 2e-3, err.max()
    else:
        ref = _quantized_reference(q, k, v, scale, 128, 128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("pv", [False, True])
def test_kernel_d128_drift_vs_exact_bounded(pv):
    rng = np.random.RandomState(9)
    q, k, v = _dit_like_qkv(rng, 2, 2, 512, 128)
    scale = 128**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=256, block_k=256,
                               pv_int8=pv, interpret=True)
    exact = _xla_attention(q, k, v, scale)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    ref_rms = float(np.sqrt((np.asarray(exact) ** 2).mean()))
    # measured on this distribution: mean/rms ≈ 5e-3 (qk) / 8e-3 (pv), max/rms
    # ≈ 0.11 (qk) / 0.245 (pv) — D=128 softmax rows are spikier than D=64
    # (logit std grows with sqrt(d)), so per-tile P codes are coarser; guards
    # at ~1.2-1.5x measured
    assert err.mean() / ref_rms < (3e-2 if pv else 2e-2), (err.mean(), ref_rms)
    assert err.max() / ref_rms < (3e-1 if pv else 1.5e-1), (err.max(), ref_rms)


@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("pv", [False, True])
def test_kv_len_masks_keys(d, pv):
    """Per-batch kv_len (Hunyuan's joint sequence): keys >= kv_len[b] must be
    excluded, including their REAL (non-zero) V rows — drift vs exact masked
    attention stays at the int8 level, and a poisoned masked tail moves the
    output only within quantization noise (the tail still enters the K-block
    scales/mean, so bitwise invariance is not expected)."""
    rng = np.random.RandomState(11)
    s = 256
    kv_len = jnp.asarray([183, 256], jnp.int32)
    q, k, v = _dit_like_qkv(rng, 2, 2, s, d)
    scale = d**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=128, block_k=128,
                               pv_int8=pv, kv_len=kv_len, interpret=True)
    exact = _xla_attention(q, k, v, scale, kv_len=kv_len)
    # compare only rows < kv_len (the kernel leaves masked-query rows
    # attending to valid keys; downstream crops them — bf16 kernel semantics)
    mask = (np.arange(s)[None, :] < np.asarray(kv_len)[:, None])[:, None, :, None]
    err = np.abs(np.asarray(out) - np.asarray(exact)) * mask
    ref_rms = float(np.sqrt((np.asarray(exact) ** 2 * mask).sum() / mask.sum() / d / 2))
    assert err.mean() / ref_rms < 5e-2, (err.mean(), ref_rms)

    # poisoned tail: huge garbage K/V past kv_len must not blow up the output
    k2 = k.at[:, :, 183:].set(jnp.asarray(5.0 * rng.randn(2, 2, s - 183, d), jnp.float32))
    v2 = v.at[:, :, 183:].set(jnp.asarray(5.0 * rng.randn(2, 2, s - 183, d), jnp.float32))
    out2 = flash_attention_int8(q, k2, v2, scale, block_q=128, block_k=128,
                                pv_int8=pv, kv_len=jnp.asarray([183, 183], jnp.int32),
                                interpret=True)
    exact2 = _xla_attention(q, k, v, scale, kv_len=jnp.asarray([183, 183], jnp.int32))
    m2 = (np.arange(s)[None, :] < 183)[:, None, :, None] * np.ones((2, 1, 1, 1))
    err2 = np.abs(np.asarray(out2) - np.asarray(exact2)) * m2
    assert err2.max() < 2e-1, err2.max()


@pytest.mark.parametrize("pv", [False, True])
def test_kernel_d128_pads_ragged_sequence(pv):
    """Padded keys at D=128 are masked explicitly (no ones column to gate
    them) — padding must not leak into numerator or denominator."""
    rng = np.random.RandomState(10)
    s = 200
    q, k, v = _dit_like_qkv(rng, 1, 1, s, 128)
    scale = 128**-0.5
    out = flash_attention_int8(q, k, v, scale, pv_int8=pv, interpret=True)
    assert out.shape == (1, 1, s, 128)
    exact = _xla_attention(q, k, v, scale)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    assert err.mean() < 8e-3 and err.max() < 8e-2


def _quantized_reference_pv(q, k, v, scale, block_q, block_k):
    """Intended math of the pv_int8=True kernel in plain JAX: the QK^T
    quantizer above + per-(row, k-block) P scales and per-channel V scales,
    with the denominator built from the SAME quantized P (ones column)."""
    from alg_tpu.ops.flash_attention_int8 import quantize_v_int8

    b, h, s, d = q.shape
    q_int, k_int, sq_blk, sk_blk = quantize_qk_int8(q, k, scale, block_q, block_k)
    qi = q_int.reshape(b, h, s, d).astype(jnp.int32)
    ki = k_int.reshape(b, h, s, d).astype(jnp.int32)
    logits_int = jnp.einsum("bhqd,bhkd->bhqk", qi, ki)
    sq = jnp.repeat(sq_blk.reshape(b, h, -1), block_q, axis=2)
    sk = jnp.repeat(sk_blk.reshape(b, h, -1), block_k, axis=2)
    p = jnp.exp2(logits_int.astype(jnp.float32) * sq[..., :, None] * sk[..., None, :])

    d_aug = -(-(d + 1) // 128) * 128 if d % 128 else d
    v_int, sv = quantize_v_int8(v.reshape(b * h, s, d), d_aug)
    v_int = v_int.reshape(b, h, s, d_aug).astype(jnp.int32)
    sv = sv.reshape(b, h, d_aug)

    nk = s // block_k
    pt = p.reshape(b, h, s, nk, block_k)
    srow = jnp.max(pt, axis=-1, keepdims=True)  # per (row, k-tile)
    pi = jnp.round(pt * (127.0 / srow))
    acc32 = jnp.einsum("bhqnk,bhnkD->bhqnD", pi,
                       v_int.reshape(b, h, nk, block_k, d_aug).astype(jnp.float32))
    acc = jnp.sum(acc32 * (srow * (1.0 / 127.0)), axis=3) * sv[:, :, None, :]
    if d_aug > d:
        return acc[..., :d] / acc[..., d:d + 1]
    # D % 128 == 0: the denominator comes from the same quantized-P codes,
    # accumulated separately (the kernel's l scratch)
    denom = jnp.sum(pi * (srow * (1.0 / 127.0)), axis=(3, 4))
    return acc / denom[..., None]


@pytest.mark.parametrize("s,bq,bk", [(256, 128, 128), (384, 128, 384)])
def test_pv_kernel_matches_quantized_reference(s, bq, bk):
    rng = np.random.RandomState(5)
    q, k, v = _dit_like_qkv(rng, 1, 2, s, 64)
    scale = 64**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=bq, block_k=bk,
                               pv_int8=True, interpret=True)
    ref = _quantized_reference_pv(q, k, v, scale, bq, bk)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # fp32 op-order differences can flip a round-half tie on isolated P codes
    # (one code ±1 ⇒ ~1e-3 on that output element); everything else is exact
    assert err.mean() < 1e-5, err.mean()
    assert err.max() < 2e-3, err.max()


def test_pv_drift_vs_exact_attention_bounded():
    rng = np.random.RandomState(6)
    q, k, v = _dit_like_qkv(rng, 2, 4, 512, 64)
    scale = 64**-0.5
    out = flash_attention_int8(q, k, v, scale, block_q=256, block_k=256,
                               pv_int8=True, interpret=True)
    exact = _xla_attention(q, k, v, scale)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    ref_rms = float(np.sqrt((np.asarray(exact) ** 2).mean()))
    # measured on this distribution: the P/V rounding adds ~30-50% on top of
    # the QK^T-only drift (mean/rms ≈ 1.3e-2); same regression-guard margins
    assert err.mean() / ref_rms < 3e-2, (err.mean(), ref_rms)
    assert err.max() / ref_rms < 2e-1, (err.max(), ref_rms)


def test_pv_kernel_pads_ragged_sequence():
    rng = np.random.RandomState(7)
    s = 200
    q, k, v = _dit_like_qkv(rng, 1, 1, s, 64)
    scale = 64**-0.5
    out = flash_attention_int8(q, k, v, scale, pv_int8=True, interpret=True)
    assert out.shape == (1, 1, s, 64)
    exact = _xla_attention(q, k, v, scale)
    err = np.abs(np.asarray(out) - np.asarray(exact))
    assert err.mean() < 8e-3 and err.max() < 8e-2
