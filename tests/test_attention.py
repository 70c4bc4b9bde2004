"""Flash-attention kernel parity vs a float64 numpy reference (runs on the
real TPU chip; the XLA fallback is covered implicitly by CPU-mesh tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.ops.flash_attention import flash_attention, supports_flash


def _np_ref(q, k, v, scale, causal=False, kv_len=None, bias=None):
    l = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)) * scale
    if bias is not None:
        l = l + bias
    sq, sk = q.shape[2], k.shape[2]
    if causal:
        m = np.tril(np.ones((sq, sk), bool), k=sk - sq)
        l = np.where(m, l, -np.inf)
    if kv_len is not None:
        m = np.arange(sk)[None, :] < kv_len[:, None]
        l = np.where(m[:, None, None, :], l, -np.inf)
    p = np.exp(l - l.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64))


def _qkv(rng, b, h, sq, sk, d):
    return (
        rng.randn(b, h, sq, d).astype(np.float32),
        rng.randn(b, h, sk, d).astype(np.float32),
        rng.randn(b, h, sk, d).astype(np.float32),
    )


pytestmark = [
    pytest.mark.chip,  # part of the bounded on-TPU gate (`pytest -m chip`)
    pytest.mark.skipif(
        not supports_flash(None, None, None, None), reason="no TPU backend"
    ),
]


@pytest.mark.parametrize("stable", [True, False])
def test_dense_padded(stable, rng):
    q, k, v = _qkv(rng, 1, 2, 300, 300, 64)
    ref = _np_ref(q, k, v, 64**-0.5)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=64**-0.5, stable=stable
    )
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=5e-6)


@pytest.mark.parametrize("stable", [True, False])
def test_kv_len(stable, rng):
    q, k, v = _qkv(rng, 2, 2, 200, 200, 64)
    kv_len = np.array([70, 200])
    ref = _np_ref(q, k, v, 64**-0.5, kv_len=kv_len)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=64**-0.5,
        kv_len=jnp.asarray(kv_len, jnp.int32), stable=stable,
    )
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=5e-6)


def test_causal(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 256, 64)
    ref = _np_ref(q, k, v, 64**-0.5, causal=True)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=64**-0.5, causal=True
    )
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=5e-6)


def test_bias(rng):
    q, k, v = _qkv(rng, 1, 4, 150, 150, 64)
    bias = (rng.randn(4, 150, 150) * 0.5).astype(np.float32)
    ref = _np_ref(q, k, v, 64**-0.5, bias=bias)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=64**-0.5, bias=jnp.asarray(bias)
    )
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=5e-6)


def test_cross_attention_shapes(rng):
    q, k, v = _qkv(rng, 1, 2, 300, 77, 64)
    ref = _np_ref(q, k, v, 64**-0.5)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=5e-6)


def test_fast_path_large_logits_overflow_documented(rng):
    """The fast path trades overflow-safety for speed: logits beyond ~±80 are
    out of contract. This documents the boundary — WITHIN it results match."""
    q, k, v = _qkv(rng, 1, 1, 128, 128, 64)
    q *= 4.0  # logits up to ~±40 — still within the fp32 exp2 budget
    ref = _np_ref(q, k, v, 64**-0.5)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=64**-0.5, stable=False
    )
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=2e-5)


@pytest.mark.parametrize("stable", [True, False])
def test_divisor_aligned_blocks(stable, rng):
    """S=1776 is not divisible by the default blocks; the kernel picks an
    aligned divisor block — no pad/slice — and must match the padded
    path's numerics (measured ~8% faster at production scale)."""
    from alg_tpu.ops.flash_attention import _aligned_block

    assert _aligned_block(1776) == 1776  # whole seq fits one block
    q, k, v = _qkv(rng, 1, 2, 1776, 1776, 64)
    scale = 64**-0.5
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, stable=stable)
    )
    ref = _np_ref(q, k, v, scale)
    np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.fast
def test_aligned_block_joint_tile_cap():
    """The divisor-aligned pair must respect the scoped-vmem joint-tile cap:
    S=2000 would naively pick 2000x2000 (16 MB fp32 logits alone) — the
    selection must shrink block_q to a smaller divisor instead, and the int8
    kernel's selection must respect its tighter documented cap."""
    from alg_tpu.ops.flash_attention import _aligned_block
    from alg_tpu.ops.flash_attention_int8 import _aligned_or_pad

    # mirror of flash_attention's selection loop (non-stable path)
    def select(s, stable):
        aq = _aligned_block(s, hi=1024 if stable else 2048)
        ak = _aligned_block(s, hi=2048)
        cap = (1024 * 2048) if stable else (1616 * 1616)
        while aq and ak and aq * ak > cap:
            aq = _aligned_block(s, lo=256, hi=aq - 8)
        return aq, ak

    aq, ak = select(2000, stable=False)
    assert (aq, ak) == (1000, 2000)  # 2 MB-elem pair, not 2000x2000
    aq, ak = select(2000, stable=True)
    assert aq * ak <= 1024 * 2048
    # production shape keeps its measured-good blocks
    assert select(17776, stable=False) == (1616, 1616)
    assert select(17776, stable=True) == (808, 1616)

    # int8 kernel: documented cap bq*bk <= 808*1616
    bq, bk, sp = _aligned_or_pad(2000, 512, 1024)
    assert bq * bk <= 808 * 1616 and sp == 2000
    bq, bk, sp = _aligned_or_pad(17776, 512, 1024)
    assert (bq, bk, sp) == (808, 1616, 17776)


@pytest.mark.parametrize("stable", [True, False])
def test_vmem_capped_aligned_blocks_numerics(stable, rng):
    """S=2000 (the joint-tile-cap fallback path) still computes correctly."""
    q, k, v = _qkv(rng, 1, 2, 2000, 2000, 64)
    scale = 64**-0.5
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, stable=stable)
    )
    np.testing.assert_allclose(out, _np_ref(q, k, v, scale), atol=2e-3)


def _np_lse2(q, k, scale, kv_len=None):
    """Base-2 row log-sum-exp of the scaled logits (float64)."""
    l = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)) * scale
    if kv_len is not None:
        m = np.arange(k.shape[2])[None, :] < kv_len[:, None]
        l = np.where(m[:, None, None, :], l, -np.inf)
    mx = l.max(-1)
    mx_safe = np.where(np.isneginf(mx), 0.0, mx)
    s = np.exp(l - mx_safe[..., None]).sum(-1)
    with np.errstate(divide="ignore"):
        return (mx_safe + np.log(s)) * np.log2(np.e)  # -inf where s == 0


@pytest.mark.parametrize("stable", [True, False])
def test_return_residuals_lse(stable, rng):
    """return_residuals: the second output is the base-2 row lse the ring-
    attention merge consumes; the first output must equal the plain call."""
    q, k, v = _qkv(rng, 2, 2, 300, 300, 64)
    scale = 64**-0.5
    o_plain = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, stable=stable))
    o, lse = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, stable=stable, return_residuals=True
    )
    np.testing.assert_array_equal(np.asarray(o), o_plain)
    assert lse.shape == (2, 2, 300)
    np.testing.assert_allclose(np.asarray(lse), _np_lse2(q, k, scale), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("stable", [True, False])
def test_return_residuals_kv_len_and_fully_masked(stable, rng):
    """kv_len composes with residuals. A fully masked batch row (kv_len=0 —
    a ring chunk entirely beyond the joint sequence) must come out with an
    lse so small that the ring merge zero-weights it against any chunk that
    saw at least one real key: the fast path gives exactly (o=0, lse=-inf);
    the stable path's running max bottoms out at -1e30, so its lse is ~-1e30
    and its (unnormalized-garbage) output carries weight exp2(-1e30-m) == 0.
    A GLOBALLY all-masked query row is the one unsupported case (never occurs:
    the joint sequence always has >= 1 valid key)."""
    q, k, v = _qkv(rng, 2, 2, 256, 256, 64)
    scale = 64**-0.5
    kv_len = np.array([120, 0], np.int32)
    o, lse = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        kv_len=jnp.asarray(kv_len), stable=stable, return_residuals=True,
    )
    o, lse = np.asarray(o), np.asarray(lse)
    ref_lse = _np_lse2(q, k, scale, kv_len=kv_len)
    np.testing.assert_allclose(lse[0], ref_lse[0], rtol=2e-5, atol=2e-4)
    assert (lse[1] <= -1e29).all()
    if not stable:
        assert np.isneginf(lse[1]).all()
        assert (o[1] == 0).all()

    # the merge contract: a masked chunk contributes nothing
    from alg_tpu.ops.attention import _ring_merge

    real_o = jnp.asarray(np.random.RandomState(0).randn(*o[1:2].shape).astype(np.float32))
    real_lse = jnp.asarray(np.full(lse[1:2].shape, 3.0, np.float32))
    merged_o, merged_lse = _ring_merge(
        real_o, real_lse, jnp.asarray(o[1:2], jnp.float32), jnp.asarray(lse[1:2])
    )
    np.testing.assert_array_equal(np.asarray(merged_o), np.asarray(real_o))
    np.testing.assert_array_equal(np.asarray(merged_lse), np.asarray(real_lse))
