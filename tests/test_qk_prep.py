"""Fused qk-norm+RoPE kernel vs the XLA composition it replaces.

The kernel must reproduce ``layer_norm`` (fp32 stats) + interleaved RoPE
op-for-op; on CPU it runs in pallas interpret mode, on TPU the compiled
kernel path is exercised by the bench/TPU runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.models import layers as L
from alg_tpu.models import rope as R
from alg_tpu.ops.qk_prep import _choose_block_s, qk_norm_rope


def _inputs(dtype, s=256, d=64, b=2, h=3, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(b, h, s, d).astype(np.float32)).astype(dtype)
    normp = {
        "scale": jnp.asarray(1.0 + 0.1 * r.randn(d).astype(np.float32)),
        "bias": jnp.asarray(0.1 * r.randn(d).astype(np.float32)),
    }
    ang = r.rand(s, d // 2).astype(np.float32) * 6.28
    cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=1))
    sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=1))
    return x, normp, cos, sin


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32], ids=["bf16", "f32"])
def test_qk_prep_kernel_matches_xla_composition(dtype):
    x, normp, cos, sin = _inputs(dtype)
    ref = R.apply_rope_interleaved(L.layer_norm(normp, x, 1e-6), cos, sin)
    out = qk_norm_rope(x, normp, cos, sin, 1e-6, force="pallas", interpret=True)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    # bf16 needs a relative term too: a one-ulp rounding difference at
    # magnitude 4 is 0.03125, legitimately above any fixed small atol
    atol, rtol = (2e-2, 1e-2) if dtype == jnp.bfloat16 else (2e-6, 0.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=rtol
    )


def test_qk_prep_identity_rows_preserve_text_prefix():
    """Identity rope rows (cos=1, sin=0) must reduce to the pure norm."""
    x, normp, _, _ = _inputs(jnp.float32, s=128)
    cos = jnp.ones((128, 64), jnp.float32)
    sin = jnp.zeros((128, 64), jnp.float32)
    out = qk_norm_rope(x, normp, cos, sin, 1e-6, force="pallas", interpret=True)
    ref = L.layer_norm(normp, x, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_choose_block_s():
    assert _choose_block_s(17776) == 1616  # CogVideoX joint seq (226 + 17550)
    assert _choose_block_s(2048) == 2048
    assert _choose_block_s(12) == 0  # tiny odd shapes → XLA fallback
    assert _choose_block_s(256) == 256


def test_dispatch_falls_back_on_cpu():
    """force=None on a CPU backend must take the XLA path (bitwise equal)."""
    x, normp, cos, sin = _inputs(jnp.float32)
    ref = R.apply_rope_interleaved(L.layer_norm(normp, x, 1e-6), cos, sin)
    out = qk_norm_rope(x, normp, cos, sin, 1e-6)
    if jax.devices()[0].platform not in ("tpu", "axon"):
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flash_aligned_block_selection():
    """Divisor-aligned flash-attention block picks (CPU-checkable logic)."""
    from alg_tpu.ops.flash_attention import _aligned_block

    assert _aligned_block(17776) == 1616            # CogVideoX joint seq
    assert _aligned_block(17776, hi=1024) == 808    # stable-path cap
    assert _aligned_block(1776) == 1776  # whole seq fits one block
    assert _aligned_block(63) == 0                  # prime-ish → padding path
    assert _aligned_block(2048) == 2048


# ---------------------------------------------------------------------------
# rope-only fused kernel (Wan / Hunyuan path — norm can't fuse per-head there)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32], ids=["bf16", "f32"])
@pytest.mark.parametrize("d", [64, 128])
def test_rope_kernel_matches_xla(dtype, d):
    from alg_tpu.ops.qk_prep import rope_interleaved

    x, _, cos, sin = _inputs(dtype, s=256, d=d)
    ref = R.apply_rope_interleaved(x, cos, sin)
    out = rope_interleaved(x, cos, sin, force="pallas", interpret=True)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    atol, rtol = (2e-2, 1e-2) if dtype == jnp.bfloat16 else (2e-6, 0.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=rtol
    )


def test_rope_kernel_grad_matches_xla_autodiff():
    """custom_vjp backward (XLA-compose) vs autodiff of the reference form."""
    from alg_tpu.ops.qk_prep import rope_interleaved

    x, _, cos, sin = _inputs(jnp.float32, s=128)

    def f_kernel(x_):
        return (rope_interleaved(x_, cos, sin, force="pallas", interpret=True) ** 2).sum()

    def f_ref(x_):
        return (R.apply_rope_interleaved(x_, cos, sin) ** 2).sum()

    gk = jax.grad(f_kernel)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-5, rtol=1e-5)


def test_rope_dispatch_falls_back_on_cpu():
    from alg_tpu.ops.qk_prep import rope_interleaved

    x, _, cos, sin = _inputs(jnp.float32)
    ref = R.apply_rope_interleaved(x, cos, sin)
    out = rope_interleaved(x, cos, sin)
    if jax.devices()[0].platform not in ("tpu", "axon"):
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
