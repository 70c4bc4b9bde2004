"""Native C++ host-quantization ops are BITWISE identical to the numpy
reference math in ops/quant.py (which is itself golden-tested against the
quantized-matmul semantics). Shapes cover stacked [L, in, out] block kernels,
2-D kernels, non-multiple-of-8 out dims, and both f32 and bf16 storage.
"""

import numpy as np
import pytest

import ml_dtypes

from alg_tpu import native

pytestmark = pytest.mark.fast

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _numpy_w8(w):
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale


def _numpy_w4(w, group):
    w = np.asarray(w, np.float32)
    kin = w.shape[-2]
    lead = w.shape[:-2]
    g_cnt = kin // group
    wg = w.reshape(lead + (g_cnt, group, w.shape[-1]))
    absmax = np.abs(wg).max(axis=-2, keepdims=True)
    s4 = np.maximum(absmax, 1e-12) / 7.0
    q4 = np.clip(np.round(wg / s4), -7, 7).astype(np.int8)
    q4 = q4.reshape(lead + (kin, w.shape[-1]))
    packed = (q4[..., 0::2, :] & 0x0F) | (q4[..., 1::2, :] << 4)
    s4 = s4.reshape(lead + (g_cnt, w.shape[-1]))
    s8 = np.maximum((7.0 * s4).max(axis=-2, keepdims=True), 1e-12) / 127.0
    return packed, s4, s8


def _cases():
    rng = np.random.default_rng(7)
    shapes = [(256, 96), (4, 128, 40), (2, 3, 256, 17), (512, 512)]
    out = []
    for shape in shapes:
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        # exercise ties (.5 multiples) and exact zeros: round-half-even matters
        w.flat[:: 17] = 0.0
        out.append(("f32", w))
        out.append(("bf16", w.astype(ml_dtypes.bfloat16)))
    return out


@requires_native
@pytest.mark.parametrize("tag,w", _cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_w8_bitwise(tag, w):
    wq_n, sc_n = native.quant_w8(w)
    wq_r, sc_r = _numpy_w8(w)
    np.testing.assert_array_equal(wq_n, wq_r)
    np.testing.assert_array_equal(sc_n, sc_r)
    assert wq_n.dtype == np.int8 and sc_n.dtype == np.float32
    assert sc_n.shape == w.shape[:-2] + (1, w.shape[-1])


@requires_native
@pytest.mark.parametrize("tag,w", _cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_w4_bitwise(tag, w):
    group = 64 if w.shape[-2] % 128 else 128
    p_n, s4_n, s8_n = native.quant_w4(w, group)
    p_r, s4_r, s8_r = _numpy_w4(w, group)
    np.testing.assert_array_equal(p_n, p_r)
    np.testing.assert_array_equal(s4_n, s4_r)
    np.testing.assert_array_equal(s8_n, s8_r)
    assert p_n.shape == w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1])
    assert s4_n.shape == w.shape[:-2] + (w.shape[-2] // group, w.shape[-1])


@requires_native
def test_bf16_to_f32_exact():
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((1000, 257)) * 10).astype(ml_dtypes.bfloat16)
    out = native.bf16_to_f32(w)
    np.testing.assert_array_equal(out, w.astype(np.float32))
    # all bf16 specials widen exactly: subnormals, inf, max finite
    specials = np.array(
        [0.0, -0.0, np.inf, -np.inf, 3.3895314e38, 1e-38, -1e-40], np.float32
    ).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        native.bf16_to_f32(specials), specials.astype(np.float32)
    )


@requires_native
def test_quantize_kernel_uses_native(monkeypatch):
    """ops.quant.quantize_kernel routes through the native path and matches
    the forced-numpy fallback exactly (device-array round trip included)."""
    import jax.numpy as jnp

    from alg_tpu.ops import quant

    rng = np.random.default_rng(11)
    w = jnp.asarray((rng.standard_normal((2, 128, 64)) * 0.1).astype(np.float32))
    wq_nat, sc_nat = quant.quantize_kernel(w)
    monkeypatch.setattr(native, "quant_w8", lambda *a, **k: None)
    monkeypatch.setattr(native, "quant_w4", lambda *a, **k: None)
    wq_ref, sc_ref = quant.quantize_kernel(w)
    np.testing.assert_array_equal(np.asarray(wq_nat), np.asarray(wq_ref))
    np.testing.assert_array_equal(np.asarray(sc_nat), np.asarray(sc_ref))
    wb = w.astype(jnp.bfloat16)
    p_nat = quant.quantize_kernel_w4(wb)
    monkeypatch.undo()
    monkeypatch.setattr(native, "quant_w4", lambda *a, **k: None)
    p_ref = quant.quantize_kernel_w4(wb)
    for a, b in zip(p_nat, p_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
