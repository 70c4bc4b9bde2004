"""Bit-exact pure-numpy reimplementation of torch's CPU ``Generator`` RNG.

The reference seeds one ``torch.Generator`` and threads it through every
stochastic draw (``run.py:94``; ``randn_tensor`` touchpoints
``pipeline_cogvideox_image2video_lowpass.py:388-391,419``). Round 2 delegated
to torch-CPU at runtime; this module removes that dependency by reproducing
the exact bit stream with numpy only (VERDICT r2 item #6):

* **Engine** — ``at::mt19937`` (torch CPU generators are Mersenne-Twister,
  not Philox — Philox is the CUDA generator): standard MT19937 with Knuth
  ``init_genrand`` seeding, identical to ``std::mt19937``. Vectorized block
  regeneration in numpy.
* **Uniforms** — ``transformation::uniform_real`` (TransformationHelper.h:85):
  float32 takes one engine word, ``(w & (2^24-1)) * 2^-24``; float64 takes two
  words ``(hi<<32)|lo`` and uses 53 bits.
* **Normals, bulk path** (``numel >= 16``, contiguous float32) —
  ``normal_fill`` (DistributionTemplates.h:169): draw ``numel`` uniforms
  in-place, Box-Muller each aligned 16-block via ``NormalFill16``; if
  ``numel % 16 != 0`` draw 16 fresh uniforms and recompute the last 16
  values. The float32 ``NormalFill16`` is the AVX2 variant
  (DistributionTemplates.h:115-140), whose log/sin/cos are the Cephes-style
  polynomial kernels in ``avx_mathfun.h`` — ported op-for-op below so every
  float32 rounding matches the SIMD code bit-for-bit.
* **Normals, serial path** (``numel < 16``) —
  ``normal_distribution<double>`` (DistributionsHelper.h:173-203): per value,
  two float64 uniforms, ``r=sqrt(-2*log1p(-u2))``, ``theta=2*pi*u1``, returns
  ``r*cos(theta)`` and caches ``r*sin(theta)`` **on the generator** for the
  next draw (the cache survives across ``randn`` calls, as in
  ``CPUGeneratorImpl``).

Validated bitwise against torch 2.x CPU across shapes/draw sequences in
``tests/test_torch_rng.py`` (the test imports torch; this module never does).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

_F32 = np.float32
_MASK32 = np.uint32(0xFFFFFFFF)

# ---------------------------------------------------------------------------
# at::mt19937 engine (aten/src/ATen/core/MT19937RNGEngine.h)
# ---------------------------------------------------------------------------

_N = 624
_M = 397
_MATRIX_A = np.uint32(0x9908B0DF)
_UPPER = np.uint32(0x80000000)
_LOWER = np.uint32(0x7FFFFFFF)


class MT19937:
    """Vectorized MT19937 matching ``at::mt19937`` / ``std::mt19937`` output."""

    def __init__(self, seed: int = 5489):
        self.manual_seed(seed)

    def manual_seed(self, seed: int) -> None:
        s = np.empty(_N, np.uint32)
        s[0] = seed & 0xFFFFFFFF
        prev = int(s[0])
        for j in range(1, _N):  # Knuth init_genrand
            prev = (1812433253 * (prev ^ (prev >> 30)) + j) & 0xFFFFFFFF
            s[j] = prev
        self._state = s
        self._idx = _N
        # torch CPUGeneratorImpl per-generator Box-Muller cache. torch also
        # keeps a float cache, but no reproduced draw path reads it: fp32
        # draws >= 16 elements use normal_fill (cacheless) and smaller ones
        # go through the double path, mirroring the dispatch here.
        self.next_double_normal_sample: Optional[float] = None

    def _regen(self) -> None:
        s = self._state
        new = np.empty(_N, np.uint32)

        def twist(cur, nxt, src):
            y = (cur & _UPPER) | (nxt & _LOWER)
            return src ^ (y >> np.uint32(1)) ^ np.where(y & 1, _MATRIX_A, np.uint32(0))

        # k in [0, 227): sources all from the old state
        new[0:_N - _M] = twist(s[0:_N - _M], s[1:_N - _M + 1], s[_M:_N])
        # k in [227, 454): new[k] needs new[k-227] from the chunk above
        new[_N - _M:2 * (_N - _M)] = twist(
            s[_N - _M:2 * (_N - _M)], s[_N - _M + 1:2 * (_N - _M) + 1], new[0:_N - _M]
        )
        # k in [454, 623): 169 entries, sources new[227:396]
        n3 = (_N - 1) - 2 * (_N - _M)
        new[2 * (_N - _M):_N - 1] = twist(
            s[2 * (_N - _M):_N - 1], s[2 * (_N - _M) + 1:_N], new[_N - _M:_N - _M + n3]
        )
        # k = 623 wraps to the freshly generated new[0] (in-place semantics)
        y = (s[_N - 1] & _UPPER) | (new[0] & _LOWER)
        new[_N - 1] = new[_M - 1] ^ (y >> np.uint32(1)) ^ (_MATRIX_A if (int(y) & 1) else np.uint32(0))

        self._state = new
        self._idx = 0

    @staticmethod
    def _temper(y: np.ndarray) -> np.ndarray:
        y = y ^ (y >> np.uint32(11))
        y = y ^ ((y << np.uint32(7)) & np.uint32(0x9D2C5680))
        y = y ^ ((y << np.uint32(15)) & np.uint32(0xEFC60000))
        return y ^ (y >> np.uint32(18))

    def words(self, n: int) -> np.ndarray:
        """Next ``n`` tempered 32-bit outputs as uint32."""
        out = np.empty(n, np.uint32)
        filled = 0
        while filled < n:
            if self._idx >= _N:
                self._regen()
            take = min(n - filled, _N - self._idx)
            out[filled:filled + take] = self._temper(self._state[self._idx:self._idx + take])
            self._idx += take
            filled += take
        return out

    def word(self) -> int:
        return int(self.words(1)[0])

    def random64(self) -> int:
        """CPUGeneratorImpl::random64: (hi << 32) | lo, hi drawn first."""
        w = self.words(2)
        return (int(w[0]) << 32) | int(w[1])


# ---------------------------------------------------------------------------
# avx_mathfun.h float32 kernels, op-for-op (every mul/add rounds f32, no fma)
# ---------------------------------------------------------------------------

_LOG_P = [_F32(v) for v in (
    7.0376836292e-2, -1.1514610310e-1, 1.1676998740e-1, -1.2420140846e-1,
    1.4249322787e-1, -1.6668057665e-1, 2.0000714765e-1, -2.4999993993e-1,
    3.3333331174e-1,
)]
_LOG_Q1 = _F32(-2.12194440e-4)
_LOG_Q2 = _F32(0.693359375)
_SQRTHF = _F32(0.707106781186547524)
_MIN_NORM_POS = np.uint32(0x00800000)

_DP1 = _F32(-0.78515625)
_DP2 = _F32(-2.4187564849853515625e-4)
_DP3 = _F32(-3.77489497744594108e-8)
_SINCOF = [_F32(v) for v in (-1.9515295891e-4, 8.3321608736e-3, -1.6666654611e-1)]
_COSCOF = [_F32(v) for v in (2.443315711809948e-5, -1.388731625493765e-3, 4.166664568298827e-2)]
_FOPI = _F32(1.27323954473516)
_TWO_PI_F32 = _F32(2.0 * math.pi)  # _mm256_set1_ps(2.0f * c10::pi<double>)


def _fma(a, b, c):
    """float32 fused multiply-add.

    Emulated through float64: the f32×f32 product is exact in f64 and the
    f64 sum is a single rounding, so ``f32(f64(a)*f64(b)+f64(c))`` equals the
    hardware ``vfmaddps`` except in double-rounding ties (< 2^-29 probability
    per op; none observed over 10^7 validated draws — see
    tests/test_torch_rng.py)."""
    return (
        np.asarray(a, np.float64) * np.asarray(b, np.float64) + np.asarray(c, np.float64)
    ).astype(np.float32)


def _log_ps(x: np.ndarray) -> np.ndarray:
    """``log256_ps`` (avx_mathfun.h:90-160) for positive float32 input.

    Matches the *compiled* kernel in libtorch_cpu.so (GCC contracts the
    mul/add intrinsic pairs into FMAs under -ffp-contract; sequence verified
    by disassembly of ``NormalFill16<float,true>::operator()``): the
    polynomial is an fma chain, and the assembly step is
    ``fma(P(x)*x, z, e*q1)`` then ``fnmadd(z, 0.5, ·)`` then ``fma(e, q2, x+·)``.
    """
    one = _F32(1.0)
    x = np.maximum(x, _MIN_NORM_POS.view(np.float32))
    imm0 = (x.view(np.uint32) >> np.uint32(23)).astype(np.int32)
    x = ((x.view(np.uint32) & np.uint32(0x807FFFFF)) | np.uint32(0x3F000000)).view(np.float32)
    e = (imm0 - 127).astype(np.float32)
    e = e + one

    mask = x < _SQRTHF
    tmp = np.where(mask, x, _F32(0.0))
    x = x - one
    e = e - np.where(mask, one, _F32(0.0))
    x = x + tmp

    z = x * x
    y = np.full_like(x, _LOG_P[0])
    for p in _LOG_P[1:]:
        y = _fma(y, x, p)
    y = y * x
    y = _fma(y, z, e * _LOG_Q1)
    y = _fma(z, _F32(-0.5), y)
    x = x + y
    x = _fma(e, _LOG_Q2, x)
    return x


def _sincos_ps(x: np.ndarray):
    """``sincos256_ps`` (avx_mathfun.h:426-520)."""
    sign_bit_sin = x.view(np.uint32) & np.uint32(0x80000000)
    x = (x.view(np.uint32) & np.uint32(0x7FFFFFFF)).view(np.float32)

    y = x * _FOPI
    imm2 = np.trunc(y).astype(np.int32)  # cvttps: toward zero
    imm2 = (imm2 + 1) & ~1
    y = imm2.astype(np.float32)
    imm4 = imm2

    swap_sign_bit_sin = ((imm2 & 4).astype(np.uint32)) << np.uint32(29)
    poly_mask = (imm2 & 2) == 0

    # magic pass, fma-contracted as compiled: x = fma(y, DPk, x) three times
    x = _fma(y, _DP1, x)
    x = _fma(y, _DP2, x)
    x = _fma(y, _DP3, x)

    sign_bit_cos = ((~(imm4 - 2) & 4).astype(np.uint32)) << np.uint32(29)
    sign_bit_sin = sign_bit_sin ^ swap_sign_bit_sin

    z = x * x
    # cos polynomial: fma chain, then the compiled kernel fuses the second
    # *z with the -z*0.5 subtraction into one fmsub (disassembly-verified)
    half_z = z * _F32(0.5)
    yc = np.full_like(x, _COSCOF[0])
    yc = _fma(yc, z, _COSCOF[1])
    yc = _fma(yc, z, _COSCOF[2])
    yc = yc * z
    yc = _fma(yc, z, -half_z)
    yc = yc + _F32(1.0)

    ys = np.full_like(x, _SINCOF[0])
    ys = _fma(ys, z, _SINCOF[1])
    ys = _fma(ys, z, _SINCOF[2])
    ys = ys * z
    ys = _fma(ys, x, x)

    sin_val = np.where(poly_mask, ys, yc)
    cos_val = np.where(poly_mask, yc, ys)
    s = (sin_val.view(np.uint32) ^ sign_bit_sin).view(np.float32)
    c = (cos_val.view(np.uint32) ^ sign_bit_cos).view(np.float32)
    return s, c


def _normal_fill_16_blocks(blocks: np.ndarray) -> np.ndarray:
    """AVX2 ``NormalFill16<float>`` over an [n, 16] array of uniforms
    (DistributionTemplates.h:115-140), mean 0 / std 1 (fma(x,1,0) == x)."""
    u1 = _F32(1.0) - blocks[:, :8]
    u2 = blocks[:, 8:]
    radius = np.sqrt(_F32(-2.0) * _log_ps(u1))
    theta = _TWO_PI_F32 * u2
    s, c = _sincos_ps(theta)
    out = np.empty_like(blocks)
    out[:, :8] = radius * c
    out[:, 8:] = radius * s
    return out


# ---------------------------------------------------------------------------
# Generator facade (torch.Generator CPU semantics)
# ---------------------------------------------------------------------------


class TorchCPUGenerator:
    """Drop-in for ``torch.Generator()`` + ``manual_seed`` for rand/randn."""

    def __init__(self, seed: int = 5489):
        self.engine = MT19937(seed)

    def manual_seed(self, seed: int) -> "TorchCPUGenerator":
        self.engine.manual_seed(seed)
        return self

    # -- uniforms ----------------------------------------------------------

    def _uniform_f32(self, n: int) -> np.ndarray:
        w = self.engine.words(n)
        return ((w & np.uint32((1 << 24) - 1)).astype(np.float32)) * _F32(2.0 ** -24)

    def _uniform_f64(self, n: int) -> np.ndarray:
        w = self.engine.words(2 * n).astype(np.uint64)
        v = (w[0::2] << np.uint64(32)) | w[1::2]
        return ((v & np.uint64((1 << 53) - 1)).astype(np.float64)) * (2.0 ** -53)

    def rand(self, shape: Sequence[int], dtype=np.float32) -> np.ndarray:
        """``torch.rand``: uniform_kernel draws serially, one value at a time
        (float32: one word each; float64: two words each)."""
        n = int(np.prod(shape)) if len(shape) else 1
        if np.dtype(dtype) == np.float64:
            out = self._uniform_f64(n)
        else:
            out = self._uniform_f32(n).astype(dtype)
        return out.reshape(shape)

    # -- normals -----------------------------------------------------------

    def _randn_serial_f64(self, n: int) -> np.ndarray:
        """``normal_distribution<double>`` per value, with the generator's
        persistent second-sample cache (DistributionsHelper.h:173-203)."""
        out = np.empty(n, np.float64)
        eng = self.engine
        for i in range(n):
            if eng.next_double_normal_sample is not None:
                out[i] = eng.next_double_normal_sample
                eng.next_double_normal_sample = None
                continue
            u1 = ((eng.random64() & ((1 << 53) - 1))) * (2.0 ** -53)
            u2 = ((eng.random64() & ((1 << 53) - 1))) * (2.0 ** -53)
            r = math.sqrt(-2.0 * math.log1p(-u2))
            theta = 2.0 * math.pi * u1
            eng.next_double_normal_sample = r * math.sin(theta)
            out[i] = r * math.cos(theta)
        return out

    def randn(self, shape: Sequence[int], dtype=np.float32) -> np.ndarray:
        n = int(np.prod(shape)) if len(shape) else 1
        dt = np.dtype(dtype)
        if dt == np.float32 and n >= 16:
            # normal_fill (DistributionTemplates.h:169-195)
            data = self._uniform_f32(n)
            # aligned full blocks: offsets 0, 16, ... while i < size - 15
            n_aligned = ((n - 16) // 16 + 1) * 16
            data[:n_aligned] = _normal_fill_16_blocks(
                data[:n_aligned].reshape(-1, 16)
            ).reshape(-1)
            if n % 16 != 0:
                tail = self._uniform_f32(16)
                data[n - 16:] = _normal_fill_16_blocks(tail.reshape(1, 16)).reshape(-1)
            return data.reshape(shape)
        if dt == np.float64 and n >= 16:
            # double normal_fill uses the scalar NormalFill16<double> with
            # std::log/cos/sin on doubles
            data = self._uniform_f64(n)
            n_aligned = ((n - 16) // 16 + 1) * 16
            blocks = data[:n_aligned].reshape(-1, 16)
            data[:n_aligned] = self._fill16_f64(blocks).reshape(-1)
            if n % 16 != 0:
                tail = self._uniform_f64(16)
                data[n - 16:] = self._fill16_f64(tail.reshape(1, 16)).reshape(-1)
            return data.reshape(shape)
        # serial path (numel < 16): double math, cast at the end
        return self._randn_serial_f64(n).astype(dt).reshape(shape)

    @staticmethod
    def _fill16_f64(blocks: np.ndarray) -> np.ndarray:
        out = np.empty_like(blocks)
        u1 = 1.0 - blocks[:, :8]
        u2 = blocks[:, 8:]
        radius = np.sqrt(-2.0 * np.log(u1))
        theta = (2.0 * math.pi) * u2
        out[:, :8] = radius * np.cos(theta)
        out[:, 8:] = radius * np.sin(theta)
        return out
