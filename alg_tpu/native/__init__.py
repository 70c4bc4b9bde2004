"""Native (C++) host-side runtime ops for alg_tpu.

The TPU compute path is jax/XLA/Pallas; the HOST side of the runtime —
checkpoint dtype widening and quantize-before-streaming — is pure memory-bound
CPU work that numpy runs at ~0.03 GB/s (eight temporaries per kernel). This
package compiles a small C++ library (``quantize.cpp``) on first use with the
system ``g++`` and exposes it through ctypes:

* ``bf16_to_f32(arr)``       — widen a bf16 (uint16-viewed) array
* ``quant_w8(w)``            — fused per-output-channel int8 quantization
* ``quant_w4(w, group)``     — fused group-wise int4 quantize + nibble pack

All three accept float32 or bfloat16 numpy input and are BITWISE identical to
the numpy reference path in :mod:`alg_tpu.ops.quant` (tests/test_native_quant.py
asserts this). If ``g++`` is unavailable or compilation fails, callers fall
back to numpy transparently; ``ALG_TPU_NO_NATIVE=1`` forces the fallback.

The compiled ``.so`` is cached in ``_build/`` keyed by a hash of the source
and compiler version, so the one-time ~2 s compile never repeats.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "quantize.cpp"
_BUILD = _DIR / "_build"

_lib = None
_lib_failed = False


def _compiler() -> str:
    return os.environ.get("CXX", "g++")


def _build_key() -> str:
    h = hashlib.sha256(_SRC.read_bytes())
    try:
        ver = subprocess.run(
            [_compiler(), "--version"], capture_output=True, text=True, timeout=30
        ).stdout.splitlines()[0]
    except Exception:
        ver = "unknown"
    h.update(ver.encode())
    # -march=native binaries are host-specific: key on the CPU's ISA flags so
    # a cache dir shared across machines (or a stray committed .so) can never
    # be loaded on a CPU it wasn't built for (SIGILL is uncatchable)
    import platform

    h.update(platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    return h.hexdigest()[:16]


def _compile() -> Path:
    _BUILD.mkdir(exist_ok=True)
    so = _BUILD / f"libalg_native_{_build_key()}.so"
    if so.exists():
        return so
    tmp = so.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [
        _compiler(), "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
        "-o", str(tmp), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=300)
    except subprocess.CalledProcessError as e:  # pragma: no cover - toolchain issue
        raise RuntimeError(f"native build failed: {e.stderr[-2000:]}") from e
    os.replace(tmp, so)
    # keep the cache dir bounded: drop stale builds of older source revisions
    for old in _BUILD.glob("libalg_native_*.so"):
        if old != so:
            try:
                old.unlink()
            except OSError:
                pass
    return so


def _load() -> "ctypes.CDLL | None":
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("ALG_TPU_NO_NATIVE"):
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_compile()))
    except Exception as e:  # pragma: no cover - toolchain issue
        log.warning("alg_tpu native ops unavailable (%s); using numpy fallback", e)
        _lib_failed = True
        return None
    i64, i8p, f32p, u16p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint16),
    )
    lib.alg_bf16_to_f32.argtypes = [u16p, f32p, i64, ctypes.c_int]
    lib.alg_quant_w8_f32.argtypes = [f32p, i64, i64, i64, i8p, f32p, ctypes.c_int]
    lib.alg_quant_w8_bf16.argtypes = [u16p, i64, i64, i64, i8p, f32p, ctypes.c_int]
    lib.alg_quant_w4_f32.argtypes = [f32p, i64, i64, i64, i64, i8p, f32p, f32p, ctypes.c_int]
    lib.alg_quant_w4_bf16.argtypes = [u16p, i64, i64, i64, i64, i8p, f32p, f32p, ctypes.c_int]
    for fn in (lib.alg_bf16_to_f32, lib.alg_quant_w8_f32, lib.alg_quant_w8_bf16,
               lib.alg_quant_w4_f32, lib.alg_quant_w4_bf16):
        fn.restype = None
    _lib = lib
    # post-load self-check: a tiny quant must match the numpy math bitwise,
    # else fall back (guards against a subtly miscompiled binary)
    try:
        w = (np.arange(24, dtype=np.float32).reshape(6, 4) - 11.5) * 0.37
        wq, sc = quant_w8(w)
        absmax = np.max(np.abs(w), axis=-2, keepdims=True)
        scale = np.maximum(absmax, 1e-12) / 127.0
        ref = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        if not (np.array_equal(wq, ref) and np.array_equal(sc, scale)):
            raise RuntimeError("self-check mismatch")
    except Exception as e:
        log.warning("alg_tpu native ops failed self-check (%s); numpy fallback", e)
        _lib = None
        _lib_failed = True
    return _lib


def available() -> bool:
    """True if the compiled native library is usable on this host."""
    return _load() is not None


def _nthreads() -> int:
    n = os.cpu_count() or 1
    try:
        n = max(1, min(int(os.environ.get("ALG_TPU_NATIVE_THREADS", n)), 64))
    except ValueError:
        pass
    return n


def _is_bf16(a: np.ndarray) -> bool:
    return a.dtype.kind == "V" or str(a.dtype) == "bfloat16"


def _as_src(w: np.ndarray):
    """(contiguous array, is_bf16) for a float32 or bfloat16 input."""
    if _is_bf16(w):
        return np.ascontiguousarray(w).view(np.uint16), True
    return np.ascontiguousarray(w, dtype=np.float32), False


def bf16_to_f32(w: np.ndarray) -> "np.ndarray | None":
    """Widen a bfloat16 numpy array to float32 (None if native unavailable)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(w).view(np.uint16)
    out = np.empty(w.shape, np.float32)
    lib.alg_bf16_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size, _nthreads(),
    )
    return out


def quant_w8(w: np.ndarray):
    """Fused per-output-channel symmetric int8 of ``w[..., in, out]``.

    Returns ``(wq int8 [..., in, out], scale f32 [..., 1, out])`` matching
    :func:`alg_tpu.ops.quant.quantize_kernel`'s numpy math bitwise, or None
    if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    src, is_bf16 = _as_src(w)
    lead = int(np.prod(w.shape[:-2], dtype=np.int64)) if w.ndim > 2 else 1
    kin, kout = w.shape[-2], w.shape[-1]
    wq = np.empty(w.shape, np.int8)
    scale = np.empty(w.shape[:-2] + (1, kout), np.float32)
    fn = lib.alg_quant_w8_bf16 if is_bf16 else lib.alg_quant_w8_f32
    ptr = ctypes.POINTER(ctypes.c_uint16 if is_bf16 else ctypes.c_float)
    fn(src.ctypes.data_as(ptr), lead, kin, kout,
       wq.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
       scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _nthreads())
    return wq, scale


def quant_w4(w: np.ndarray, group: int = 128):
    """Fused group-wise int4 quantize + nibble pack of ``w[..., in, out]``.

    Returns ``(packed int8 [..., in/2, out], s4 f32 [..., in/group, out],
    s8 f32 [..., 1, out])`` matching
    :func:`alg_tpu.ops.quant.quantize_kernel_w4` bitwise, or None if the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    kin, kout = w.shape[-2], w.shape[-1]
    if kin % group or group % 2:
        raise ValueError(f"in dim {kin} not divisible by even group {group}")
    src, is_bf16 = _as_src(w)
    lead = int(np.prod(w.shape[:-2], dtype=np.int64)) if w.ndim > 2 else 1
    packed = np.empty(w.shape[:-2] + (kin // 2, kout), np.int8)
    s4 = np.empty(w.shape[:-2] + (kin // group, kout), np.float32)
    s8 = np.empty(w.shape[:-2] + (1, kout), np.float32)
    fn = lib.alg_quant_w4_bf16 if is_bf16 else lib.alg_quant_w4_f32
    ptr = ctypes.POINTER(ctypes.c_uint16 if is_bf16 else ctypes.c_float)
    fn(src.ctypes.data_as(ptr), lead, kin, kout, group,
       packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
       s4.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       s8.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _nthreads())
    return packed, s4, s8
