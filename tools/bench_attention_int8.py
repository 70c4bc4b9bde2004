"""Micro-bench the int8-QK^T flash kernel vs the bf16 kernel at the
CogVideoX-5b shape (B2·H48·S17776·D64). Includes the XLA-side quantize pass
in the int8 timing (it is part of the call's real cost).

Axon timing discipline as in tools/bench_attention.py. ONE TPU process.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from alg_tpu.ops.flash_attention import flash_attention
from alg_tpu.ops.flash_attention_int8 import flash_attention_int8


def bench(fn, out_slicer, n=8):
    out = fn()
    out_slicer(out)  # compile + run
    t0 = time.perf_counter()
    out_slicer(out)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    out_slicer(out)
    return max((time.perf_counter() - t0 - t_fetch) / n, 1e-9)


def main():
    b, h, s, d = 2, 48, 17776, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
    flops = 4 * b * h * s * s * d
    sl = lambda o: np.asarray(o[0, 0, 0, :1])

    dt = bench(lambda: flash_attention(q, k, v, scale=d**-0.5, stable=False), sl)
    print(f"bf16 fast path: {dt*1e3:.1f} ms, {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    # bf16 kernel at the int8 kernel's grid — isolates grid/DMA effects
    dt = bench(
        lambda: flash_attention(q, k, v, scale=d**-0.5, stable=False,
                                block_q=808, block_k=1616), sl
    )
    print(f"bf16 fast 808/1616: {dt*1e3:.1f} ms, {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    for bq, bk, extra in ((None, None, {}), (808, 808, {}),
                          (None, None, {"no_exp2": True}),
                          (1616, 1616, {}),
                          (None, None, {"pv_int8": True}),
                          (808, 808, {"pv_int8": True}),
                          (1616, 1616, {"pv_int8": True})):
        kw = dict(extra)
        if bq is not None:
            kw.update(block_q=bq, block_k=bk)
        try:
            dt = bench(lambda: flash_attention_int8(q, k, v, scale=d**-0.5, **kw), sl)
            print(f"int8 {'qk+pv' if extra.get('pv_int8') else 'qk'} "
                  f"{bq or 'auto'}/{bk or 'auto'} {extra}: {dt*1e3:.1f} ms, "
                  f"{flops/dt/1e12:.1f} TFLOP/s-equiv", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"int8 {bq}/{bk} {extra}: FAIL {type(e).__name__}: {e}", flush=True)

    # numeric sanity at full scale vs the bf16 kernel
    a = flash_attention(q, k, v, scale=d**-0.5, stable=False)
    da = np.asarray(a[0, :2, :256].astype(jnp.float32))
    rms = float(np.sqrt((da**2).mean()))
    for label, kw in (("qk", {}), ("qk+pv", {"pv_int8": True})):
        bq8 = flash_attention_int8(q, k, v, scale=d**-0.5, **kw)
        db = np.asarray(bq8[0, :2, :256].astype(jnp.float32))
        err = np.abs(da - db)
        print(f"drift vs bf16 ({label}): mean/rms {err.mean()/rms:.2e}, "
              f"max/rms {err.max()/rms:.2e}")


if __name__ == "__main__":
    main()
