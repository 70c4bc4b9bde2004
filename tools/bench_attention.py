"""Micro-bench the Pallas flash-attention kernel at the CogVideoX-5b shape.

Axon timing: async dispatch, so brackets are forced with tiny fetches and the
fetch latency is measured separately and subtracted (see bench.py).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from alg_tpu.ops.flash_attention import flash_attention


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

    for stable in (False, True):
        for bq, bk in ((512, 2048), (1024, 2048), (512, 4096), (256, 2048)):
            try:
                dt = bench(
                    lambda: flash_attention(q, k, v, scale=d**-0.5, stable=stable,
                                            block_q=bq, block_k=bk),
                    lambda o: np.asarray(o[0, 0, 0, :1]),
                )
                print(f"stable={stable} bq={bq} bk={bk}: {dt*1e3:.1f} ms, "
                      f"{flops/dt/1e12:.1f} TFLOP/s")
            except Exception as e:  # noqa: BLE001
                print(f"stable={stable} bq={bq} bk={bk}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
