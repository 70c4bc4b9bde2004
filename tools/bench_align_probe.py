"""Probe: lane-aligned sequence padding for CogVideoX attention.

S = 17550 video + 226 text = 17776 = 2^4·11·101 has NO divisor that is a
multiple of 128, so divisor-aligned flash blocks (1616) leave every logits
tile lane-misaligned (1616 → 13 MXU lane-groups covering 1664; ~3 % waste on
both the QK^T output and the P·V contraction). Padding the TEXT tokens
226 → 370 makes S = 17920 = 128·140 with divisor blocks 1792 = 128·14 —
every tile exactly lane-aligned — at the cost of 0.81 % extra tokens.
Padded KV is masked via ``kv_len`` (softmax-exact for the real tokens);
padded Q rows are discarded with the text stream at unpatchify, so video
outputs are mathematically identical.

This measures whether the aligned+masked call at S=17920 beats the shipped
misaligned call at S=17776 by more than the ~0.8 % token overhead.
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


def bench(fn, out_slicer, n=8):
    out = fn()
    out_slicer(out)
    t0 = time.perf_counter()
    out_slicer(out)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    out_slicer(out)
    return max((time.perf_counter() - t0 - t_fetch) / n, 1e-9)


def main():
    b, h, d = 2, 48, 64
    rng = np.random.RandomState(0)
    flops_real = 4 * b * h * 17776 * 17776 * d

    # explicit block pairs are capped so the bq*bk fp32 logits tile stays
    # within scoped vmem (~10.4 MB = the measured-good 1616x1616; 1792x1792
    # and 896x3584 OOM the 16 MB scoped limit at compile -> no data)
    cases = [
        ("shipped S=17776 (misaligned divisor blocks)", 17776, None, None, None),
        ("padded  S=17920 kv_len=17776 (auto blocks)", 17920, 17776, None, None),
        ("padded  S=17920 kv_len=17776 bq=1280 bk=1792", 17920, 17776, 1280, 1792),
        ("padded  S=17920 kv_len=17776 bq=896 bk=2240", 17920, 17776, 896, 2240),
        ("padded  S=17920 kv_len=17776 bq=640 bk=3584", 17920, 17776, 640, 3584),
    ]
    for name, s, kvl, bq, bk in cases:
        q = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
        kv = None if kvl is None else jnp.full((b,), kvl, jnp.int32)
        kwargs = {}
        if bq is not None:
            kwargs = dict(block_q=bq, block_k=bk)
        try:
            dt = bench(
                lambda: flash_attention(q, k, v, scale=d**-0.5, kv_len=kv, **kwargs),
                lambda o: np.asarray(o[0, 0, 0, :1]),
            )
            print(f"{name}: {dt*1e3:.1f} ms, {flops_real/dt/1e12:.1f} effective TFLOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
