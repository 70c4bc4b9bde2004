"""Kernel-level micro-benches (fast: no weight streaming). Run ALONE on TPU.

1. fused qk_prep (norm+RoPE one-pass Pallas) vs the XLA composition at the
   CogVideoX shape [2, 48, 17776, 64] bf16;
2. flash attention block-size A/B: default (1024/2048, pads 17776→18432 and
   slices back) vs aligned blocks that DIVIDE the sequence exactly
   (1616/2222·8=...) — measures the XLA pad/slice overhead directly.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from alg_tpu.models import layers as L
from alg_tpu.models import rope as R
from alg_tpu.ops.flash_attention import flash_attention
from alg_tpu.ops.qk_prep import qk_norm_rope

B, H, S, D = 2, 48, 17776, 64


def fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(fn, t_fetch, reps=5):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return max((time.perf_counter() - t0 - t_fetch) / reps, 1e-9)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    normp = {
        "scale": jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32),
        "bias": jnp.asarray(0.1 * rng.randn(D), jnp.float32),
    }
    ang = rng.rand(S, D // 2).astype(np.float32) * 6.28
    cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=1))
    sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=1))

    z = jnp.zeros((1,))
    fetch(z)
    t0 = time.perf_counter()
    fetch(z)
    t_fetch = time.perf_counter() - t0
    print(f"t_fetch {t_fetch*1e3:.1f} ms", flush=True)

    xla = jax.jit(
        lambda x: R.apply_rope_interleaved(L.layer_norm(normp, x, 1e-6), cos, sin)
    )
    t = timed(lambda: xla(x), t_fetch)
    print(f"qk_prep XLA composition: {t*1e3:.2f} ms/tensor", flush=True)

    fused = jax.jit(lambda x: qk_norm_rope(x, normp, cos, sin, 1e-6, force="pallas"))
    # correctness at full scale first
    a, b = np.asarray(xla(x), np.float32), np.asarray(fused(x), np.float32)
    err = np.abs(a - b).max()
    print(f"qk_prep fused max|Δ| vs XLA: {err:.3e}", flush=True)
    t = timed(lambda: fused(x), t_fetch)
    print(f"qk_prep fused Pallas:    {t*1e3:.2f} ms/tensor", flush=True)

    # ---- flash attention block A/B
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    ref = None
    for bq, bk, label in [
        (1024, 2048, "default 1024/2048 (pads to 18432)"),
        (1616, 2048, "bq=1616 aligned Q (pads K to 18432)"),
        (1616, 1616, "1616/1616 fully aligned (no pad/slice)"),
        (808, 1616, "808/1616 fully aligned small Q"),
    ]:
        fn = jax.jit(
            lambda q, bq=bq, bk=bk: flash_attention(
                q, q, q, scale=D**-0.5, block_q=bq, block_k=bk, stable=False
            )
        )
        try:
            out = fn(q)
            if ref is None:
                ref = np.asarray(out[0, 0, :64], np.float32)
            else:
                err = np.abs(np.asarray(out[0, 0, :64], np.float32) - ref).max()
                assert err < 1e-2, err
            t = timed(lambda: fn(q), t_fetch, reps=3)
            tf = 4 * B * H * S * S * D / t / 1e12
            print(f"attn {label}: {t*1e3:.1f} ms  {tf:.1f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"attn {label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
