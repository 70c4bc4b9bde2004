"""End-to-end sec/video components for Wan / Hunyuan (BASELINE.md row 2).

Completes the per-family e2e component tables (`tools/bench_e2e.py` covers
CogVideoX): the device-side non-denoise components of one video through the
SHIPPED pipeline paths, at each family's BASELINE.md workload.

  * wan (81f@480x832):  conditioning build — VAE encode of the 81-frame
    zero-padded first-frame video + mask block (`WanPipeline._build_condition`,
    the real prepare_latents path) ; final decode [1,16,21,60,104] → 81
    frames (`decode_latents`, tiled).
  * hunyuan (129f@352x608 360p bucket): single-frame argmax VAE encode
    (image latent) ; final decode [1,16,33,44,76] → 129 frames (tiled).

Text/vision encoders are omitted on the same grounds as bench_e2e.py's T5
note: UMT5-XXL (Wan) and Llava-8B+CLIP (Hunyuan) are tens of ms to ~0.1 s of
compute but another 9.5-17 GB of weight streaming through the axon tunnel —
<0.1 % of e2e device time each (FLOP arithmetic in docs/PERF.md). Host-side
H.264/MJPEG encode is CPU work outside the chip budget.

Usage: python tools/bench_e2e_family.py --family wan|hunyuan
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(fn, t_fetch, reps=1):
    out = fn()
    fetch(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return max((time.perf_counter() - t0 - t_fetch) / reps, 1e-9)


def main():
    family = sys.argv[sys.argv.index("--family") + 1] if "--family" in sys.argv else "wan"
    from alg_tpu.core.device import host_init_params

    rng = np.random.RandomState(0)
    results = {"family": family}

    if family == "wan":
        from alg_tpu.models.wan import WanVAEConfig, init_wan_vae
        from alg_tpu.pipelines import WanPipeline

        vcfg = WanVAEConfig()
        print("streaming Wan VAE weights...", flush=True)
        vae_params = host_init_params(
            lambda: init_wan_vae(jax.random.PRNGKey(0), vcfg, dtype=jnp.float32)
        )
        pipe = WanPipeline(
            transformer_cfg=None, transformer_params=None,
            vae_cfg=vcfg, vae_params=vae_params,
            scheduler_cfg=None, dtype=jnp.bfloat16,
        )
        z = jnp.zeros((1,))
        fetch(z)
        t0 = time.perf_counter()
        fetch(z)
        t_fetch = time.perf_counter() - t0

        image = rng.randn(1, 3, 480, 832).astype(np.float32)
        results["condition_build_s"] = timed(
            lambda: pipe._build_condition(image, 1, 81, 480, 832, None), t_fetch
        )
        print("condition_build_s (VAE encode of 81f zero-padded video + mask)",
              results["condition_build_s"], flush=True)

        latents = jnp.asarray(rng.randn(1, 16, 21, 60, 104), jnp.float32)
        results["vae_decode_s"] = timed(lambda: pipe.decode_latents(latents), t_fetch)
        print("vae_decode_s (81f @ 480x832, tiled)", results["vae_decode_s"], flush=True)

    elif family == "hunyuan":
        from alg_tpu.models.hunyuan import (
            HunyuanVAEConfig,
            hunyuan_vae_encode,
            init_hunyuan_vae,
        )
        from alg_tpu.pipelines import HunyuanVideoPipeline

        vcfg = HunyuanVAEConfig()
        print("streaming Hunyuan VAE weights...", flush=True)
        # bf16 storage = the shipped config's dtype (reference runs the
        # Hunyuan VAE fp16, run.py:71-86); fp32 tile decode at 129 frames
        # measures 17.0 GB > HBM (r5), bf16 halves the activations
        vae_params = host_init_params(
            lambda: init_hunyuan_vae(jax.random.PRNGKey(0), vcfg, dtype=jnp.bfloat16)
        )
        pipe = HunyuanVideoPipeline(
            transformer_cfg=None, transformer_params=None,
            vae_cfg=vcfg, vae_params=vae_params,
            scheduler_cfg=None, dtype=jnp.bfloat16,
        )
        z = jnp.zeros((1,))
        fetch(z)
        t0 = time.perf_counter()
        fetch(z)
        t_fetch = time.perf_counter() - t0

        # single-frame argmax encode (the image latent; shipped __call__ path)
        x = jnp.asarray(rng.randn(1, 1, 352, 608, 3), pipe._vae_dtype())
        enc = jax.jit(lambda p, xx: hunyuan_vae_encode(p, vcfg, xx)[0])
        results["vae_encode_image_s"] = timed(lambda: enc(vae_params, x), t_fetch)
        print("vae_encode_image_s (1 frame argmax)", results["vae_encode_image_s"], flush=True)

        latents = jnp.asarray(rng.randn(1, 16, 33, 44, 76), jnp.float32)
        results["vae_decode_s"] = timed(lambda: pipe.decode_latents(latents), t_fetch)
        print("vae_decode_s (129f @ 352x608, tiled)", results["vae_decode_s"], flush=True)
    else:
        sys.exit(f"unknown --family {family}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
