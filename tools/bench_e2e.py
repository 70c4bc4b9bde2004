"""End-to-end sec/video components beyond the denoise loop (BASELINE.md row 2).

The denoise loop dominates a video (50 steps x ~6.5 s measured by bench.py);
this tool measures the remaining device-side components of one CogVideoX
49f@480x720 video through the SHIPPED pipeline paths:

  * conditioning-image VAE encode  (prepare_latents; one call per video)
  * final VAE decode               (decode_latents, auto-tiled at 60x90)

Text encode (T5-XXL, 2x226 tokens, ~4.3 TFLOP => tens of ms) is omitted: its
weights are another ~9.5 GB through the axon tunnel for a component that is
<0.1 % of e2e time. Host-side H.264/MJPEG encode is CPU work outside the
chip budget (run.py parity covers it functionally).

Axon timing discipline as in bench.py: fetch-bracketed, standalone fetch
latency subtracted. ONE TPU process at a time.
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
    from alg_tpu.core.device import host_init_params
    from alg_tpu.core.rng import NoiseSource
    from alg_tpu.models.cogvideox import CogVideoXVAEConfig, init_cogvideox_vae
    from alg_tpu.pipelines import CogVideoXPipeline

    vcfg = CogVideoXVAEConfig()
    print("streaming VAE weights...", flush=True)
    vae_params = host_init_params(
        lambda: init_cogvideox_vae(jax.random.PRNGKey(0), vcfg, dtype=jnp.bfloat16)
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=None,
        transformer_params=None,  # denoise is bench.py's job
        vae_cfg=vcfg,
        vae_params=vae_params,
        scheduler="ddim",
        dtype=jnp.bfloat16,
    )

    z = jnp.zeros((1,))
    fetch(z)
    t0 = time.perf_counter()
    fetch(z)
    t_fetch = time.perf_counter() - t0
    print(f"t_fetch {t_fetch * 1e3:.1f} ms", flush=True)

    rng = np.random.RandomState(0)
    results = {}

    # conditioning encode: preprocessed image [B, 1, C, H, W] -> posterior draw
    image = rng.randn(1, 1, 3, 480, 720).astype(np.float32)
    results["vae_encode_cond_s"] = timed(
        lambda: pipe.vae_encode_sample(image, NoiseSource(42)), t_fetch
    )
    print("vae_encode_cond_s", results["vae_encode_cond_s"], flush=True)

    # final decode: [1, 13, 16, 60, 90] latents -> 49 frames @ 480x720
    latents = jnp.asarray(rng.randn(1, 13, 16, 60, 90), jnp.float32)
    results["vae_decode_s"] = timed(lambda: pipe.decode_latents(latents), t_fetch)
    print("vae_decode_s", results["vae_decode_s"], flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
