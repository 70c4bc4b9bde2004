"""Benchmark: CogVideoX-5b-I2V denoise-step throughput on one TPU chip.

Headline workload (BASELINE.md): 49 frames @ 480x720, 50 steps, CFG 6.0, bf16
→ latent [1, 13, 16, 60, 90], text seq 226, video seq 17,550 tokens. Each CFG
step is two sequential batch-1 DiT passes (same FLOPs as batch-2, half the
activation peak — the 10.1 GB bf16 weights leave little headroom on v5e).

Axon-backend measurement notes (see alg_tpu/core/device.py): the tunnel
dispatches fully asynchronously and `block_until_ready` is a no-op, so timing
brackets are forced with tiny device→host fetches and the standalone fetch
latency is measured separately and subtracted. Weights are random-initialized
host-side and streamed to the device (no network egress; identical FLOP graph
to real weights — on-device random init would exceed the memory ceiling).

Prints ONE JSON line vs an A100 reference of 0.185 steps/s (≈270 s for 50
steps — community-reported CogVideoX-5b-I2V bf16 single-A100 timing; the
reference repo publishes no numbers, BASELINE.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_STEPS_PER_SEC = 0.185  # ≈270s / 50 steps, CogVideoX-5b-I2V bf16 on A100


def main():
    from alg_tpu.core.device import host_init_params
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        cogvideox_rope,
        cogvideox_transformer,
        init_cogvideox_transformer,
    )
    from alg_tpu.schedulers import CogVideoXDDIMConfig, ddim_step, make_ddim_plan

    tcfg = CogVideoXTransformerConfig()  # 5b: 42 layers, 48 heads x 64, dim 3072
    params = host_init_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)
    )

    f, h, w = 13, 60, 90
    steps = 50
    cos, sin = cogvideox_rope(tcfg, 480, 720, f)  # host numpy tables
    plan = make_ddim_plan(CogVideoXDDIMConfig(), steps)

    latents = jax.random.normal(jax.random.PRNGKey(1), (1, f, 16, h, w), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, f, 16, h, w), jnp.bfloat16)
    embeds_neg = jax.random.normal(jax.random.PRNGKey(3), (1, 226, 4096), jnp.bfloat16)
    embeds_pos = jax.random.normal(jax.random.PRNGKey(4), (1, 226, 4096), jnp.bfloat16)

    @jax.jit
    def denoise_step(params, latents, cond, embeds_neg, embeds_pos, i):
        t = jnp.asarray(plan.timesteps)[i].astype(jnp.float32)
        x = jnp.concatenate([latents, cond], axis=2)

        def dit(embeds):
            return cogvideox_transformer(
                params, tcfg, x, embeds, jnp.broadcast_to(t, (1,)), cos, sin
            ).astype(jnp.float32)

        uncond = dit(embeds_neg)
        text = dit(embeds_pos)
        noise_pred = uncond + 6.0 * (text - uncond)
        return ddim_step(plan, i, noise_pred, latents.astype(jnp.float32)).astype(latents.dtype)

    def sync(x):
        return np.asarray(x[0, 0, 0, :1, :1])

    out = denoise_step(params, latents, cond, embeds_neg, embeds_pos, 0)
    sync(out)  # compile + first step
    t0 = time.perf_counter()
    sync(out)
    t_fetch = time.perf_counter() - t0

    n = 5
    t0 = time.perf_counter()
    cur = latents
    for i in range(n):
        cur = denoise_step(params, cur, cond, embeds_neg, embeds_pos, i)
    sync(cur)
    dt = max(time.perf_counter() - t0 - t_fetch, 1e-9) / n

    steps_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "cogvideox5b_denoise_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s (49f@480x720, 50-step CFG config, bf16)",
                "vs_baseline": round(steps_per_sec / A100_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
