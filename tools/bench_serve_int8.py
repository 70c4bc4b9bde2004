"""Single-chip batched-serving throughput (opt-in int8 W8A8 mode).

BASELINE #5 asks for batched multi-prompt serving. On one v5e chip the bf16
CogVideoX-5b weights (10.1 GB) + batch-2 CFG activations exceed HBM; the int8
W8A8 tree (~5.3 GB) leaves room for batch 2. This measures the aggregate
denoise throughput of TWO videos batched through the SHIPPED
`CogVideoXPipeline._sample` (the same path `serve_batch` drives: batch-leading
latents, CFG doubling inside) — the single-chip serving story that complements
the multi-chip `shard_pipeline` path validated on the virtual mesh.

Prints one JSON line: aggregate steps/s (2 videos x 50 steps / wall), with
per-video steps/s alongside for comparison with the B=1 bench lines.
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

A100_STEPS_PER_SEC = 0.185
STEPS = 50
BATCH = 2


def main():
    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        cogvideox_rope,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.quant import host_init_quantized_params
    from alg_tpu.pipelines import CogVideoXPipeline
    from alg_tpu.schedulers import CogVideoXDDIMConfig, make_ddim_plan

    tcfg = CogVideoXTransformerConfig()
    print("streaming int8 weights...", flush=True)
    params = host_init_quantized_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg, transformer_params=params, vae_cfg=CogVideoXVAEConfig(),
        vae_params=None, scheduler="ddim", dtype=jnp.bfloat16,
    )

    f, h, w = 13, 60, 90
    rng = np.random.RandomState(0)
    latents0 = jnp.asarray(rng.randn(BATCH, f, 16, h, w), jnp.float32)
    image_latents = jnp.asarray(rng.randn(BATCH, f, 16, h, w), jnp.float32)
    embeds_neg = jnp.asarray(rng.randn(BATCH, 226, 4096), jnp.bfloat16)
    embeds_pos = jnp.asarray(rng.randn(BATCH, 226, 4096), jnp.bfloat16)
    sched_plan = make_ddim_plan(CogVideoXDDIMConfig(), STEPS)
    lp_plan = build_lp_plan(
        LPConfig(
            use_low_pass_guidance=True, lp_filter_type="down_up",
            lp_filter_in_latent=True, lp_resize_factor=0.25,
            lp_strength_schedule_type="interval",
            schedule_interval_start_time=0.0, schedule_interval_end_time=0.04,
        ),
        STEPS, h, w, exp_shortcut=True,
    )
    g_table = np.full(STEPS, 6.0, np.float32)
    rope_cos, rope_sin = cogvideox_rope(tcfg, 480, 720, f)

    def sample():
        return pipe._sample(
            latents0, image_latents, embeds_pos, embeds_neg, sched_plan, lp_plan,
            g_table, rope_cos, rope_sin, None, True, None,
        )

    def sync(x):
        return np.asarray(x[0, 0, 0, :1, :1])

    z = jnp.zeros((1,))
    np.asarray(z.ravel()[:1])
    t0 = time.perf_counter()
    np.asarray(z.ravel()[:1])
    t_fetch = time.perf_counter() - t0

    out = sample()
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    out = sample()
    sync(out)
    dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)

    agg = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "cogvideox5b_serving_agg_steps_per_sec_per_chip_int8_b2",
        "value": round(agg, 4),
        "unit": "aggregate steps/s (2 videos batched, 49f@480x720, 50-step ALG CFG, "
                "int8 W8A8, shipped sampler)",
        "per_video_steps_per_sec": round(STEPS / dt, 4),
        "vs_baseline": round(agg / A100_STEPS_PER_SEC, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
