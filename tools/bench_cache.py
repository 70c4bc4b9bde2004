"""Step-cache throughput: shipped CogVideoX `_sample` at cache_interval ∈
{1, 2, 4} in ONE process (weights stream once — ~20 min of the ~40 min
bench.py wall-clock is host→device streaming).

Measures the same 50-step ALG CFG workload as bench.py; prints one JSON line
per mode. cache_interval > 1 is the opt-in approximate mode (DiT forward
every k-th step; ALG-active + final steps always computed)."""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from alg_tpu.core.device import enable_compilation_cache

enable_compilation_cache(default_dir="/root/.cache/jax_tpu_cache")

A100 = 0.185
STEPS = 50


def main():
    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.core.device import host_init_params
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        cogvideox_rope,
        init_cogvideox_transformer,
    )
    from alg_tpu.pipelines import CogVideoXPipeline
    from alg_tpu.schedulers import CogVideoXDDIMConfig, make_ddim_plan

    tcfg = CogVideoXTransformerConfig()
    vcfg = CogVideoXVAEConfig()
    params = host_init_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=params,
        vae_cfg=vcfg,
        vae_params=None,
        scheduler="ddim",
        dtype=jnp.bfloat16,
    )

    f, h, w = 13, 60, 90
    rng = np.random.RandomState(0)
    latents0 = jnp.asarray(rng.randn(1, f, 16, h, w), jnp.float32)
    image_latents = jnp.asarray(rng.randn(1, f, 16, h, w), jnp.float32)
    embeds_neg = jnp.asarray(rng.randn(1, 226, 4096), jnp.bfloat16)
    embeds_pos = jnp.asarray(rng.randn(1, 226, 4096), jnp.bfloat16)

    sched_plan = make_ddim_plan(CogVideoXDDIMConfig(), STEPS)
    lp_plan = build_lp_plan(
        LPConfig(
            use_low_pass_guidance=True,
            lp_filter_type="down_up",
            lp_filter_in_latent=True,
            lp_resize_factor=0.25,
            lp_strength_schedule_type="interval",
            schedule_interval_start_time=0.0,
            schedule_interval_end_time=0.04,
        ),
        STEPS, h, w, exp_shortcut=True,
    )
    g_table = np.full(STEPS, 6.0, np.float32)
    rope_cos, rope_sin = cogvideox_rope(tcfg, 480, 720, f)

    def sample(k):
        return pipe._sample(
            latents0, image_latents, embeds_pos, embeds_neg, sched_plan,
            lp_plan, g_table, rope_cos, rope_sin, None, True, None,
            cache_interval=k,
        )

    def sync(x):
        return np.asarray(x[0, 0, 0, :1, :1])

    for k in (1, 2, 4):
        out = sample(k)
        sync(out)  # compile + warm run
        t0 = time.perf_counter()
        sync(out)
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = sample(k)
        sync(out)
        dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)
        sps = STEPS / dt
        print(
            json.dumps(
                {
                    "metric": f"cogvideox5b_steps_per_sec_cache{k}",
                    "value": round(sps, 4),
                    "unit": "effective steps/s (50-step ALG CFG, bf16, shipped sampler)",
                    "vs_baseline": round(sps / A100, 3),
                    "sec_per_50step_denoise": round(dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
