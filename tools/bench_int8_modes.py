"""Measure the opt-in int8 serving modes through the SHIPPED sampler.

One weight-streaming pass, then the same `CogVideoXPipeline._sample` path as
bench.py under:
  1. W8A8 block linears (`quantize_pipeline`)            — bench.py --int8
  2. W8A8 + int8-QK^T attention (`set_attention_int8`)   — bench.py --int8 --int8-attn

Prints one JSON line per mode (bf16 headline comes from bench.py). The
attention toggle is read at trace time; each `_sample` call rebuilds its
jitted chunk programs, so flipping it between timed runs is sound (XLA
recompiles hit the persistent cache).
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


def main():
    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        cogvideox_rope,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.attention import set_attention_int8
    from alg_tpu.ops.quant import host_init_quantized_params
    from alg_tpu.pipelines import CogVideoXPipeline
    from alg_tpu.schedulers import CogVideoXDDIMConfig, make_ddim_plan

    tcfg = CogVideoXTransformerConfig()
    print("streaming weights...", flush=True)
    # quantize host-side at init: the bf16 tree (10.1 GB) + int8 copy exceed
    # v5e-1 HBM if quantize_pipeline walks an already-on-device tree
    params = host_init_quantized_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg, transformer_params=params, vae_cfg=CogVideoXVAEConfig(),
        vae_params=None, scheduler="ddim", dtype=jnp.bfloat16,
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
    sync_z = lambda: np.asarray(z.ravel()[:1])
    sync_z()
    t0 = time.perf_counter()
    sync_z()
    t_fetch = time.perf_counter() - t0

    for attn_int8, name in ((False, "int8"), (True, "int8full")):
        set_attention_int8(attn_int8)
        try:
            out = sample()
            sync(out)  # compile + warm
            t0 = time.perf_counter()
            out = sample()
            sync(out)
            dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)
            sps = STEPS / dt
            print(json.dumps({
                "metric": f"cogvideox5b_denoise_steps_per_sec_per_chip_{name}",
                "value": round(sps, 4),
                "unit": "steps/s (49f@480x720, 50-step ALG CFG config, "
                        + ("int8 W8A8 + int8 QK^T attn" if attn_int8 else "int8 W8A8")
                        + ", shipped sampler)",
                "vs_baseline": round(sps / A100_STEPS_PER_SEC, 3),
            }), flush=True)
        finally:
            set_attention_int8(False)


if __name__ == "__main__":
    main()
