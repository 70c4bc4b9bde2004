"""Measured single-chip perf ladder for CogVideoX-5b (VERDICT r3 #3).

Runs MULTIPLE modes of the shipped ``CogVideoXPipeline._sample`` workload
(identical geometry/plans to /root/repo/bench.py — 49f@480x720, 50 steps,
CFG 6.0, shipped ALG config) in ONE process per weight family, so the
~11 min host-init + weight-stream cost is paid once per family instead of
once per mode:

    python tools/bench_ladder.py cache     # bf16 weights: --cache 2, --cache 4
    python tools/bench_ladder.py int8      # W8A8 weights: int8, int8 + int8-QK^T attn
    python tools/bench_ladder.py w4        # W4A8 weights: w4

Each mode prints the same JSON line ``bench.py <flags>`` would (one line per
mode, in run order). bf16 k=1 stays bench.py's job — it is the driver-measured
headline and must not move here.
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

FAMILIES = {
    # weight family -> list of (cache_interval, int8_attn, metric suffix, mode label)
    # int8_attn: False | "qk" | "full" (set_attention_int8). "full" (int8 P·V)
    # is deliberately absent from the recommended ladders: measured as a net
    # LOSS at every tried geometry (docs/PERF.md r5 — serial P-quantize on the
    # critical path); run it explicitly via bench.py --int8-attn-full if
    # re-testing on new hardware.
    "cache": [
        (2, False, "_cache2", "bf16 + step-cache k=2"),
        (4, False, "_cache4", "bf16 + step-cache k=4"),
    ],
    "int8": [
        (1, False, "_int8", "int8 W8A8"),
        (1, "qk", "_int8full", "int8 W8A8 + int8 QK^T attn"),
    ],
    "w4": [
        (1, False, "_w4a8", "W4A8 int4-weight/int8-MXU"),
        (1, "qk", "_w4a8_int8attn", "W4A8 + int8 QK^T attn"),
    ],
}


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "cache"
    if family not in FAMILIES:
        sys.exit(f"usage: bench_ladder.py {{{'|'.join(FAMILIES)}}}")

    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.core.device import device_init_params
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        cogvideox_rope,
        init_cogvideox_transformer,
    )
    from alg_tpu.ops.attention import set_attention_int8
    from alg_tpu.pipelines import CogVideoXPipeline
    from alg_tpu.schedulers import CogVideoXDDIMConfig, make_ddim_plan

    tcfg = CogVideoXTransformerConfig()
    vcfg = CogVideoXVAEConfig()
    init_fn = lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    print(f"streaming {family} weights...", file=sys.stderr, flush=True)
    if family == "cache":
        params = device_init_params(init_fn)
    else:
        from alg_tpu.ops.quant import device_init_quantized_params

        params = device_init_quantized_params(init_fn, mode="w4" if family == "w4" else "w8")
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=params,
        vae_cfg=vcfg,
        vae_params=None,
        scheduler="ddim",
        dtype=jnp.bfloat16,
    )
    print(f"weights resident in {time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)

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
        STEPS,
        h,
        w,
        exp_shortcut=True,
    )
    g_table = np.full(STEPS, 6.0, np.float32)
    rope_cos, rope_sin = cogvideox_rope(tcfg, 480, 720, f)

    def sync(x):
        return np.asarray(x[0, 0, 0, :1, :1])

    for cache, int8_attn, suffix, mode in FAMILIES[family]:
        set_attention_int8(int8_attn)

        def sample(stop_after=None):
            return pipe._sample(
                latents0,
                image_latents,
                embeds_pos,
                embeds_neg,
                sched_plan,
                lp_plan,
                g_table,
                rope_cos,
                rope_sin,
                None,
                True,
                None,
                cache_interval=cache,
                stop_after=stop_after,
            )

        t0 = time.perf_counter()
        out = sample(stop_after=10)
        sync(out)
        print(
            f"[{mode}] compile+10-step warmup {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        t0 = time.perf_counter()
        sync(out)
        t_fetch = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = sample()
        sync(out)
        dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)

        steps_per_sec = STEPS / dt
        print(
            json.dumps(
                {
                    "metric": "cogvideox5b_denoise_steps_per_sec_per_chip" + suffix,
                    "value": round(steps_per_sec, 4),
                    "unit": f"steps/s (49f@480x720, 50-step ALG CFG config, {mode}, shipped sampler)",
                    "vs_baseline": round(steps_per_sec / A100_STEPS_PER_SEC, 3),
                }
            ),
            flush=True,
        )
    set_attention_int8(False)


if __name__ == "__main__":
    main()
