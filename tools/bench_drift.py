"""Production-scale numerics drift of the opt-in approximate serving modes.

Runs the SHIPPED CogVideoX sampler at the full headline workload (49f@480x720,
50 steps, CFG 6.0, shipped ALG config — the bench.py geometry) once in exact
bf16 and once per approximate mode, all from the SAME random weights, and
reports each mode's final-latent drift vs the bf16 run:

  * max/mean |Δ| relative to the bf16 latents' RMS,
  * latent PSNR (20·log10(peak/rmse), peak = bf16 |max|).

Weight identity across modes: ``host_init_params`` and
``host_init_quantized_params`` generate leaves with the same
``np.random.default_rng(seed)`` walk over the same tree (ops/quant.py), so
the w8/w4 trees are QUANTIZATIONS OF the bf16 tree, not a different draw —
exactly the per-checkpoint validation a user would run, at random-init
(no-egress environment; real checkpoints take the same code path).

Modes (each one JSON line): bf16 reference, --cache 2/4 (same resident bf16
tree), int8 / int8+int8-attn / int8+int8-attn-full (one int8 stream, the
attention mode toggles), w4. Streams: bf16 10.1 GB + int8 ~5 GB + w4 ~2.6 GB
through the tunnel — budget ~60-90 min total; run on an idle host.

Usage: python tools/bench_drift.py [--modes bf16,cache2,cache4,int8,int8attn,int8full,w4]
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

STEPS = 50
ALL_MODES = ["bf16", "cache2", "cache4", "int8", "int8attn", "int8full", "w4"]


def _modes():
    if "--modes" in sys.argv:
        return sys.argv[sys.argv.index("--modes") + 1].split(",")
    return ALL_MODES


def main():
    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.core.device import host_init_params
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

    modes = _modes()
    tcfg = CogVideoXTransformerConfig()
    vcfg = CogVideoXVAEConfig()
    init_fn = lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)

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

    def run(params, cache=1):
        pipe = CogVideoXPipeline(
            transformer_cfg=tcfg, transformer_params=params, vae_cfg=vcfg,
            vae_params=None, scheduler="ddim", dtype=jnp.bfloat16,
        )
        out = pipe._sample(
            latents0, image_latents, embeds_pos, embeds_neg, sched_plan,
            lp_plan, g_table, rope_cos, rope_sin, None, True, None,
            cache_interval=cache,
        )
        return np.asarray(out, np.float32)

    ref = None
    ref_rms = ref_peak = None

    def report(mode, lat, secs):
        nonlocal ref, ref_rms, ref_peak
        if ref is None:
            ref = lat
            ref_rms = float(np.sqrt((ref**2).mean()))
            ref_peak = float(np.abs(ref).max())
            print(json.dumps({
                "mode": mode, "workload": "cogvideox5b 49f@480x720 50-step shipped ALG sampler",
                "latent_rms": round(ref_rms, 5), "latent_peak": round(ref_peak, 4),
                "run_sec": round(secs, 1), "note": "reference run",
            }), flush=True)
            return
        d = np.abs(lat - ref)
        rmse = float(np.sqrt(((lat - ref) ** 2).mean()))
        print(json.dumps({
            "mode": mode,
            "max_rel": round(float(d.max()) / ref_rms, 5),
            "mean_rel": round(float(d.mean()) / ref_rms, 6),
            "psnr_latent_db": round(20 * np.log10(ref_peak / max(rmse, 1e-12)), 2),
            "run_sec": round(secs, 1),
        }), flush=True)

    # the bf16 reference is required by every drift row — always run it
    print("streaming bf16 tree (10.1 GB)...", file=sys.stderr, flush=True)
    params = host_init_params(init_fn)
    for mode, cache in (("bf16", 1), ("cache2", 2), ("cache4", 4)):
        if mode != "bf16" and mode not in modes:
            continue
        t0 = time.perf_counter()
        lat = run(params, cache=cache)
        report(mode, lat, time.perf_counter() - t0)
    del params
    gc.collect()

    if any(m in modes for m in ("int8", "int8attn", "int8full")):
        print("quantizing + streaming w8 tree (~5 GB)...", file=sys.stderr, flush=True)
        params = host_init_quantized_params(init_fn, mode="w8")
        for mode, attn in (("int8", None), ("int8attn", "qk"), ("int8full", "full")):
            if mode not in modes:
                continue
            set_attention_int8(attn)
            try:
                t0 = time.perf_counter()
                lat = run(params)
                report(mode, lat, time.perf_counter() - t0)
            finally:
                set_attention_int8(False)
        del params
        gc.collect()

    if "w4" in modes:
        print("quantizing + streaming w4 tree (~2.6 GB)...", file=sys.stderr, flush=True)
        params = host_init_quantized_params(init_fn, mode="w4")
        t0 = time.perf_counter()
        lat = run(params)
        report("w4", lat, time.perf_counter() - t0)


if __name__ == "__main__":
    main()
