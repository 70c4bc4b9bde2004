"""Wan2.1-I2V-14B shipped workload on ONE v5e chip (W4A8 mode).

The shipped Wan workload (BASELINE.md: 81 frames @ 480x832, 50 steps, CFG
5.0, UniPC flow_shift 5.0, ALG down_up latent 0.4 interval [0, 0.20] → 10 of
50 steps are 3-pass) cannot run on a single v5e chip in bf16 (30.5 GB DiT)
or even W8A8 (~15.5 GB + batch-2/3 activations > 16 GB HBM). The W4A8 tree
(~9 GB: int4 group-128 weights requantized to int8 at use, int8 MXU compute
— ops/quant.py) leaves room for the CFG batch-2 (and segmented batch-3)
activations, making this the first single-chip measurement of the full Wan
denoise loop.

Geometry: latent [1, 16, 21, 60, 104] + 20-ch mask+latent condition, video
sequence 21*30*52 = 32,760 tokens at head_dim 128 (the 163 TFLOP/s kernel
regime), UMT5 text 512 x 4096, CLIP image embeds 257 x 1280.

Measures the SHIPPED ``WanPipeline._sample``. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# One denoise pass at this scale measures 9.23 s on the chip (probe,
# docs/ROUND4.md). The axon tunnel's worker watchdog kills any single XLA
# program somewhere between ~50 s and ~98 s (docs/PERF.md SCAN_CHUNK=16
# finding), so the default 8-step chunk (8 steps x 2 passes x 9.23 s =
# 148 s/program) crashes the worker. One step per program (<= 27.7 s for
# the 3-pass ALG steps) stays safely under; chunk-boundary dispatch costs
# ~25 ms/step (docs/PERF.md), ~0.1 % here.
os.environ.setdefault("ALG_TPU_SCAN_CHUNK", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

STEPS = 50


def main():
    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.models.wan import WanTransformerConfig, WanVAEConfig, init_wan_transformer
    from alg_tpu.ops.quant import device_init_quantized_params
    from alg_tpu.pipelines import WanPipeline
    from alg_tpu.schedulers import UniPCConfig, make_unipc_plan

    tcfg = WanTransformerConfig()  # 14B: 40 layers, 40x128, ffn 13824
    attn_mode = None
    if "--int8-attn-full" in sys.argv:
        attn_mode = "full"
    elif "--int8-attn" in sys.argv:
        attn_mode = "qk"
    if attn_mode:
        # D=128 int8 attention (non-fused denominator path,
        # ops/flash_attention_int8.py) on the 32,760-token self-attention
        from alg_tpu.ops.attention import set_attention_int8

        set_attention_int8(attn_mode)
    print("quantizing + streaming W4A8 weights (14B tree -> ~9 GB)...", flush=True)
    params = device_init_quantized_params(
        lambda: init_wan_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16),
        mode="w4",
    )
    pipe = WanPipeline(
        transformer_cfg=tcfg,
        transformer_params=params,
        vae_cfg=WanVAEConfig(),
        vae_params=None,  # latent-mode ALG: the sampler never touches the VAE
        scheduler_cfg=UniPCConfig(flow_shift=5.0),
        dtype=jnp.bfloat16,
        # sequential guidance passes: batch-3 ALG activations at S=32,760
        # need ~11.5 GB of HLO temps on top of the ~9 GB W4A8 tree (measured
        # OOM: 21.07 G > 15.75 G HBM); micro-batch 1 cuts temps ~3× and costs
        # ~0 throughput at this sequence length (MXU saturated per pass)
        guidance_microbatch=1,
    )

    f_lat, h_lat, w_lat = 21, 60, 104  # 81f @ 480x832
    rng = np.random.RandomState(0)
    latents0 = jnp.asarray(rng.randn(1, 16, f_lat, h_lat, w_lat), jnp.float32)
    condition = jnp.asarray(rng.randn(1, 20, f_lat, h_lat, w_lat), jnp.float32)
    embeds_pos = jnp.asarray(rng.randn(1, 512, 4096), jnp.bfloat16)
    embeds_neg = jnp.asarray(rng.randn(1, 512, 4096), jnp.bfloat16)
    image_embeds = jnp.asarray(rng.randn(1, 257, 1280), jnp.bfloat16)

    sched_plan = make_unipc_plan(pipe.scheduler_cfg, STEPS)
    lp_plan = build_lp_plan(
        LPConfig(
            use_low_pass_guidance=True,
            lp_filter_type="down_up",
            lp_filter_in_latent=True,
            lp_resize_factor=0.4,
            lp_strength_schedule_type="interval",
            schedule_interval_start_time=0.0,
            schedule_interval_end_time=0.20,  # 10 of 50 steps 3-pass
        ),
        STEPS, h_lat, w_lat, exp_shortcut=False,
    )

    def sample(stop_after=None):
        return pipe._sample(
            latents0, condition, embeds_pos, embeds_neg, image_embeds,
            sched_plan, lp_plan,
            5.0,   # guidance_scale
            True,  # do_cfg
            81,    # num_frames (pixel mode only)
            None,  # pixel_image
            None,  # pixel_vae_noise
            stop_after=stop_after,
        )

    def sync(x):
        return np.asarray(x[0, 0, 0, :1, :1])

    z = jnp.zeros((1,))
    np.asarray(z.ravel()[:1])
    t0 = time.perf_counter()
    np.asarray(z.ravel()[:1])
    t_fetch = time.perf_counter() - t0

    # warm-up executes 11/50 steps but compiles both segment programs
    # (one 3-pass step from [0,10), one 2-pass step from [10,50) —
    # bench.py protocol, VERDICT r3 #2b; at scan_chunk=1 step 11 is the
    # first 2-pass program)
    print("compiling + 11-step warmup...", flush=True)
    out = sample(stop_after=11)
    sync(out)
    t0 = time.perf_counter()
    out = sample()
    sync(out)
    dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)

    suffix = {"qk": "_int8attn", "full": "_int8attn_pv", None: ""}[attn_mode]
    mode = {"qk": " + int8 QK^T attn", "full": " + int8 QK^T+PV attn", None: ""}[attn_mode]
    print(json.dumps({
        "metric": "wan14b_denoise_steps_per_sec_per_chip_w4a8" + suffix,
        "value": round(STEPS / dt, 4),
        "unit": "steps/s (81f@480x832, 50-step shipped ALG CFG config, W4A8 "
                f"int4-weight/int8-MXU{mode}, shipped sampler)",
        "sec_per_step": round(dt / STEPS, 3),
        "scan_chunk": int(os.environ["ALG_TPU_SCAN_CHUNK"]),
    }), flush=True)


if __name__ == "__main__":
    main()
