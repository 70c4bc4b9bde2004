"""HunyuanVideo-I2V 13B shipped workload on ONE v5e chip (int8 W8A8 mode).

The shipped Hunyuan workload (BASELINE.md: 129 frames @ 360p bucket, 50
steps, distilled guidance 6.0, ALG down_up latent 0.625 interval [0, 0.04],
`configs/hunyuan_video_alg.yaml`) cannot run on a single v5e chip in bf16:
the 13B-class DiT alone is ~21 GB. The W8A8 tree (~10.5 GB int8) fits with
the batch-1 single-pass activations (true_cfg 1.0 → no CFG batching), making
this the first single-chip measurement of the full Hunyuan denoise loop.

Geometry: 360p bucket for a 16:9 input = 352x608 (`alg/hunyuan_size.py`,
matches reference `lp_utils.py:163-189` exactly) → latent [1, 16, 33, 44, 76],
video tokens 33*22*38 = 27,588 + 544 text = 28,132 joint sequence at
head_dim 128 (the 163 TFLOP/s kernel regime, docs/PERF.md).

Measures the SHIPPED ``HunyuanVideoPipeline._sample`` (segmented chunked
scan, token_replace assembly, ALG filter matmuts on the conditioning latent,
flow-match Euler steps). Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# Keep every scan program under the axon worker watchdog (~50-98 s ceiling,
# docs/PERF.md SCAN_CHUNK=16 finding): a 13B-class single-guidance pass at
# 28k joint tokens is several seconds, so the default 8-step chunk risks a
# >60 s program. One step per program is safe; chunk-boundary dispatch costs
# ~25 ms/step (docs/PERF.md), negligible here.
os.environ.setdefault("ALG_TPU_SCAN_CHUNK", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

STEPS = 50


def main():
    from alg_tpu.alg.schedule import LPConfig, build_lp_plan
    from alg_tpu.models.hunyuan import (
        HunyuanVAEConfig,
        HunyuanVideoTransformerConfig,
        init_hunyuan_transformer,
    )
    from alg_tpu.ops.quant import device_init_quantized_params
    from alg_tpu.pipelines import HunyuanVideoPipeline
    from alg_tpu.schedulers import FlowMatchEulerConfig, make_flow_match_euler_plan

    tcfg = HunyuanVideoTransformerConfig()  # 13B-class: 20 double + 40 single, 24x128
    attn_mode = None
    if "--int8-attn-full" in sys.argv:
        attn_mode = "full"
    elif "--int8-attn" in sys.argv:
        attn_mode = "qk"
    if attn_mode:
        # D=128 int8 attention (non-fused denominator + kv_len masking,
        # ops/flash_attention_int8.py) on the 28,132-token joint sequence
        from alg_tpu.ops.attention import set_attention_int8

        set_attention_int8(attn_mode)
    print("streaming int8 weights (13B-class tree)...", flush=True)
    # modulation=True: Hunyuan's AdaLN projection stacks are 6.5 GB bf16 —
    # quantizing them (FLOPs negligible, error on par with bf16 rounding) is
    # what makes the 13B tree (~12 GB int8) + activations fit 16 GB HBM
    params = device_init_quantized_params(
        lambda: init_hunyuan_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16),
        modulation=True,
    )
    pipe = HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=params,
        vae_cfg=HunyuanVAEConfig(),
        vae_params=None,  # latent-mode ALG: sampler never touches the VAE
        scheduler_cfg=FlowMatchEulerConfig(shift=7.0, invert_sigmas=False),
        dtype=jnp.bfloat16,
    )

    # 360p bucket for 16:9 (352x608), 129 frames → latent [1,16,33,44,76]
    f_lat, h_lat, w_lat = 33, 44, 76
    text_seq = 544  # 288 interleaved image embeds + 256 llama text
    rng = np.random.RandomState(0)
    latents0 = jnp.asarray(rng.randn(1, 16, f_lat, h_lat, w_lat), jnp.float32)
    image_latents = jnp.asarray(rng.randn(1, 16, 1, h_lat, w_lat), jnp.float32)
    embeds = jnp.asarray(rng.randn(1, text_seq, 4096), jnp.bfloat16)
    pooled = jnp.asarray(rng.randn(1, 768), jnp.bfloat16)
    mask = jnp.ones((1, text_seq), jnp.int32)

    sig = np.linspace(1.0, 0.0, STEPS + 1)[:-1]
    sched_plan = make_flow_match_euler_plan(pipe.scheduler_cfg, sigmas=sig)
    lp_plan = build_lp_plan(
        LPConfig(
            use_low_pass_guidance=True,
            lp_filter_type="down_up",
            lp_filter_in_latent=True,
            lp_resize_factor=0.625,
            lp_strength_schedule_type="interval",
            schedule_interval_start_time=0.0,
            schedule_interval_end_time=0.04,
        ),
        STEPS, h_lat, w_lat, exp_shortcut=False,
    )
    guidance = jnp.full((1,), 6.0 * 1000.0, jnp.float32)

    def sample(stop_after=None):
        return pipe._sample(
            latents0, image_latents, embeds, pooled, mask,
            None, None, None,  # no negative embeds (true_cfg 1.0)
            sched_plan, lp_plan,
            1.0,    # true_cfg_scale
            False,  # do_true_cfg → shipped single-pass branch
            guidance,
            False,  # lp_on_noisy_latent
            None,   # pixel_image (latent mode)
            stop_after=stop_after,
        )

    def sync(x):
        return np.asarray(x[0, 0, 0, :1, :1])

    z = jnp.zeros((1,))
    np.asarray(z.ravel()[:1])
    t0 = time.perf_counter()
    np.asarray(z.ravel()[:1])
    t_fetch = time.perf_counter() - t0

    # warm-up executes 3/50 steps but compiles both segment programs
    # (the 2 ALG-active steps from [0,2), one plain step from [2,50) — at
    # scan_chunk=1 step 3 is the first plain program)
    print("compiling + 3-step warmup...", flush=True)
    out = sample(stop_after=3)
    sync(out)
    t0 = time.perf_counter()
    out = sample()
    sync(out)
    dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)

    suffix = {"qk": "_int8attn", "full": "_int8attn_pv", None: ""}[attn_mode]
    mode = {"qk": " + int8 QK^T attn", "full": " + int8 QK^T+PV attn", None: ""}[attn_mode]
    print(json.dumps({
        "metric": "hunyuan13b_denoise_steps_per_sec_per_chip_int8" + suffix,
        "value": round(STEPS / dt, 4),
        "unit": "steps/s (129f@352x608 360p bucket, 50-step shipped ALG config, "
                f"int8 W8A8{mode}, distilled guidance single-pass, shipped sampler)",
        "sec_per_step": round(dt / STEPS, 3),
        "scan_chunk": int(os.environ["ALG_TPU_SCAN_CHUNK"]),
    }), flush=True)


if __name__ == "__main__":
    main()
