"""Per-component attribution of the shipped CogVideoX step (VERDICT r2 #2).

Measures, at full scale (5b geometry, bf16, 42 layers, B=2 CFG) in ONE
process (one TPU user at a time — axon discipline):

  1. shipped ALG `_sample` (50 steps: 2 three-pass + 48 two-pass)   [bench.py]
  2. no-ALG `_sample` (50 two-pass steps)  → ALG delta = filters + 3-pass amortization
  3. bare forward loop (50 × B=2 forward, no scheduler/filters)     → sampler overhead
  4. standalone DDIM scan with a held noise_pred (50 steps)         → scheduler cost
  5. flash attention kernel at B2·H48·S17776·D64                    → kernel share

Prints a JSON attribution table. Timing brackets are fetch-forced (axon
`block_until_ready` is a no-op); standalone fetch latency subtracted.
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

from alg_tpu.alg.schedule import LPConfig, build_lp_plan
from alg_tpu.core.device import host_init_params
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    cogvideox_rope,
    cogvideox_transformer,
    init_cogvideox_transformer,
)
from alg_tpu.pipelines import CogVideoXPipeline
from alg_tpu.schedulers import CogVideoXDDIMConfig, make_ddim_plan
from alg_tpu.schedulers.ddim_cogvideox import ddim_step

STEPS = 50


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
    tcfg = CogVideoXTransformerConfig()
    vcfg = __import__("alg_tpu.models.cogvideox", fromlist=["CogVideoXVAEConfig"]).CogVideoXVAEConfig()
    print("streaming weights...", flush=True)
    params = host_init_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg, dtype=jnp.bfloat16)
    )
    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg, transformer_params=params, vae_cfg=vcfg,
        vae_params=None, scheduler="ddim", dtype=jnp.bfloat16,
    )

    f, h, w = 13, 60, 90
    rng = np.random.RandomState(0)
    latents0 = jnp.asarray(rng.randn(1, f, 16, h, w), jnp.float32)
    image_latents = jnp.asarray(rng.randn(1, f, 16, h, w), jnp.float32)
    embeds_neg = jnp.asarray(rng.randn(1, 226, 4096), jnp.bfloat16)
    embeds_pos = jnp.asarray(rng.randn(1, 226, 4096), jnp.bfloat16)
    sched_plan = make_ddim_plan(CogVideoXDDIMConfig(), STEPS)
    g_table = np.full(STEPS, 6.0, np.float32)
    rope_cos, rope_sin = cogvideox_rope(tcfg, 480, 720, f)

    # fetch latency baseline
    z = jnp.zeros((1,))
    fetch(z)
    t0 = time.perf_counter()
    fetch(z)
    t_fetch = time.perf_counter() - t0
    print(f"t_fetch {t_fetch*1e3:.1f} ms", flush=True)

    def lp_plan_for(alg):
        cfg = LPConfig(
            use_low_pass_guidance=alg, lp_filter_type="down_up",
            lp_filter_in_latent=True, lp_resize_factor=0.25,
            lp_strength_schedule_type="interval",
            schedule_interval_start_time=0.0, schedule_interval_end_time=0.04,
        )
        return build_lp_plan(cfg, STEPS, h, w, exp_shortcut=True)

    def sample(plan):
        return pipe._sample(
            latents0, image_latents, embeds_pos, embeds_neg, sched_plan, plan,
            g_table, rope_cos, rope_sin, None, True, None,
        )

    results = {}

    # 4. standalone DDIM scan (no model): 50 steps on a held noise_pred
    @jax.jit
    def ddim_only(lat):
        def body(c, i):
            return ddim_step(sched_plan, i, c * 0.001, c).astype(jnp.float32), ()
        return jax.lax.scan(body, lat, jnp.arange(STEPS))[0]

    results["ddim_scan_50"] = timed(lambda: ddim_only(latents0), t_fetch)
    print("ddim_scan_50", results["ddim_scan_50"], flush=True)

    # 5. attention kernel share
    from alg_tpu.ops.attention import attention
    S = 226 + (f * (h // 2) * (w // 2))
    q = jnp.asarray(rng.randn(2, 48, S, 64), jnp.bfloat16)
    att = jax.jit(lambda q: attention(q, q, q, stable=False))  # = the DiT path
    results["attn_call"] = timed(lambda: att(q), t_fetch, reps=3)
    print("attn_call", results["attn_call"], flush=True)

    # 3. bare forward loop (params as ARGS — closing over them captures 11 GB
    # of constants at lowering and stalls the remote compile)
    emb2 = jnp.concatenate([embeds_neg, embeds_pos], axis=0)
    lat2 = jnp.concatenate([latents0] * 2, axis=0).astype(jnp.bfloat16)
    cond2 = jnp.concatenate([image_latents] * 2, axis=0).astype(jnp.bfloat16)
    x_in = jnp.concatenate([lat2, cond2], axis=2)
    ts = jnp.full((2,), 500.0, jnp.float32)

    @jax.jit
    def fwd(p, x):
        return cogvideox_transformer(p, tcfg, x, emb2, ts, rope_cos, rope_sin)

    t_one = timed(lambda: fwd(params, x_in), t_fetch)
    results["forward_b2"] = t_one  # production default (qk_prep pallas since r3)
    print("forward_b2", t_one, flush=True)

    # in-context A/B of the fused qk_prep kernel: r3 measured 6.42 s (XLA
    # composition) vs 6.10 s (fused kernel) — the kernel is now the default,
    # so the A/B leg here forces the XLA composition for comparison.
    import os

    os.environ["ALG_TPU_QK_PREP"] = "xla"
    try:
        fwd_xla = jax.jit(
            lambda p, x: cogvideox_transformer(p, tcfg, x, emb2, ts, rope_cos, rope_sin)
        )
        t_xla = timed(lambda: fwd_xla(params, x_in), t_fetch)
        results["forward_b2_qkprep_xla"] = t_xla
        print("forward_b2_qkprep_xla", t_xla, flush=True)
    except Exception as e:  # noqa: BLE001
        print("forward_b2_qkprep_xla FAILED:", type(e).__name__, e, flush=True)
    finally:
        os.environ.pop("ALG_TPU_QK_PREP", None)

    # 2. no-ALG sample
    t = timed(lambda: sample(lp_plan_for(False)), t_fetch)
    results["sample_noalg_50"] = t
    print("sample_noalg_50", t, flush=True)

    # 1. shipped ALG sample
    t = timed(lambda: sample(lp_plan_for(True)), t_fetch)
    results["sample_alg_50"] = t
    print("sample_alg_50", t, flush=True)

    table = {
        "steps_per_sec_shipped": STEPS / results["sample_alg_50"],
        "s_per_step_shipped": results["sample_alg_50"] / STEPS,
        "s_per_step_noalg": results["sample_noalg_50"] / STEPS,
        "alg_delta_total_s": results["sample_alg_50"] - results["sample_noalg_50"],
        "s_per_step_forward_b2": results["forward_b2"],
        "sampler_overhead_per_step_s": results["sample_noalg_50"] / STEPS - results["forward_b2"],
        "ddim_per_step_s": results["ddim_scan_50"] / STEPS,
        "attn_per_call_s": results["attn_call"],
        "attn_per_step_s_42l": results["attn_call"] * 42,
        "t_fetch_s": t_fetch,
    }
    print(json.dumps({**results, **table}, indent=1), flush=True)


if __name__ == "__main__":
    main()
