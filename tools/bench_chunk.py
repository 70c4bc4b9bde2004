"""Attribute the chunk-dispatch share of the sampler overhead (PERF r3).

r3 attribution measured the no-ALG 50-step sampler at 6.73 s/step vs a bare
B=2 forward at 6.42 s — ~0.3 s/step of sampler overhead whose leading
suspect is per-chunk program dispatch through the axon tunnel (SCAN_CHUNK=8
-> 7 programs per 50-step run). This probe streams weights ONCE and times
the shipped no-ALG `_sample` at several chunk sizes by rebinding
`alg_tpu.core.device.SCAN_CHUNK` between runs (the samplers re-import the
value on every call).

Watchdog discipline: one 48-step program (~5-6 device-minutes) is known to
be killed by the worker watchdog; 8-step (~1 min) is safe. 16 (~1.7 min) is
probed first; 24 only attempted if 16 survives.
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
from alg_tpu.core import device as device_mod
from alg_tpu.core.device import host_init_params
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    CogVideoXVAEConfig,
    cogvideox_rope,
    init_cogvideox_transformer,
)
from alg_tpu.pipelines import CogVideoXPipeline
from alg_tpu.schedulers import CogVideoXDDIMConfig, make_ddim_plan

STEPS = 50


def fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    tcfg = CogVideoXTransformerConfig()
    print("streaming weights...", flush=True)
    params = host_init_params(
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
    g_table = np.full(STEPS, 6.0, np.float32)
    rope_cos, rope_sin = cogvideox_rope(tcfg, 480, 720, f)
    lp_plan = build_lp_plan(
        LPConfig(use_low_pass_guidance=False), STEPS, h, w, exp_shortcut=True
    )

    def sample():
        return pipe._sample(
            latents0, image_latents, embeds_pos, embeds_neg, sched_plan, lp_plan,
            g_table, rope_cos, rope_sin, None, True, None,
        )

    z = jnp.zeros((1,))
    fetch(z)
    t0 = time.perf_counter()
    fetch(z)
    t_fetch = time.perf_counter() - t0
    print(f"t_fetch {t_fetch*1e3:.1f} ms", flush=True)

    results = {}
    for chunk in (8, 16, 24):
        device_mod.SCAN_CHUNK = chunk
        try:
            out = sample()
            fetch(out)  # compile + warm full run
            t0 = time.perf_counter()
            out = sample()
            fetch(out)
            dt = time.perf_counter() - t0 - t_fetch
            results[f"noalg_chunk{chunk}_s_per_step"] = dt / STEPS
            print(f"chunk {chunk}: {dt:.1f} s total, {dt/STEPS:.3f} s/step", flush=True)
        except Exception as e:  # noqa: BLE001 — worker crash at big chunks
            print(f"chunk {chunk} FAILED: {type(e).__name__}: {e}", flush=True)
            break
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
