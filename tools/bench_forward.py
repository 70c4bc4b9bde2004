"""Decompose the CogVideoX DiT forward cost at full scale (B=2, 42 layers).

Re-implements the block forward with toggles (rope / qk-norm / AdaLN /
attention / transposes) so timing differences localize where the
non-attention non-matmul ~0.5-0.8 s/step goes. Numerics of the ablated
variants are meaningless — timing only. Run ALONE on the chip.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from alg_tpu.models import layers as L
from alg_tpu.models import rope as R
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    cogvideox_rope,
    init_cogvideox_transformer,
)
from alg_tpu.core.device import host_init_params
from alg_tpu.ops.attention import attention


def make_fwd(cfg, variant, rc, rs):
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    dim = cfg.inner_dim

    def block(bp, hidden, encoder, temb):
        text_len = encoder.shape[1]

        def modulate(normp, h, e):
            if variant == "no_adaln":
                hn = L.layer_norm(normp["norm"], h, cfg.norm_eps)
                en = L.layer_norm(normp["norm"], e, cfg.norm_eps)
                one = jnp.ones((h.shape[0], 1, 1), h.dtype)
                return hn, en, one, one
            mod = L.linear(normp["linear"], L.silu(temb))
            shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
            hn = L.layer_norm(normp["norm"], h, cfg.norm_eps) * (1 + scale[:, None]) + shift[:, None]
            en = L.layer_norm(normp["norm"], e, cfg.norm_eps) * (1 + e_scale[:, None]) + e_shift[:, None]
            return hn, en, gate[:, None], e_gate[:, None]

        hn, en, gate, e_gate = modulate(bp["norm1"], hidden, encoder)
        joint = jnp.concatenate([en, hn], axis=1)
        b, s, _ = joint.shape

        def heads(x):
            return x.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

        q = heads(L.linear(bp["attn"]["to_q"], joint))
        k = heads(L.linear(bp["attn"]["to_k"], joint))
        v = heads(L.linear(bp["attn"]["to_v"], joint))
        if variant != "no_qknorm":
            q = L.layer_norm(bp["attn"]["norm_q"], q, 1e-6)
            k = L.layer_norm(bp["attn"]["norm_k"], k, 1e-6)
        if variant != "no_rope":
            q = R.apply_rope_interleaved(q, rc, rs)
            k = R.apply_rope_interleaved(k, rc, rs)
        if variant == "no_attention":
            o = v
        else:
            o = attention(q, k, v, stable=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, dim)
        o = L.linear(bp["attn"]["to_out"], o)
        encoder = encoder + e_gate * o[:, :text_len]
        hidden = hidden + gate * o[:, text_len:]

        hn, en, gate_ff, e_gate_ff = modulate(bp["norm2"], hidden, encoder)
        ff = L.mlp(bp["ff"], jnp.concatenate([en, hn], axis=1), act=L.gelu_tanh)
        encoder = encoder + e_gate_ff * ff[:, :text_len]
        hidden = hidden + gate_ff * ff[:, text_len:]
        return hidden, encoder

    @jax.jit
    def fwd(params, video, text, temb):
        def body(carry, bp):
            h, e = block(bp, carry[0], carry[1], temb)
            return (h, e), ()

        (video_o, _), _ = jax.lax.scan(body, (video, text), params["blocks"])
        return video_o

    return fwd


def main():
    cfg = CogVideoXTransformerConfig()
    params = host_init_params(
        lambda: init_cogvideox_transformer(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
    f, hh, ww = 13, 60, 90
    s_vid = f * (hh // 2) * (ww // 2)
    cos, sin = cogvideox_rope(cfg, 480, 720, f)
    text_len = 226
    rc = jnp.asarray(
        np.concatenate([np.ones((text_len, 64), np.float32), np.asarray(cos)], 0), jnp.bfloat16
    )
    rs = jnp.asarray(
        np.concatenate([np.zeros((text_len, 64), np.float32), np.asarray(sin)], 0), jnp.bfloat16
    )

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(2, s_vid, cfg.inner_dim), jnp.bfloat16)
    text = jnp.asarray(rng.randn(2, text_len, cfg.inner_dim), jnp.bfloat16)
    temb = jnp.asarray(rng.randn(2, cfg.time_embed_dim), jnp.bfloat16)

    def bench(fn, n=3):
        out = fn(params, video, text, temb)
        np.asarray(out[0, 0, :1])
        t0 = time.perf_counter()
        np.asarray(out[0, 0, :1])
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(params, video, text, temb)
        np.asarray(out[0, 0, :1])
        return max((time.perf_counter() - t0 - t_fetch) / n, 1e-9)

    results = {}
    for variant in ("full", "no_rope", "no_qknorm", "no_adaln", "no_attention"):
        fn = make_fwd(cfg, variant, rc, rs)
        dt = bench(fn)
        results[variant] = dt
        print(f"{variant:14s}: {dt:.3f} s", flush=True)

    base = results["full"]
    for variant in ("no_rope", "no_qknorm", "no_adaln", "no_attention"):
        print(f"{variant:14s} saves {base - results[variant]:.3f} s")


if __name__ == "__main__":
    main()
