"""Fused qk-prolog kernel parity (runs on the real TPU chip).

The flash kernel can apply the DiT's per-head qk LayerNorm/RMSNorm and
interleaved RoPE on its q/k tiles (``qk_norm``/``rope_*``/``prolog_k``).
Measured at the CogVideoX shape this is perf-neutral-to-negative (the K-side
transform recomputes per (qi, ki) tile and outweighs the saved XLA passes —
see docs/PERF.md), so the model paths keep XLA-side transforms; the kernel
feature is kept correct and tested for future transposed-grid work.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from alg_tpu.ops.attention import _apply_prolog_xla, _xla_attention
from alg_tpu.ops.flash_attention import flash_attention, supports_flash

pytestmark = pytest.mark.skipif(
    not supports_flash(None, None, None, None), reason="no TPU backend"
)


@pytest.mark.parametrize(
    "mode,has_rope,stable,prolog_k",
    [
        ("layer", True, False, True),
        ("rms", True, True, True),
        (None, True, False, True),
        ("layer", False, False, True),
        ("layer", True, False, False),
    ],
)
def test_prolog_matches_xla_reference(rng, mode, has_rope, stable, prolog_k):
    b, h, s, d = 2, 3, 300, 64
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    cos = jnp.asarray(np.cos(rng.rand(s, d) * 3).astype(np.float32))
    sin = jnp.asarray(np.sin(rng.rand(s, d) * 3).astype(np.float32))
    qs_, qb_, ks_, kb_ = [jnp.asarray(rng.rand(d).astype(np.float32)) for _ in range(4)]

    prolog = {"norm": mode, "eps": 1e-6, "q_scale": qs_, "q_bias": qb_,
              "k_scale": ks_, "k_bias": kb_}
    if has_rope:
        prolog["cos"], prolog["sin"] = cos, sin
    qr, kr = _apply_prolog_xla(q, k, prolog)
    ref = _xla_attention(qr, kr, v, d**-0.5)

    kwargs = dict(
        qk_norm=mode, norm_eps=1e-6,
        q_norm_scale=qs_ if mode else None,
        q_norm_bias=qb_ if mode == "layer" else None,
        rope_cos=cos if has_rope else None,
        rope_sin=sin if has_rope else None,
        prolog_k=prolog_k,
    )
    if prolog_k:
        kwargs["k_norm_scale"] = ks_ if mode else None
        kwargs["k_norm_bias"] = kb_ if mode == "layer" else None
        k_in = k
    else:
        # caller pre-transforms K when the kernel only fuses the Q side
        k_in = kr
    out = flash_attention(q, k_in, v, scale=d**-0.5, stable=stable, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
