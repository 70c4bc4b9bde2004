"""Flash-attention backward: Pallas dq/dkv kernels vs XLA autodiff.

Two tiers (VERDICT r3 Missing #1 / next-round #1c):
  * interpret-mode kernel tests — run the backward kernels on CPU via the
    Pallas interpreter and compare against ``jax.vjp`` through the XLA
    reference attention (exact math, fp32);
  * chip tests (skipped without a TPU backend) — ``jax.grad`` through the
    full ``attention()`` dispatch (custom_vjp wrapper, fused-prolog VJP,
    bias fallback) vs the XLA composition's autodiff.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.ops.attention import _xla_attention, attention
from alg_tpu.ops.flash_attention import LOG2E, supports_flash
from alg_tpu.ops.flash_attention_bwd import flash_attention_bwd

pytestmark = pytest.mark.fast


def _qkv(rng, b, h, sq, sk, d):
    return (
        rng.randn(b, h, sq, d).astype(np.float32),
        rng.randn(b, h, sk, d).astype(np.float32),
        rng.randn(b, h, sk, d).astype(np.float32),
    )


def _o_lse(q, k, v, scale, causal=False, kv_len=None):
    """Reference forward that also yields the base-2 lse of the scaled logits
    (what the fwd kernel saves for the backward)."""
    s = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        * scale
        * LOG2E
    )
    sq_, sk_ = q.shape[2], k.shape[2]
    if causal:
        row = jnp.arange(sq_)[:, None] + (sk_ - sq_)
        col = jnp.arange(sk_)[None, :]
        s = jnp.where(col <= row, s, -jnp.inf)
    if kv_len is not None:
        col = jnp.arange(sk_)
        s = jnp.where((col[None, :] < kv_len[:, None])[:, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp2(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p / jnp.where(l == 0.0, 1.0, l), v,
        precision=jax.lax.Precision.HIGHEST,
    )
    return o, m_safe[..., 0] + jnp.log2(l[..., 0])


def _ref_grads(q, k, v, do, scale, causal=False, kv_len=None, bias=None):
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention(
            q_, k_, v_, scale, causal=causal, kv_len=kv_len, bias=bias
        ),
        q, k, v,
    )
    return vjp(do)


def _check_case(rng, b, h, sq, sk, d, causal=False, kv_len=None, atol=2e-4):
    q, k, v = _qkv(rng, b, h, sq, sk, d)
    do = rng.randn(b, h, sq, d).astype(np.float32)
    q, k, v, do = map(jnp.asarray, (q, k, v, do))
    kvl = None if kv_len is None else jnp.asarray(kv_len, jnp.int32)
    scale = d**-0.5
    o, lse = _o_lse(q, k, v, scale, causal=causal, kv_len=kvl)
    got = flash_attention_bwd(
        q, k, v, o, lse, do, scale=scale, causal=causal, kv_len=kvl,
        block_q=128, block_k=128, interpret=True,
    )
    ref = _ref_grads(q, k, v, do, scale, causal=causal, kv_len=kvl)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=atol, rtol=1e-4, err_msg=name
        )


def test_bwd_dense_padded(rng):
    # 200 pads to 256: padded q rows and k rows must contribute exactly zero
    _check_case(rng, 1, 2, 200, 200, 32)


def test_bwd_causal(rng):
    _check_case(rng, 1, 2, 150, 150, 32, causal=True)


def test_bwd_causal_offset(rng):
    # sk > sq (decode-style window): diagonal offset in original coordinates
    _check_case(rng, 1, 2, 64, 160, 32, causal=True)


def test_bwd_kv_len(rng):
    _check_case(rng, 2, 2, 130, 130, 32, kv_len=np.array([37, 130]))


def test_bwd_cross(rng):
    _check_case(rng, 1, 2, 96, 224, 32)


def test_bwd_fully_masked_row(rng):
    # kv_len = 0 → forward lse = -inf; backward must produce zeros, not NaNs
    q, k, v = _qkv(rng, 2, 1, 128, 128, 32)
    do = rng.randn(2, 1, 128, 32).astype(np.float32)
    kvl = jnp.asarray([0, 128], jnp.int32)
    q, k, v, do = map(jnp.asarray, (q, k, v, do))
    o, lse = _o_lse(q, k, v, 32**-0.5, kv_len=kvl)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, lse, do, scale=32**-0.5, kv_len=kvl,
        block_q=128, block_k=128, interpret=True,
    )
    assert np.isfinite(np.asarray(dq)).all()
    np.testing.assert_array_equal(np.asarray(dq[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(dk[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(dv[0]), 0.0)


# ---------------------------------------------------------------------------
# chip tier: jax.grad through the full attention() dispatch
# ---------------------------------------------------------------------------

def chip(fn):
    """Chip-tier test: part of the bounded on-TPU gate (`pytest -m chip`),
    skipped without a TPU backend."""
    return pytest.mark.chip(
        pytest.mark.skipif(
            not supports_flash(None, None, None, None), reason="no TPU backend"
        )(fn)
    )


def _grad_vs_xla(q, k, v, atol, loss_w=None, **kw):
    """max|Δ| between grads through attention(impl=auto→pallas) and the XLA
    reference, for a weighted-sum scalar loss."""
    w = loss_w if loss_w is not None else jnp.ones(q.shape, jnp.float32)

    def loss(fn):
        def inner(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_).astype(jnp.float32) * w)

        return jax.jit(jax.grad(inner, argnums=(0, 1, 2)))

    g_pallas = loss(lambda q_, k_, v_: attention(q_, k_, v_, **kw))(q, k, v)
    g_xla = loss(lambda q_, k_, v_: attention(q_, k_, v_, impl="xla", **kw))(q, k, v)
    for gp, gx, name in zip(g_pallas, g_xla, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gx, np.float32),
            atol=atol, rtol=1e-3, err_msg=name,
        )


@chip
@pytest.mark.parametrize("stable", [True, False])
def test_grad_dense_chip(stable, rng):
    q, k, v = map(jnp.asarray, _qkv(rng, 1, 2, 300, 300, 64))
    _grad_vs_xla(q, k, v, 2e-4, stable=stable)


@chip
def test_grad_causal_chip(rng):
    q, k, v = map(jnp.asarray, _qkv(rng, 1, 2, 200, 200, 64))
    _grad_vs_xla(q, k, v, 2e-4, causal=True)


@chip
def test_grad_kv_len_chip(rng):
    q, k, v = map(jnp.asarray, _qkv(rng, 2, 2, 200, 200, 64))
    _grad_vs_xla(q, k, v, 2e-4, kv_len=jnp.asarray([77, 200], jnp.int32))


@chip
def test_grad_bias_fallback_chip(rng):
    # additive bias (T5): backward takes the XLA-recompute VJP inside the
    # same custom_vjp boundary
    q, k, v = map(jnp.asarray, _qkv(rng, 1, 2, 160, 160, 64))
    bias = jnp.asarray(rng.randn(1, 2, 160, 160).astype(np.float32))
    _grad_vs_xla(q, k, v, 2e-4, bias=bias)


@chip
def test_grad_prolog_chip(rng):
    # fused qk prolog (rms norm + RoPE): grads flow to q/k AND the norm scales
    d = 64
    q, k, v = map(jnp.asarray, _qkv(rng, 1, 2, 256, 256, d))
    qs = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ks = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ang = rng.rand(256, d // 2).astype(np.float32) * 3.0
    cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=1))
    sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=1))

    def make(impl):
        def inner(q_, k_, v_, qs_, ks_):
            pro = {"norm": "rms", "eps": 1e-6, "q_scale": qs_, "k_scale": ks_,
                   "cos": cos, "sin": sin}
            return jnp.sum(attention(q_, k_, v_, impl=impl, prolog=pro).astype(jnp.float32))

        return jax.jit(jax.grad(inner, argnums=(0, 1, 2, 3, 4)))

    gp = make("auto")(q, k, v, qs, ks)
    gx = make("xla")(q, k, v, qs, ks)
    for a, b, name in zip(gp, gx, ("dq", "dk", "dv", "dqs", "dks")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-4, rtol=1e-3, err_msg=name,
        )


@chip
def test_train_step_smoke_chip():
    """One real training step ON the TPU backend — the exact failure VERDICT
    r3 reproduced (`NotImplementedError` from `_pallas_call_jvp_rule`)."""
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        init_cogvideox_transformer,
    )
    from alg_tpu.training import TrainConfig, make_cogvideox_vpred_loss, make_train_step

    cfg = CogVideoXTransformerConfig(
        num_attention_heads=4, attention_head_dim=16, in_channels=8,
        out_channels=4, time_embed_dim=16, text_embed_dim=12, num_layers=2,
        sample_height=4, sample_width=4, max_text_seq_length=4,
    )
    params = init_cogvideox_transformer(jax.random.PRNGKey(0), cfg)
    step, opt = make_train_step(make_cogvideox_vpred_loss(cfg), TrainConfig(learning_rate=1e-3))
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 2, 4, 8, 8).astype(np.float32)),
        "image_latents": jnp.asarray(rng.randn(2, 2, 4, 8, 8).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(rng.randn(2, 3, 12).astype(np.float32)),
    }
    params, _, m = jax.jit(step)(params, opt.init(params), batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
