"""Attention dispatch: Pallas flash attention on TPU, XLA reference elsewhere.

This is the framework's replacement for the reference's xformers/SDPA fused
attention (``requirements.txt:11``, SURVEY §2.7). One entry point serves every
attention in the stack:

  * video DiT self/joint attention — dense, no mask (CogVideoX, Wan)
  * joint attention with padded-text masking — ``kv_len`` (HunyuanVideo)
  * causal attention — ``causal=True`` (Llama/Llava, CLIP text)
  * relative-position-bias attention — ``bias`` (T5/UMT5)

Inputs are ``[B, H, S, D]``. The Pallas kernel is an online-softmax flash
attention with fp32 accumulators; the XLA path is the literal softmax
reference used for parity tests and CPU execution.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from alg_tpu.ops.flash_attention import flash_attention, supports_flash


def _pallas_diff(q, k, v, scale, causal, kv_len, bias, stable, prolog=None):
    """Route a Pallas attention call through the ``custom_vjp`` wrapper so
    ``jax.grad`` works on TPU (ops/flash_attention_bwd.py). Inference is
    unchanged — the wrapper's primal is the same fused kernel call."""
    from alg_tpu.ops.flash_attention_bwd import FAStatic, flash_attention_diff

    p = prolog or {}
    static = FAStatic(
        scale=float(scale),
        causal=bool(causal),
        stable=bool(stable),
        norm=p.get("norm"),
        eps=float(p.get("eps", 1e-6)),
        has_rope=p.get("cos") is not None,
    )
    arrs = {
        key: p[key]
        for key in ("q_scale", "q_bias", "k_scale", "k_bias", "cos", "sin")
        if p.get(key) is not None
    } or None
    return flash_attention_diff(static, q, k, v, kv_len, bias, arrs)


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    causal: bool = False,
    kv_len: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32, precision=precision
        )
        * scale
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        sq, sk = q.shape[-2], k.shape[-2]
        row = jnp.arange(sq)[:, None] + (sk - sq)
        col = jnp.arange(sk)[None, :]
        logits = jnp.where(col <= row, logits, -jnp.inf)
    if kv_len is not None:
        col = jnp.arange(k.shape[-2])
        mask = col[None, :] < kv_len[:, None]  # [B, Sk]
        logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v, precision=precision)


_LOG2E = 1.4426950408889634


def _xla_attention_residuals(q, k, v, scale, kv_len=None):
    """XLA attention that also returns the base-2 row log-sum-exp — the
    reference/CPU counterpart of ``flash_attention(return_residuals=True)``
    for ring-attention partial-output merging. Non-causal, unbiased (the DiT
    self/joint attention surface sequence parallelism serves)."""
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32, precision=precision)
        * (scale * _LOG2E)
    )
    if kv_len is not None:
        col = jnp.arange(k.shape[-2])
        mask = col[None, :] < kv_len[:, None]
        s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)  # fully masked rows
    p = jnp.exp2(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", (p / jnp.where(l == 0.0, 1.0, l)).astype(v.dtype), v, precision=precision)
    lse = m_safe[..., 0] + jnp.log2(l[..., 0])  # -inf where l == 0
    return o, lse


_IMPL_OVERRIDE: Optional[str] = None
_INT8_QK: Optional[str] = None  # None | "qk" | "full"


def set_attention_int8(enabled) -> None:
    """Route qualifying DiT self-attention through the int8 flash kernel
    (``ops/flash_attention_int8.py``) — ``True``/``"qk"`` runs the logits
    matmul on the 2×-rate int8 MXU (per-block scales, softmax-exact K
    mean-centering); ``"full"`` additionally quantizes the P·V pass
    (per-row P scales, per-channel V scales) so BOTH attention matmuls run
    at the int8 rate.

    Opt-in: int8 logits change numerics (~1e-2 relative drift on outputs,
    "full" adds ~the P rounding error; both bounded by
    tests/test_attention_int8.py) and must be validated per checkpoint, like
    the W8A8 linear mode it composes with. Only dense, unbiased, non-causal
    self-attention that also requested the bounded-logit fast path
    (``stable=False`` — the DiT block calls) qualifies on a single-device
    TPU path; any head_dim works (D=64 fused row-sum / D=128 separate
    denominator) and ``kv_len`` masking is supported (Hunyuan's joint
    sequence). Everything else (text/vision encoders, which pass
    ``stable=True``, and bias/causal/mesh-sharded calls) keeps the bf16
    kernel."""
    global _INT8_QK
    if enabled in (False, None):
        _INT8_QK = None
    elif enabled in (True, "qk"):
        _INT8_QK = "qk"
    elif enabled == "full":
        _INT8_QK = "full"
    else:
        raise ValueError(f"set_attention_int8: {enabled!r} (want bool, 'qk' or 'full')")


def get_attention_int8() -> Optional[str]:
    return _INT8_QK


def get_attention_impl() -> Optional[str]:
    return _IMPL_OVERRIDE


def set_attention_impl(impl: Optional[str]) -> None:
    """Force the attention backend globally: "pallas" | "xla" | None (auto).

    Needed when lowering for devices other than the default backend (e.g. a
    virtual CPU mesh for sharding dry-runs while a TPU is attached) — trace
    time cannot see the execution platform, so "auto" keys off the default
    backend only.
    """
    global _IMPL_OVERRIDE
    _IMPL_OVERRIDE = impl


# -- multi-chip: shard_map'd attention ---------------------------------------
#
# GSPMD cannot partition a Pallas custom call, so multi-chip runs would
# otherwise silently fall back to unfused XLA attention exactly where the
# perf target needs chips (VERDICT r1 #4). Attention is embarrassingly
# parallel over (batch, head): under Megatron-style TP the qkv projections
# are column-parallel, so q/k/v arrive head-sharded and the fused kernel can
# run purely locally inside a shard_map — no collectives.
#
# Long-context / sequence parallelism (SURVEY §5): an optional ``seq_axis``
# additionally shards the QUERY token dim. Each shard all-gathers K/V over
# ICI and runs the fused kernel on its ``[B/dp, H/tp, S/sp, D]`` query slab —
# the O(S²) attention compute and the [Sq, Sk] logits memory both split by
# sp, which is what bounds 720p×129-frame HunyuanVideo activations on one
# chip. The moral equivalent of Ulysses for self-attention (all-gathered KV
# instead of all-to-all) — the right trade at DiT sequence lengths, where
# K/V (~MBs) are tiny next to the logits (~GBs).

_MESH_CTX = None  # (mesh, batch_axis, head_axis, seq_axis, seq_mode)


def set_attention_mesh(
    mesh,
    batch_axis: str = "dp",
    head_axis: str = "tp",
    seq_axis: Optional[str] = None,
    seq_mode: str = "gather",
) -> None:
    """Route subsequent attention calls through ``shard_map`` over ``mesh``.

    Batch shards over ``batch_axis``, heads over ``head_axis``, and (when
    ``seq_axis`` names a mesh axis) query tokens over ``seq_axis``; each
    shard runs the fused Pallas kernel (TPU meshes) or the XLA reference
    (CPU meshes) on its local slab. Pass ``None`` to clear.

    ``seq_mode`` picks the self-attention KV strategy under sequence
    parallelism: ``"gather"`` all-gathers K/V per shard (one collective, KV
    replicated in memory); ``"ring"`` keeps K/V sequence-sharded and rotates
    chunks around the ``seq_axis`` ring with ``ppermute``, merging partial
    outputs by log-sum-exp — peak KV memory drops from O(S) to O(S/sp) per
    chip and the permutes overlap chunk compute (ring attention);
    ``"ulysses"`` trades the sequence shard for a head shard with one
    ``all_to_all`` on q/k/v (and one back on the output): each sp rank then
    runs ONE full-sequence flash call over ``heads/(tp·sp)`` heads — a single
    kernel launch instead of sp (ring) and ~4·S·D·h/sp words moved instead of
    the gather's 2·S·D·h replicated KV (DeepSpeed-Ulysses). Needs
    ``(heads/tp) % sp == 0``; calls that don't qualify degrade to "gather".
    """
    global _MESH_CTX
    _MESH_CTX = None if mesh is None else (mesh, batch_axis, head_axis, seq_axis, seq_mode)


def get_attention_mesh():
    return _MESH_CTX


@contextlib.contextmanager
def attention_mesh_scope(
    mesh,
    batch_axis: str = "dp",
    head_axis: str = "tp",
    seq_axis: Optional[str] = None,
    seq_mode: str = "gather",
):
    """Scoped :func:`set_attention_mesh` — active only while tracing the
    sampler's DiT, so text/image encoders (whose batches don't live on the
    mesh) keep the ordinary single-device dispatch."""
    global _MESH_CTX
    prev = _MESH_CTX
    _MESH_CTX = None if mesh is None else (mesh, batch_axis, head_axis, seq_axis, seq_mode)
    try:
        yield
    finally:
        _MESH_CTX = prev


def _ring_merge(o_a, lse_a, o_b, lse_b):
    """Merge two normalized partial attention outputs with base-2 lse weights.
    Handles fully-masked chunks (lse = -inf) without NaNs."""
    m = jnp.maximum(lse_a, lse_b)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w_a = jnp.exp2(lse_a - m_safe)
    w_b = jnp.exp2(lse_b - m_safe)
    den = w_a + w_b
    den_safe = jnp.where(den == 0.0, 1.0, den)
    o = (o_a * w_a[..., None] + o_b * w_b[..., None]) / den_safe[..., None]
    return o, m_safe + jnp.log2(den)  # log2(0) = -inf keeps masked rows masked


def _ring_attention_local(q, k, v, kv_len, *, scale, stable, axis, sp, use_pallas):
    """Per-shard ring attention body (runs inside shard_map).

    K/V stay sequence-sharded: each of the ``sp`` rounds computes flash
    attention of the local queries against the currently-held KV chunk
    (returning the base-2 row lse) and rotates the chunk one step around the
    ``axis`` ring with ``ppermute``. Partial outputs merge by lse weights —
    exact online-softmax associativity, like the chunk loop inside the flash
    kernel itself, lifted one level up to ICI. The next chunk's permute is
    issued BEFORE the current chunk's compute so XLA's latency-hiding
    scheduler overlaps communication with the matmuls.

    vs ``"gather"``: peak KV memory per chip drops from O(S) to O(S/sp) and
    no all-gather buffer materializes; the price is sp kernel launches and
    the (overlapped) permutes. ``kv_len`` masking is translated into each
    chunk's local coordinates."""
    chunk = k.shape[2]
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def inner(k_c, v_c, kvl):
        if use_pallas:
            return flash_attention(
                q, k_c, v_c, scale=scale, kv_len=kvl, stable=stable, return_residuals=True
            )
        return _xla_attention_residuals(q, k_c, v_c, scale, kv_len=kvl)

    o = lse = None
    k_cur, v_cur = k, v
    for r in range(sp):
        if r < sp - 1:
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        src = (idx - r) % sp  # original owner of the chunk currently held
        kvl = (
            None
            if kv_len is None
            else jnp.clip(kv_len - src * chunk, 0, chunk).astype(jnp.int32)
        )
        o_r, lse_r = inner(k_cur, v_cur, kvl)
        o_r = o_r.astype(jnp.float32)
        if o is None:
            o, lse = o_r, lse_r
        else:
            o, lse = _ring_merge(o, lse, o_r, lse_r)
        if r < sp - 1:
            k_cur, v_cur = k_nxt, v_nxt
    return o.astype(q.dtype)


def _shard_map_attention(q, k, v, scale, causal, kv_len, stable):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh, ba, ha, sa, seq_mode = _MESH_CTX
    dp = mesh.shape[ba] if ba in mesh.shape else 1
    tp = mesh.shape[ha] if ha in mesh.shape else 1
    sp = mesh.shape[sa] if (sa is not None and sa in mesh.shape) else 1
    b, h, sq = q.shape[0], q.shape[1], q.shape[2]
    if b % dp != 0 or h % tp != 0:
        raise ValueError(
            f"attention mesh needs batch%dp==0 and heads%tp==0; got batch {b} "
            f"over dp={dp}, heads {h} over tp={tp}"
        )
    cross = q.shape[2] != k.shape[2]
    if sp > 1:
        if causal:
            raise NotImplementedError(
                "sequence-parallel attention is non-causal only (DiT self/joint attention)"
            )
        if sq % sp != 0:
            # graceful degradation: this call runs sequence-replicated (dp/tp
            # still apply). The DiT joint sequence at production scale divides
            # sp; odd tiny shapes (e.g. Hunyuan video+text = 19) land here.
            import warnings

            warnings.warn(
                f"attention seq {sq} not divisible by sp={sp}; "
                "running this call sequence-replicated"
            )
            sp = 1
    platform = mesh.devices.flat[0].platform
    use_pallas = platform in ("tpu", "axon") and _IMPL_OVERRIDE != "xla"

    seq_dim = sa if sp > 1 else None
    # cross-attention (Sq != Sk, e.g. Wan text/image cross streams): shard the
    # QUERY tokens over sp and replicate K/V — exact, no collective needed.
    # Self-attention: K/V arrive sequence-sharded and are all-gathered locally.
    kv_seq_dim = seq_dim if not cross else None
    q_spec = P(ba, ha, seq_dim, None)
    kv_spec = P(ba, ha, kv_seq_dim, None)
    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q, k, v]
    if kv_len is not None:
        in_specs.append(P(ba))
        args.append(kv_len)

    gather_kv = sp > 1 and not cross
    ring_kv = gather_kv and seq_mode == "ring"
    ulysses_kv = gather_kv and seq_mode == "ulysses"
    if ulysses_kv and (h // tp) % sp != 0:
        # Ulysses re-shards heads over sp — each rank must get a whole number
        # of the tp-local heads. Degrade to the always-valid gather strategy.
        import warnings

        warnings.warn(
            f"ulysses sp needs (heads/tp) % sp == 0; got {h // tp} local heads "
            f"over sp={sp} — falling back to gathered-KV sequence parallelism"
        )
        ulysses_kv = False

    def local(q, k, v, kv_len=None):
        if ring_kv:
            # KV stays sequence-sharded; chunks rotate around the sp ring
            return _ring_attention_local(
                q, k, v, kv_len, scale=scale, stable=stable, axis=sa, sp=sp,
                use_pallas=use_pallas,
            )
        if ulysses_kv:
            # Ulysses: one all_to_all trades the sequence shard for a head
            # shard — afterwards this rank holds ALL Sq/Sk tokens of
            # h/(tp·sp) heads, so a single full-sequence flash call (and the
            # unmodified kv_len mask) is exact. Inverted on the output.
            q = jax.lax.all_to_all(q, sa, split_axis=1, concat_axis=2, tiled=True)
            k = jax.lax.all_to_all(k, sa, split_axis=1, concat_axis=2, tiled=True)
            v = jax.lax.all_to_all(v, sa, split_axis=1, concat_axis=2, tiled=True)
        elif gather_kv:
            # keys/values live sequence-sharded between layers; gather the
            # full KV per shard over ICI (tiny next to the [Sq, Sk] logits)
            k = jax.lax.all_gather(k, sa, axis=2, tiled=True)
            v = jax.lax.all_gather(v, sa, axis=2, tiled=True)
        if use_pallas:
            o = _pallas_diff(q, k, v, scale, causal, kv_len, None, stable)
        else:
            o = _xla_attention(q, k, v, scale, causal=causal, kv_len=kv_len)
        if ulysses_kv:
            o = jax.lax.all_to_all(o, sa, split_axis=2, concat_axis=1, tiled=True)
        return o

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=q_spec,
        # the body is purely local after the explicit all_gathers, but JAX's
        # varying-manual-axes checker cannot see through a pallas_call (its
        # out ShapeDtypeStruct carries no vma) and rejects the TPU path
        check_vma=False,
    )
    return fn(*args)


def _apply_prolog_xla(q, k, prolog):
    """Reference (XLA) application of the qk prolog — numerically identical
    to the in-kernel fused path: per-head norm (fp32 stats, cast back), then
    interleaved RoPE in the activation dtype."""

    def norm(x, scale, bias):
        mode = prolog.get("norm")
        if mode is None:
            return x
        xf = x.astype(jnp.float32)
        if mode == "layer":
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + prolog["eps"])
            y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        elif mode == "rms":
            y = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + prolog["eps"])
            y = y * scale.astype(jnp.float32)
        else:
            raise ValueError(f"unknown prolog norm {mode!r}")
        return y.astype(x.dtype)

    def rope(x):
        cos = prolog.get("cos")
        if cos is None:
            return x
        c = jnp.asarray(cos, x.dtype)
        s = jnp.asarray(prolog["sin"], x.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (x.shape[-1],), 0)
        even = (lane % 2) == 0
        rot = jnp.where(even, -jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))
        return x * c + rot * s

    q = rope(norm(q, prolog.get("q_scale"), prolog.get("q_bias")))
    k = rope(norm(k, prolog.get("k_scale"), prolog.get("k_bias")))
    return q, k


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    kv_len: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    stable: bool = True,
    prolog: Optional[dict] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over ``[B, H, S, D]`` tensors.

    ``kv_len``: optional ``[B]`` int32 — keys at positions >= kv_len[b] are
    masked out. ``bias``: optional additive logit bias broadcastable to
    ``[B, H, Sq, Sk]``. ``impl``: "auto" | "pallas" | "xla".
    ``stable=False`` selects the bounded-logit fast path (no running max,
    ~2x faster at head_dim 64) — safe for trained DiT attention where
    |logit| ≪ 80; keep True for text encoders and anything adversarial.

    ``prolog``: optional fused qk prolog — dict with keys
    ``norm`` ("layer"|"rms"|None), ``eps``, ``q_scale``/``q_bias``/
    ``k_scale``/``k_bias`` ([d] per-head norm affines), ``cos``/``sin``
    ([S, d] interleaved RoPE tables). On the single-device Pallas path the
    transforms run inside the flash kernel (VPU work overlapped under the
    MXU — saves the XLA materialization passes); on XLA/mesh paths they are
    applied up front with identical numerics.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _MESH_CTX is not None and impl == "auto" and bias is None:
        if prolog is not None:
            q, k = _apply_prolog_xla(q, k, prolog)
        return _shard_map_attention(q, k, v, scale, causal, kv_len, stable)
    if impl == "auto":
        if _IMPL_OVERRIDE is not None:
            impl = _IMPL_OVERRIDE
        else:
            impl = "pallas" if supports_flash(q, k, v, bias) else "xla"
    if (
        _INT8_QK
        and impl == "pallas"
        and not stable  # DiT blocks request the bounded-logit fast path;
        # text/vision encoders keep stable=True and thus the bf16 kernel —
        # int8 QK^T must never silently touch conditioning embeddings
        and not causal
        and bias is None
        and prolog is None
        and q.shape[2] == k.shape[2]
    ):
        from alg_tpu.ops.flash_attention_int8 import flash_attention_int8

        return flash_attention_int8(
            q, k, v, scale=scale, pv_int8=_INT8_QK == "full", kv_len=kv_len
        )
    if impl == "pallas":
        # every Pallas call goes through the custom_vjp wrapper: the primal is
        # the identical fused kernel (zero inference cost), and jax.grad gets
        # the Pallas dq/dkv backward (flash_attention_bwd.py) instead of the
        # NotImplementedError a bare pallas_call raises
        return _pallas_diff(q, k, v, scale, causal, kv_len, bias, stable, prolog)
    if prolog is not None:
        q, k = _apply_prolog_xla(q, k, prolog)
    return _xla_attention(q, k, v, scale, causal=causal, kv_len=kv_len, bias=bias)
