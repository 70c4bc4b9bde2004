"""Opt-in W8A8 int8 quantization for DiT serving (beyond-parity perf mode).

v5e's MXU runs int8×int8→int32 at ~360 TOP/s vs ~196 TFLOP/s bf16 (measured;
`docs/PERF.md`). Weight-only int8 would not speed up these compute-bound
matmuls, so this is W8A8: per-output-channel static weight scales +
per-row dynamic activation scales (absmax), int32 accumulation, fused
dequant epilogue — ~27% faster per DiT linear end-to-end, and the
transformer weights halve in HBM (and in host→device streaming time).

This mode changes numerics (int8 is not bf16) — it is NEVER used by default
and not by `bench.py`; quality must be validated per checkpoint. Apply with

    pipe = quantize_pipeline(pipe)

which quantizes the big block linears (attention projections, MLPs) of the
transformer and leaves embeddings, modulation projections, and output heads
in the original dtype (their FLOPs are negligible and AdaLN precision
matters).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8: kernel [..., in, out] →
    (int8 kernel, f32 scale [..., 1, out]).

    The host-side math runs through the native C++ single-pass kernel
    (:mod:`alg_tpu.native`, bitwise-identical, ~50× numpy) when available;
    the numpy form below is the reference fallback."""
    from alg_tpu import native

    w = np.asarray(kernel)  # device fetch; keeps bf16 for the fused native path
    nat = native.quant_w8(w) if (w.ndim >= 2 and w.dtype.kind != "i") else None
    if nat is not None:
        wq, scale = nat
    else:
        w = np.asarray(w, np.float32)
        absmax = np.max(np.abs(w), axis=-2, keepdims=True)  # over the IN axis
        scale = np.maximum(absmax, 1e-12) / 127.0
        wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    out = jnp.asarray(wq)
    # stacked block kernels are ~0.4 GB int8 each — drain the transfer queue
    # per leaf so host-side tunnel buffers stay bounded (axon discipline)
    from alg_tpu.core.device import sync

    sync(out)
    return out, jnp.asarray(scale, jnp.float32)


def _quantized_linear_impl(p, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 linear: dynamic per-row activation absmax quant, int8 MXU matmul
    with int32 accumulation, dequant epilogue. ``p``: {"kernel_q", "w_scale"
    [, "bias"]} — or the W4A8 form {"kernel_q4", "w_scale4", "w_scale"
    [, "bias"]}, whose int4 weights requantize to int8 on the fly.

    Differentiable wrt ``x`` via a custom VJP: the backward pass multiplies
    by the DEQUANTIZED weights (``dL/dx = g · (kq·scale)ᵀ``), the standard
    QLoRA rule — the int8 dot and the activation round/clip are treated as
    identity for gradient purposes. The frozen weights get zero cotangents
    (full fine-tuning of a quantized base is not a thing; train adapters)."""
    kernel_q = w4_to_int8(p) if "kernel_q4" in p else p["kernel_q"]
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q,
        (((x.ndim - 1,), (kernel_q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w_scale = p["w_scale"].reshape((p["w_scale"].shape[-1],))
    y = acc.astype(jnp.float32) * xs * w_scale
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


@jax.custom_vjp
def quantized_linear(p, x: jnp.ndarray) -> jnp.ndarray:
    return _quantized_linear_impl(p, x)


quantized_linear.__doc__ = _quantized_linear_impl.__doc__


def _quantized_linear_fwd(p, x):
    # residuals must be jax types: a zero-size array carries x's dtype
    return _quantized_linear_impl(p, x), (p, jnp.zeros((0,), x.dtype))


def _quantized_linear_bwd(res, g):
    p, x_proto = res
    kernel_q = w4_to_int8(p) if "kernel_q4" in p else p["kernel_q"]
    w_scale = p["w_scale"].reshape((p["w_scale"].shape[-1],))
    w_deq = kernel_q.astype(jnp.float32) * w_scale  # [..., in, out]
    gf = g.astype(jnp.float32)
    dx = jax.lax.dot_general(
        gf, w_deq, (((gf.ndim - 1,), (w_deq.ndim - 1,)), ((), ()))
    )

    def zero_ct(t):  # int8 kernels take float0 cotangents, floats take zeros
        if jnp.issubdtype(t.dtype, jnp.inexact):
            return jnp.zeros_like(t)
        return np.zeros(t.shape, jax.dtypes.float0)

    return jax.tree.map(zero_ct, p), dx.astype(x_proto.dtype)


quantized_linear.defvjp(_quantized_linear_fwd, _quantized_linear_bwd)


def quantize_kernel_w4(kernel, group: int = 128):
    """Group-wise symmetric int4: kernel [..., in, out] →
    (packed int8 [..., in/2, out] with two nibbles along IN,
     group scales f32 [..., in/group, out],
     int8 requant scale f32 [..., 1, out]).

    Storage is 4-bit (the point: Wan-14B's 16B-param block kernels drop from
    30.5 GB bf16 to ~8 GB); compute stays on the int8 MXU — at use time the
    nibbles dequantize group-wise and requantize to per-output-channel int8
    (`w4_to_int8`), whose extra error is ≤ half an int8 ulp on top of the
    int4 grid. ``group`` must divide the IN dim (128 = one MXU lane group).

    Host math goes through the native C++ fused quantize+pack
    (:mod:`alg_tpu.native`, bitwise-identical) when available."""
    from alg_tpu import native

    w = np.asarray(kernel)
    kin = w.shape[-2]
    if kin % group or kin % 2:
        raise ValueError(f"in dim {kin} not divisible by group {group} (and 2)")
    nat = native.quant_w4(w, group) if (w.ndim >= 2 and w.dtype.kind != "i") else None
    if nat is not None:
        packed, s4, s8 = nat
        out = jnp.asarray(packed)
        from alg_tpu.core.device import sync

        sync(out)
        return out, jnp.asarray(s4, jnp.float32), jnp.asarray(s8, jnp.float32)
    w = np.asarray(w, np.float32)
    lead = w.shape[:-2]
    g_cnt = kin // group
    wg = w.reshape(lead + (g_cnt, group, w.shape[-1]))
    absmax = np.abs(wg).max(axis=-2, keepdims=True)  # [..., G, 1, out]
    s4 = np.maximum(absmax, 1e-12) / 7.0
    # symmetric [-7, 7] (the -8 code would dequantize past the s8 range and
    # clip in the int8 requant — one lost code beats a distorted outlier)
    q4 = np.clip(np.round(wg / s4), -7, 7).astype(np.int8)
    q4 = q4.reshape(lead + (kin, w.shape[-1]))
    packed = (q4[..., 0::2, :] & 0x0F) | (q4[..., 1::2, :] << 4)
    s4 = s4.reshape(lead + (g_cnt, w.shape[-1]))
    # int8 requant scale: the largest dequantized magnitude per out channel
    s8 = np.maximum((7.0 * s4).max(axis=-2, keepdims=True), 1e-12) / 127.0
    out = jnp.asarray(packed.astype(np.int8))
    from alg_tpu.core.device import sync

    sync(out)
    return out, jnp.asarray(s4, jnp.float32), jnp.asarray(s8, jnp.float32)


def w4_to_int8(p) -> jnp.ndarray:
    """Unpack int4 nibbles and requantize group-wise to per-output-channel
    int8 (traced; runs on device each use — ~2 bytes/param of HBM traffic,
    negligible next to the matmul it feeds)."""
    packed = p["kernel_q4"]  # [..., in/2, out] int8
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extended low nibble
    hi = jnp.right_shift(packed, 4)  # arithmetic → sign-extended high nibble
    q4 = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    kin = packed.shape[-2] * 2
    q4 = q4.reshape(packed.shape[:-2] + (kin, packed.shape[-1]))
    s4 = p["w_scale4"]  # [..., G, out]
    g_cnt = s4.shape[-2]
    group = kin // g_cnt
    s8 = p["w_scale"]  # [..., 1, out]
    mult = s4 / s8  # [..., G, out]
    wf = q4.reshape(q4.shape[:-2] + (g_cnt, group, q4.shape[-1])).astype(jnp.float32)
    w8 = jnp.clip(jnp.round(wf * mult[..., :, None, :]), -127, 127).astype(jnp.int8)
    return w8.reshape(q4.shape)


def _is_big_linear(leaf_parent: dict) -> bool:
    k = leaf_parent.get("kernel")
    if k is None or k.ndim < 2:
        return False
    # quantize only the wide block linears where the FLOPs are
    return k.shape[-1] >= 128 and k.shape[-2] >= 128


_BLOCK_KEYS = ("blocks", "transformer_blocks", "single_transformer_blocks")


def _quantize_tree(node: Any, name: str = "", modulation: bool = False, mode: str = "w8") -> Any:
    if not isinstance(node, dict):
        return node
    # default: keep AdaLN/modulation projections full-precision — their
    # outputs gate every residual and their FLOPs are negligible. With
    # ``modulation=True`` they quantize too: their per-row dynamic activation
    # quant error (~0.4 % RMS on the single conditioning token) is on par
    # with bf16's own 8-bit mantissa, and HunyuanVideo's modulation stacks
    # are 6.5 GB — the difference between fitting a 13B DiT on one v5e chip
    # (16 GB HBM) or not (tools/bench_hunyuan_int8.py).
    if not modulation and ("norm" in name or name == "ada"):
        return node
    if "kernel" in node and _is_big_linear(node):
        k = node["kernel"]
        if mode == "w4" and k.shape[-2] % 128 == 0:
            kq4, s4, s8 = quantize_kernel_w4(k)
            out = {"kernel_q4": kq4, "w_scale4": s4, "w_scale": s8}
        else:
            # stacked [L, in, out] kernels quantize per (L, out) channel
            kq, scale = quantize_kernel(k)
            out = {"kernel_q": kq, "w_scale": scale}
        if "bias" in node:
            out["bias"] = node["bias"]
        return out
    return {k: _quantize_tree(v, k, modulation, mode) for k, v in node.items()}


def quantize_transformer_params(params: dict, modulation: bool = False, mode: str = "w8") -> dict:
    """Quantize the big linears inside the DiT block stacks; everything
    outside the blocks (embeddings, heads, modulation tables) is untouched.
    ``modulation=True`` additionally quantizes the in-block AdaLN/modulation
    projections (see ``_quantize_tree``). ``mode="w4"`` stores int4 weights
    (group-128 scales, requantized to int8 at use — the Wan-14B single-chip
    mode); in-dims not divisible by 128 fall back to int8."""
    if mode not in ("w8", "w4"):
        raise ValueError(f"unknown quantization mode {mode!r}")
    out = dict(params)
    for key in _BLOCK_KEYS:
        if key in out:
            out[key] = _quantize_tree(out[key], modulation=modulation, mode=mode)
    return out


def quantize_pipeline(pipe, mode: str = "w8"):
    """Return a copy of a pipeline with its transformer blocks quantized
    (``mode="w8"`` W8A8, ``mode="w4"`` W4A8 int4 storage).

    HBM caution (single chip): quantization walks the existing device tree
    (each kernel round-trips via host), and the CALLER's references keep the
    original bf16 tree alive — both trees are resident until the caller drops
    the unquantized pipeline/params. At CogVideoX-5b scale (10.1 GB bf16 +
    5 GB int8) that exceeds v5e-1 HBM with activations; quantize at load time
    instead with :func:`host_init_quantized_params` (synthetic weights) or by
    quantizing the safetensors tree host-side before streaming."""
    import dataclasses

    return dataclasses.replace(
        pipe, transformer_params=quantize_transformer_params(pipe.transformer_params, mode=mode)
    )


def _quant_w8_traced(w: jnp.ndarray):
    """Traced (on-device) form of :func:`quantize_kernel`'s math for one
    [in, out] slice: per-output-channel symmetric int8 over the IN axis.
    Same formula as the numpy reference (round-half-even, absmax/127)."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    s = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_w4_traced(w: jnp.ndarray, group: int = 128):
    """Traced form of :func:`quantize_kernel_w4` for one [in, out] slice:
    group-wise int4 (symmetric [-7, 7]), nibble-packed along IN, plus the
    per-output-channel int8 requant scale."""
    w = w.astype(jnp.float32)
    kin, out = w.shape
    g_cnt = kin // group
    wg = w.reshape(g_cnt, group, out)
    absmax = jnp.abs(wg).max(axis=1, keepdims=True)
    s4 = jnp.maximum(absmax, 1e-12) / 7.0
    q4 = jnp.clip(jnp.round(wg / s4), -7, 7).astype(jnp.int8).reshape(kin, out)
    packed = (q4[0::2] & jnp.int8(0x0F)) | (q4[1::2] << 4)
    s4 = s4.reshape(g_cnt, out)
    s8 = jnp.maximum((7.0 * s4).max(axis=0, keepdims=True), 1e-12) / 127.0
    return packed, s4, s8


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("scale",))
def _fill_q8_row(bq, bs, key, i, scale):
    w = jax.random.normal(key, bq.shape[1:], jnp.float32) * scale
    w = w.astype(jnp.bfloat16)  # quantize the bf16-rounded values, like host init
    q, s = _quant_w8_traced(w)
    return (
        jax.lax.dynamic_update_slice_in_dim(bq, q[None], i, axis=0),
        jax.lax.dynamic_update_slice_in_dim(bs, s[None], i, axis=0),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("scale",))
def _fill_q4_row(bp, b4, b8, key, i, scale):
    kin = bp.shape[-2] * 2
    w = jax.random.normal(key, (kin, bp.shape[-1]), jnp.float32) * scale
    w = w.astype(jnp.bfloat16)
    p, s4, s8 = _quant_w4_traced(w)
    return (
        jax.lax.dynamic_update_slice_in_dim(bp, p[None], i, axis=0),
        jax.lax.dynamic_update_slice_in_dim(b4, s4[None], i, axis=0),
        jax.lax.dynamic_update_slice_in_dim(b8, s8[None], i, axis=0),
    )


def device_init_quantized_params(
    init_fn, seed: int = 0, scale: float = 0.02, modulation: bool = False, mode: str = "w8"
):
    """Random-init a transformer tree ON the device, quantizing the block
    linears there — the quantized analog of ``core.device.device_init_params``.

    The host path (:func:`host_init_quantized_params`) generates 14B-scale
    fp32 normals on the host, quantizes them, and streams the result through
    the axon tunnel (~15-20 min at tunnel bandwidth). Here each stacked block
    kernel is produced one LAYER SLICE at a time inside a single fused
    program — generate bf16 slice → quantize (same formulas as the numpy
    reference, ``_quant_w8_traced``/``_quant_w4_traced``) → donated
    ``dynamic_update_slice`` into the int8/int4 accumulator buffers — so the
    device never holds a whole bf16 kernel, let alone the bf16 tree: peak
    HBM == the final quantized tree + one bf16 layer slice + its RNG bits.
    Output tree structure is IDENTICAL to :func:`host_init_quantized_params`
    (asserted in tests/test_device_init.py); values are a different random
    draw of the same N(0, scale²) family, which is what benchmarks and
    ``--random_init`` training validation need.
    """
    from alg_tpu.core.device import gen_leaf_on_device, sync

    if mode not in ("w8", "w4"):
        raise ValueError(f"unknown quantization mode {mode!r}")

    shapes = jax.eval_shape(init_fn)
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def nkey():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def gen_plain(node):
        if isinstance(node, dict):
            return {k: gen_plain(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            # e.g. Hunyuan's token-refiner per-layer list
            # (context_embedder/blocks) — kept bf16, but still needs init
            return type(node)(gen_plain(v) for v in node)
        return gen_leaf_on_device(node, nkey(), scale)

    def gen_quantized_kernel(k):
        lead = k.shape[:-2]
        kin, kout = k.shape[-2], k.shape[-1]
        if len(lead) != 1:  # non-stacked kernels are small — whole-leaf is fine
            w = gen_leaf_on_device(k, nkey(), scale)
            if mode == "w4" and kin % 128 == 0:
                p, s4, s8 = jax.jit(_quant_w4_traced)(w)
                sync(p)
                return {"kernel_q4": p, "w_scale4": s4, "w_scale": s8}
            q, s = jax.jit(_quant_w8_traced)(w)
            sync(q)
            return {"kernel_q": q, "w_scale": s}
        L = lead[0]
        lk = nkey()
        if mode == "w4" and kin % 128 == 0:
            bp = jnp.zeros((L, kin // 2, kout), jnp.int8)
            b4 = jnp.zeros((L, kin // 128, kout), jnp.float32)
            b8 = jnp.zeros((L, 1, kout), jnp.float32)
            for i in range(L):
                bp, b4, b8 = _fill_q4_row(bp, b4, b8, jax.random.fold_in(lk, i), i, scale)
                if (i + 1) % 8 == 0:
                    sync(bp)
            sync(bp)
            return {"kernel_q4": bp, "w_scale4": b4, "w_scale": b8}
        bq = jnp.zeros((L, kin, kout), jnp.int8)
        bs = jnp.zeros((L, 1, kout), jnp.float32)
        for i in range(L):
            bq, bs = _fill_q8_row(bq, bs, jax.random.fold_in(lk, i), i, scale)
            if (i + 1) % 8 == 0:
                sync(bq)
        sync(bq)
        return {"kernel_q": bq, "w_scale": bs}

    def walk(node, name=""):
        # mirrors _quantize_tree's structure decisions exactly, but the
        # "untouched" branches still need their (plain bf16) random init
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        if not isinstance(node, dict):
            return gen_leaf_on_device(node, nkey(), scale)
        if not modulation and ("norm" in name or name == "ada"):
            return gen_plain(node)
        if "kernel" in node and _is_big_linear(node):
            out = gen_quantized_kernel(node["kernel"])
            if "bias" in node:
                out["bias"] = gen_leaf_on_device(node["bias"], nkey(), scale)
            return out
        return {k: walk(v, k) for k, v in node.items()}

    out = dict(shapes)
    for tkey in shapes:
        if tkey in _BLOCK_KEYS:
            out[tkey] = walk(shapes[tkey])
        else:
            out[tkey] = gen_plain(shapes[tkey])
    sync(jax.tree_util.tree_leaves(out)[-1])
    return out


def host_init_quantized_params(init_fn, seed: int = 0, scale: float = 0.02, modulation: bool = False, mode: str = "w8"):
    """Random-init a transformer tree HOST-side, quantize its block linears
    host-side, and stream only the quantized result to the device.

    The W8A8 analog of ``core.device.host_init_params``: the device never
    holds the bf16 originals, so peak HBM is the final int8 tree (~half the
    bf16 size) — the only path that fits 5b-scale W8A8 on one v5e chip."""
    import ml_dtypes

    from alg_tpu.core.device import sync

    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    host = []
    for leaf in leaves:
        arr = rng.standard_normal(leaf.shape, dtype=np.float32) * scale
        if leaf.dtype == jnp.bfloat16:
            arr = arr.astype(ml_dtypes.bfloat16)
        else:
            arr = arr.astype(leaf.dtype)
        host.append(arr)
    tree = jax.tree_util.tree_unflatten(treedef, host)
    qtree = quantize_transformer_params(tree, modulation=modulation, mode=mode)  # kernels stream as they quantize

    pending = [0]

    def put(x):
        if isinstance(x, np.ndarray):
            d = jax.device_put(x)
            pending[0] += d.size * d.dtype.itemsize
            if pending[0] > (1 << 30):
                sync(d)
                pending[0] = 0
            return d
        return x

    out = jax.tree_util.tree_map(put, qtree)
    # drain on the LAST leaf streamed — the first was already synced above,
    # so syncing it would leave later transfers in flight
    sync(jax.tree_util.tree_leaves(out)[-1])
    return out
