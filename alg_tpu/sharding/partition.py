"""Partition specs (Megatron-style TP + DP) for the model param trees.

Weight-stacked scan blocks have a leading layer axis, so a 2D kernel spec
``P(None, "tp")`` becomes ``P(None, None, "tp")`` on the stacked leaf.
Column-parallel: qkv projections and MLP fc_in (output dim sharded).
Row-parallel: attention out-proj and MLP fc_out (input dim sharded; XLA
inserts the all-reduce). Norms, modulation linears, embeddings: replicated —
they are tiny next to the attention/MLP weights.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def cogvideox_transformer_specs(params) -> dict:
    """PartitionSpec pytree matching ``init_cogvideox_transformer`` output."""

    def rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    blocks = params["blocks"]
    block_specs = rep(blocks)
    block_specs["attn"]["to_q"] = _col(blocks["attn"]["to_q"])
    block_specs["attn"]["to_k"] = _col(blocks["attn"]["to_k"])
    block_specs["attn"]["to_v"] = _col(blocks["attn"]["to_v"])
    block_specs["attn"]["to_out"] = _row(blocks["attn"]["to_out"])
    block_specs["ff"]["fc_in"] = _col(blocks["ff"]["fc_in"])
    block_specs["ff"]["fc_out"] = _row(blocks["ff"]["fc_out"])

    specs = rep({k: v for k, v in params.items() if k != "blocks"})
    specs["blocks"] = block_specs
    return specs


def _col(p) -> dict:
    """Column-parallel linear: output features sharded. Handles the W8A8
    form ({kernel_q [L,in,out] int8, w_scale [L,1,out]}) and the W4A8 form
    ({kernel_q4 [L,in/2,out], w_scale4 [L,G,out], w_scale [L,1,out]},
    alg_tpu.ops.quant) — all scale trees shard with their out axis."""
    if "kernel_q4" in p:
        out = {"kernel_q4": P(None, None, "tp"), "w_scale4": P(None, None, "tp"),
               "w_scale": P(None, None, "tp")}
    elif "kernel_q" in p:
        out = {"kernel_q": P(None, None, "tp"), "w_scale": P(None, None, "tp")}
    else:
        out = {"kernel": P(None, None, "tp")}
    if "bias" in p:
        out["bias"] = P(None, "tp")
    return out


def _row(p) -> dict:
    """Row-parallel linear: input features sharded (XLA adds the all-reduce
    around the int32/fp32 accumulator; the dequant scales are per-output and
    replicate). W4A8: the packed nibble axis and the group-scale axis both
    follow the input dim."""
    if "kernel_q4" in p:
        out = {"kernel_q4": P(None, "tp", None), "w_scale4": P(None, "tp", None),
               "w_scale": P()}
    elif "kernel_q" in p:
        out = {"kernel_q": P(None, "tp", None), "w_scale": P()}
    else:
        out = {"kernel": P(None, "tp", None)}
    if "bias" in p:
        out["bias"] = P()
    return out


def wan_transformer_specs(params) -> dict:
    """PartitionSpec pytree matching ``init_wan_transformer`` output.

    Both attention streams (self + the UMT5/CLIP-image cross-attention,
    reference ``pipeline_wan_image2video_lowpass.py:910-917``) are
    Megatron-sharded. Wan's q/k RMSNorms act on the full ``dim`` after the
    column-parallel projection, so their scales shard with it.
    """

    def rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    blocks = params["blocks"]
    block_specs = rep(blocks)
    for attn in ("attn1", "attn2"):
        a = blocks[attn]
        sp = block_specs[attn]
        for name in ("to_q", "to_k", "to_v"):
            sp[name] = _col(a[name])
        sp["to_out"] = _row(a["to_out"])
        sp["norm_q"] = {"scale": P(None, "tp")}
        sp["norm_k"] = {"scale": P(None, "tp")}
        if "add_k_proj" in a:
            sp["add_k_proj"] = _col(a["add_k_proj"])
            sp["add_v_proj"] = _col(a["add_v_proj"])
            sp["norm_added_k"] = {"scale": P(None, "tp")}
    block_specs["ffn"]["fc_in"] = _col(blocks["ffn"]["fc_in"])
    block_specs["ffn"]["fc_out"] = _row(blocks["ffn"]["fc_out"])

    specs = rep({k: v for k, v in params.items() if k != "blocks"})
    specs["blocks"] = block_specs
    return specs


def hunyuan_transformer_specs(params) -> dict:
    """PartitionSpec pytree matching ``init_hunyuan_transformer`` output.

    Double-stream blocks shard both the video (to_*) and text (add_*)
    projections; single-stream blocks shard qkv + proj_mlp column-wise and
    proj_out row-wise (its input is the concat of the head-sharded attention
    output and the tp-sharded MLP activations; GSPMD reshards the concat).
    Per-head-dim q/k RMSNorms and the token refiner (2 tiny layers) stay
    replicated.
    """

    def rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    specs = rep({k: v for k, v in params.items() if k not in ("transformer_blocks", "single_transformer_blocks")})

    dbl = params["transformer_blocks"]
    d_specs = rep(dbl)
    a = dbl["attn"]
    sp = d_specs["attn"]
    for name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
        sp[name] = _col(a[name])
    sp["to_out"] = _row(a["to_out"])
    sp["to_add_out"] = _row(a["to_add_out"])
    for ff in ("ff", "ff_context"):
        d_specs[ff]["fc_in"] = _col(dbl[ff]["fc_in"])
        d_specs[ff]["fc_out"] = _row(dbl[ff]["fc_out"])
    specs["transformer_blocks"] = d_specs

    sgl = params["single_transformer_blocks"]
    s_specs = rep(sgl)
    for name in ("to_q", "to_k", "to_v"):
        s_specs["attn"][name] = _col(sgl["attn"][name])
    s_specs["proj_mlp"] = _col(sgl["proj_mlp"])
    s_specs["proj_out"] = _row(sgl["proj_out"])
    specs["single_transformer_blocks"] = s_specs
    return specs


_BLOCK_KEYS = ("blocks", "transformer_blocks", "single_transformer_blocks")


def add_pp(specs: dict, block_keys=_BLOCK_KEYS) -> dict:
    """Stage the stacked block layers over the ``pp`` mesh axis.

    Prefixes ``"pp"`` onto the leading (layer) axis of every spec leaf under
    the stacked-block subtrees, keeping the tp column/row sharding on the
    trailing axes — pp×tp compose (``sharding/pipeline.py`` is manual over
    pp only; GSPMD keeps handling tp). Non-block params stay as given.
    """
    out = dict(specs)
    for key in block_keys:
        if key in out:
            out[key] = jax.tree.map(lambda s: P("pp", *tuple(s)[1:]), out[key])
    return out


def shard_params(params, specs, mesh):
    """Place a param tree on the mesh according to its spec tree.

    W4A8 row-parallel guard: a ``kernel_q4`` sharded on its packed-IN axis
    must keep whole 128-element quantization groups per shard (the group
    scales in ``w_scale4`` shard with it) — i.e. ``in % (128·tp) == 0``.
    Misaligned cases should quantize with ``mode="w8"`` instead."""
    from jax.sharding import NamedSharding

    tp = mesh.shape.get("tp", 1)

    def _check(path, x, s):
        name = str(getattr(path[-1], "key", ""))
        if name == "kernel_q4" and tp > 1 and len(s) >= 2 and s[-2] == "tp":
            kin = x.shape[-2] * 2
            if kin % (128 * tp):
                raise ValueError(
                    f"W4A8 row-parallel linear with in dim {kin} cannot shard "
                    f"over tp={tp}: quantization groups (128) would straddle "
                    f"shards. Use mode='w8' for this model/tp combination."
                )
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map_with_path(_check, params, specs)
