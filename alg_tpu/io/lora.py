"""LoRA loading — merge diffusers/peft-format LoRA weights into param trees.

The reference pipelines inherit LoRA loader mixins for all three families
(``pipeline_cogvideox_image2video_lowpass.py:168``,
``pipeline_wan_image2video_lowpass.py:128``,
``pipeline_hunyuan_video_image2video_lowpass.py:224``; SURVEY §5 hooks). The
TPU equivalent merges LoRA deltas into the (layer-stacked) kernels ahead of
jit: ``W ← W + scale · (B @ A)ᵀ`` for peft pairs
``<module>.lora_A.weight [r, in]`` / ``<module>.lora_B.weight [out, r]``.

Merging (rather than runtime adapters) is the right TPU call for inference:
zero per-step cost, no graph changes, and adapters can be unmerged by
subtracting the same delta.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from alg_tpu.io.weights import _np

# diffusers module name → param tree path inside one (stacked) block
_COGVIDEOX_BLOCK_MAP = {
    "attn1.to_q": ("attn", "to_q"),
    "attn1.to_k": ("attn", "to_k"),
    "attn1.to_v": ("attn", "to_v"),
    "attn1.to_out.0": ("attn", "to_out"),
    "ff.net.0.proj": ("ff", "fc_in"),
    "ff.net.2": ("ff", "fc_out"),
    "norm1.linear": ("norm1", "linear"),
    "norm2.linear": ("norm2", "linear"),
}

_WAN_BLOCK_MAP = {
    "attn1.to_q": ("attn1", "to_q"),
    "attn1.to_k": ("attn1", "to_k"),
    "attn1.to_v": ("attn1", "to_v"),
    "attn1.to_out.0": ("attn1", "to_out"),
    "attn2.to_q": ("attn2", "to_q"),
    "attn2.to_k": ("attn2", "to_k"),
    "attn2.to_v": ("attn2", "to_v"),
    "attn2.to_out.0": ("attn2", "to_out"),
    "attn2.add_k_proj": ("attn2", "add_k_proj"),
    "attn2.add_v_proj": ("attn2", "add_v_proj"),
    "ffn.net.0.proj": ("ffn", "fc_in"),
    "ffn.net.2": ("ffn", "fc_out"),
}

_HUNYUAN_DOUBLE_BLOCK_MAP = {
    "attn.to_q": ("attn", "to_q"),
    "attn.to_k": ("attn", "to_k"),
    "attn.to_v": ("attn", "to_v"),
    "attn.to_out.0": ("attn", "to_out"),
    "attn.add_q_proj": ("attn", "add_q_proj"),
    "attn.add_k_proj": ("attn", "add_k_proj"),
    "attn.add_v_proj": ("attn", "add_v_proj"),
    "attn.to_add_out": ("attn", "to_add_out"),
    "ff.net.0.proj": ("ff", "fc_in"),
    "ff.net.2": ("ff", "fc_out"),
    "ff_context.net.0.proj": ("ff_context", "fc_in"),
    "ff_context.net.2": ("ff_context", "fc_out"),
    "norm1.linear": ("norm1_linear",),
    "norm1_context.linear": ("norm1_context_linear",),
}

_HUNYUAN_SINGLE_BLOCK_MAP = {
    "attn.to_q": ("attn", "to_q"),
    "attn.to_k": ("attn", "to_k"),
    "attn.to_v": ("attn", "to_v"),
    "proj_mlp": ("proj_mlp",),
    "proj_out": ("proj_out",),
    "norm.linear": ("norm_linear",),
}


def collect_lora_pairs(state: Mapping) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """{module_name: (A [r,in], B [out,r])} from a peft-style state dict.
    Accepts optional "transformer." prefixes and ".default" adapter infixes."""
    pairs: Dict[str, dict] = {}
    for key, value in state.items():
        m = re.match(r"(?:transformer\.)?(.*)\.lora_([AB])(?:\.default)?\.weight$", key)
        if not m:
            continue
        name, which = m.group(1), m.group(2)
        pairs.setdefault(name, {})[which] = _np(value)
    return {
        name: (p["A"], p["B"]) for name, p in pairs.items() if "A" in p and "B" in p
    }


def _merge_stacked(
    params: Mapping,
    pairs: Dict[str, Tuple[np.ndarray, np.ndarray]],
    scale: float,
    stacks: Sequence[Tuple[str, str, Mapping[str, Tuple[str, ...]]]],
):
    """Merge peft pairs into layer-stacked block trees.

    ``stacks``: (diffusers_prefix, params_key, module_map) per block stack —
    kernels inside ``params[params_key]`` are ``[L, in, out]``. Unmatched LoRA
    modules raise — a silent partial merge corrupts outputs.
    """
    import copy

    out = copy.copy(params)
    touched: Dict[Tuple[str, Tuple[str, ...]], dict] = {}

    unmatched = []
    for name, (a, b) in pairs.items():
        hit = None
        for prefix, params_key, module_map in stacks:
            m = re.match(rf"{prefix}\.(\d+)\.(.*)$", name)
            if m and m.group(2) in module_map:
                hit = (params_key, int(m.group(1)), module_map[m.group(2)])
                break
        if hit is None:
            unmatched.append(name)
            continue
        params_key, layer, path = hit
        if (params_key, path) not in touched:
            # copy-on-write down the touched branch only
            if out[params_key] is params[params_key]:
                out[params_key] = dict(params[params_key])
            node = out[params_key]
            src = params[params_key]
            for seg in path[:-1]:
                node[seg] = dict(src[seg]) if node[seg] is src[seg] else node[seg]
                node, src = node[seg], src[seg]
            leaf = dict(src[path[-1]])
            leaf["kernel"] = np.asarray(leaf["kernel"], np.float32).copy()
            node[path[-1]] = leaf
            touched[(params_key, path)] = leaf
        delta = (b @ a).T.astype(np.float32) * scale  # [in, out]
        touched[(params_key, path)]["kernel"][layer] += delta
    if unmatched:
        raise KeyError(
            f"LoRA modules with no mapping: {unmatched[:5]}{'...' if len(unmatched) > 5 else ''}"
        )

    for (params_key, path), leaf in touched.items():
        src = params[params_key]
        for seg in path[:-1]:
            src = src[seg]
        leaf["kernel"] = jnp.asarray(leaf["kernel"], src[path[-1]]["kernel"].dtype)
    return out


def merge_lora_cogvideox(params, lora_state: Mapping, scale: float = 1.0):
    """New CogVideoX transformer param tree with LoRA merged (stacked blocks)."""
    pairs = collect_lora_pairs(lora_state)
    return _merge_stacked(
        params, pairs, scale, [("transformer_blocks", "blocks", _COGVIDEOX_BLOCK_MAP)]
    )


def merge_lora_wan(params, lora_state: Mapping, scale: float = 1.0):
    """New Wan transformer param tree with LoRA merged (reference mixin
    analog, ``pipeline_wan_image2video_lowpass.py:128``)."""
    pairs = collect_lora_pairs(lora_state)
    return _merge_stacked(params, pairs, scale, [("blocks", "blocks", _WAN_BLOCK_MAP)])


def merge_lora_hunyuan(params, lora_state: Mapping, scale: float = 1.0):
    """New HunyuanVideo transformer param tree with LoRA merged — covers both
    the double-stream and single-stream stacks (reference mixin analog,
    ``pipeline_hunyuan_video_image2video_lowpass.py:224``)."""
    pairs = collect_lora_pairs(lora_state)
    return _merge_stacked(
        params,
        pairs,
        scale,
        [
            ("transformer_blocks", "transformer_blocks", _HUNYUAN_DOUBLE_BLOCK_MAP),
            ("single_transformer_blocks", "single_transformer_blocks", _HUNYUAN_SINGLE_BLOCK_MAP),
        ],
    )
