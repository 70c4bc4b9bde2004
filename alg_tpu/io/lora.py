"""LoRA loading — merge diffusers/peft-format LoRA weights into param trees.

The reference pipelines inherit LoRA loader mixins
(``pipeline_cogvideox_image2video_lowpass.py:168``, SURVEY §5 hooks). The TPU
equivalent merges LoRA deltas into the (possibly layer-stacked) kernels ahead
of jit: ``W ← W + scale · (B @ A)ᵀ`` for peft pairs
``<module>.lora_A.weight [r, in]`` / ``<module>.lora_B.weight [out, r]``.

Merging (rather than runtime adapters) is the right TPU call for inference:
zero per-step cost, no graph changes, and adapters can be unmerged by
subtracting the same delta.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp

from alg_tpu.io.weights import _np

# diffusers module name → (param tree path under blocks, is_stacked)
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


def merge_lora_cogvideox(params, lora_state: Mapping, scale: float = 1.0):
    """Return a new CogVideoX transformer param tree with LoRA merged.

    Handles the layer-stacked block layout (kernels ``[L, in, out]``).
    Unmatched LoRA modules raise — a silent partial merge corrupts outputs.
    """
    import copy

    pairs = collect_lora_pairs(lora_state)
    out = copy.copy(params)
    out["blocks"] = dict(params["blocks"])
    blocks = out["blocks"]
    # deep-ish copy of touched branches only
    touched = {}

    unmatched = []
    for name, (a, b) in pairs.items():
        m = re.match(r"transformer_blocks\.(\d+)\.(.*)$", name)
        if m:
            layer = int(m.group(1))
            sub = m.group(2)
            if sub not in _COGVIDEOX_BLOCK_MAP:
                unmatched.append(name)
                continue
            grp, leaf = _COGVIDEOX_BLOCK_MAP[sub]
            if (grp, leaf) not in touched:
                branch = dict(blocks[grp])
                branch[leaf] = dict(branch[leaf])
                branch[leaf]["kernel"] = np.asarray(
                    branch[leaf]["kernel"], np.float32
                ).copy()
                blocks[grp] = branch
                touched[(grp, leaf)] = branch[leaf]
            delta = (b @ a).T.astype(np.float32) * scale  # [in, out]
            touched[(grp, leaf)]["kernel"][layer] += delta
        else:
            unmatched.append(name)
    if unmatched:
        raise KeyError(f"LoRA modules with no mapping: {unmatched[:5]}{'...' if len(unmatched) > 5 else ''}")

    for (grp, leaf), branch in touched.items():
        dtype = params["blocks"][grp][leaf]["kernel"].dtype
        branch["kernel"] = jnp.asarray(branch["kernel"], dtype)
    return out
