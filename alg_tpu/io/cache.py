"""Converted-weights disk cache (SURVEY §5 checkpoint/resume analog).

The reference re-loads HF checkpoints via ``from_pretrained`` each run
(``run.py:45-86``). Converting safetensors → alg_tpu pytrees (transposes,
stacking 40+ layers) is expensive at 13-14B scale, so converted trees are
cached on disk as a flat ``.npz`` keyed by pytree paths (dict keys as-is,
list indices as ``#i``) and rebuilt structurally on load — no pickling, and
loading goes host numpy → ``device_put`` (the axon memory-safe path).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(f"#{p.idx}")
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_params(path: str, params) -> None:
    import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

    arrays = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _path_str(kp)
        arr = np.asarray(leaf)
        if arr.dtype == np.dtype("bfloat16"):
            arrays["BF16::" + key] = arr.view(np.uint16)  # npz can't store bf16
        else:
            arrays[key] = arr
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_params(path: str) -> Optional[Any]:
    """Rebuild the cached tree; returns None when the file is absent.

    Structure comes from the keys: a node whose children are all ``#i`` is a
    list, otherwise a dict. Leaves are placed on the default device one at a
    time (bounded memory on the axon backend).
    """
    import ml_dtypes

    if not os.path.exists(path):
        return None
    data = np.load(path)

    nested: Dict[str, Any] = {}
    for k in data.files:
        key = k
        if key.startswith("BF16::"):
            arr = data[k].view(ml_dtypes.bfloat16)
            key = key[len("BF16::") :]
        else:
            arr = data[k]
        node = nested
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jax.device_put(arr)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(key.startswith("#") for key in node):
            return [listify(node[f"#{i}"]) for i in range(len(node))]
        return {key: listify(value) for key, value in node.items()}

    return listify(nested)
