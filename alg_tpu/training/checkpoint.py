"""Training checkpoint/resume + EMA.

The reference has no checkpoint/resume of any kind (inference only,
SURVEY §5) — this is beyond-parity surface completing the training tier: a
fine-tune run can stop (preemption, axon tunnel loss) and resume bit-exactly.

Design: one ``.npz`` per checkpoint holding the trainable tree, the full
optimizer state (AdamW moments + counts), the optional EMA shadow tree, and
the step counter. Pytree structure is NOT serialized — arrays are keyed by
flattened index (``opt/000``...) and restored into the structure of a
template (``like``) tree, exactly as :func:`alg_tpu.training.load_params_npz`
does for params; the template is always reconstructible from the run's
config (same init + ``opt.init``), so the file stays a plain tensor bag —
inspectable, no pickle.

EMA follows the standard diffusion-trainer recipe: a float32 shadow of the
trainable tree updated as ``ema = d·ema + (1−d)·p`` after each step, jitted
and donated so it costs one fused multiply-add pass in HBM. Export the EMA
tree (not the raw params) for sampling checkpoints.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def make_ema_update(decay: float):
    """Jitted ``ema_update(ema, params) → ema`` (donates the old shadow)."""

    def update(ema, params):
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
        )

    return jax.jit(update, donate_argnums=(0,))


def init_ema(params):
    """Float32 shadow copy of the trainable tree.

    Must be a real copy — ``jnp.asarray`` on an fp32 leaf aliases the param
    buffer, and :func:`make_ema_update` donates its first argument, which
    would delete the live params through the alias.
    """
    return jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params)


def _flatten(tag: str, tree) -> dict:
    return {
        f"{tag}/{i:04d}": np.asarray(leaf)
        for i, leaf in enumerate(jax.tree.leaves(tree))
    }


def _unflatten(tag: str, data: dict, like):
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = []
    for i, leaf in enumerate(leaves):
        arr = data[f"{tag}/{i:04d}"]
        if arr.shape != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint {tag}[{i}]: saved shape {arr.shape} != expected {tuple(leaf.shape)}"
            )
        out.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def save_train_state(path: str, step: int, trainable, opt_state, ema=None) -> None:
    """Write one checkpoint file (atomic rename, safe under preemption)."""
    data = {"step": np.asarray(step, np.int64)}
    data.update(_flatten("trainable", trainable))
    data.update(_flatten("opt", opt_state))
    if ema is not None:
        data.update(_flatten("ema", ema))
    tmp = path + ".tmp"
    np.savez(tmp, **data)
    # np.savez appends .npz to names without it
    if not tmp.endswith(".npz"):
        tmp += ".npz"
    os.replace(tmp, path)


def load_train_state(path: str, trainable_like, opt_state_like, ema_like=None):
    """Restore ``(step, trainable, opt_state, ema)`` into template structures.

    ``ema_like`` may be passed even when the file has no EMA (returns None) —
    so a run can turn EMA on at resume time; a file WITH an EMA restored
    without ``ema_like`` raises (silently dropping it would be a data loss).
    """
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    step = int(data["step"])
    trainable = _unflatten("trainable", data, trainable_like)
    opt_state = _unflatten("opt", data, opt_state_like)
    has_ema = any(k.startswith("ema/") for k in data)
    if has_ema and ema_like is None:
        raise ValueError(f"{path} contains an EMA tree; pass ema_like to restore it")
    ema = _unflatten("ema", data, ema_like) if has_ema else None
    return step, trainable, opt_state, ema


_CKPT_RE = re.compile(r"^step_(\d+)\.npz$")


def checkpoint_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step_{step:08d}.npz")


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the highest-step ``step_*.npz`` under ``ckpt_dir`` (or None)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), name)
    return os.path.join(ckpt_dir, best[1]) if best else None


def prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` checkpoints."""
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    steps = sorted(
        int(m.group(1))
        for m in (_CKPT_RE.match(n) for n in os.listdir(ckpt_dir))
        if m
    )
    for step in steps[:-keep]:
        os.remove(checkpoint_path(ckpt_dir, step))
