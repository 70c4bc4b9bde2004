"""Block-level rematerialization toggle for training.

The reference is inference-only (SURVEY §0), so its memory story never needed
activation checkpointing. Training a 42-layer DiT does: without remat every
block's activations stay live for the backward pass (~num_layers × the block
working set). The TPU-idiomatic fix is ``jax.checkpoint`` on the scanned block
body — forward saves only each block's *inputs*; the backward recomputes the
block on the fly, trading one extra forward's FLOPs for O(1)-in-depth
activation memory (the standard remat-inside-scan recipe).

The flag is read at TRACE time by the model forwards (the scan bodies wrap
themselves in ``jax.checkpoint`` when enabled), so it must be active while a
jitted train step is being traced. ``alg_tpu.training.make_train_step`` wraps
the loss so the context is applied on every (re)trace — user code normally
never touches this module directly.
"""

from __future__ import annotations

import contextlib

import jax

_REMAT = False


def remat_enabled() -> bool:
    """True while inside a :func:`remat_blocks` context (trace-time check)."""
    return _REMAT


@contextlib.contextmanager
def remat_blocks(enable: bool = True):
    """Enable ``jax.checkpoint`` on all scanned DiT block bodies."""
    global _REMAT
    prev = _REMAT
    _REMAT = enable
    try:
        yield
    finally:
        _REMAT = prev


def maybe_checkpoint(body):
    """Wrap a ``lax.scan`` body in ``jax.checkpoint`` when remat is enabled.

    Plain checkpoint (save block inputs only, recompute everything in the
    backward) — activation memory becomes O(1) in layer count, at the cost
    of one extra forward pass worth of FLOPs.
    """
    if not _REMAT:
        return body
    return jax.checkpoint(body)
