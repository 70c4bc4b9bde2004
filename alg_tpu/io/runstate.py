"""Preemption-safe denoise checkpoint/resume.

The reference has NO failure recovery (SURVEY §5): its only mechanism is the
cooperative ``self._interrupt`` flag checked each step
(``pipeline_cogvideox_image2video_lowpass.py:1006-1007``), and an interrupted
run's work is lost. A production 50-step video is minutes of device time; on
preemptible TPU pools the run must survive process death. This module adds an
atomic, fingerprinted on-disk snapshot of the sampler carry, saved at scan
chunk boundaries.

Design (TPU-first):

* Everything BEFORE the denoise loop — prompt embeds, VAE-encoded
  conditioning, the initial noise, and every per-step noise table (DPM-SDE /
  stochastic-DDIM / pixel-mode posterior draws) — is deterministic given the
  call args + seed (the bit-exact ``core.torch_rng`` generator). So the
  snapshot only needs ``(next_step, carry pytree)``; resume re-runs the cheap
  prefix and fast-forwards the chunk loop to the saved step.
* The carry pytree differs per family (CogVideoX: ``(latents, old_pred)`` for
  DPM threading; Wan: ``(latents, UniPC multistep state)``; Hunyuan: bare
  latents). Snapshots store flattened leaves and restore into the live carry
  TEMPLATE, validating shape and dtype leaf by leaf — any mismatch falls back
  to a fresh run with a warning, never an error.
* Saves are atomic (write to a temp file in the same directory, then
  ``os.replace``) and fingerprinted with a hash of the generation arguments:
  resuming with ANY changed argument starts fresh.
* A resumed run is BITWISE identical to an uninterrupted one: scan-chunk
  boundaries don't change the sequential step math, fp32 round-trips exactly
  through ``.npz``, and all stochastic inputs are precomputed host tables
  (asserted by ``tests/test_runstate.py``).

Cost: one host fetch of the carry per save (a device→host sync through the
axon tunnel). Off by default; enable by passing ``checkpoint=`` to a
pipeline call (a path string or a :class:`RunCheckpoint`).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)


def run_fingerprint(kind: str, **args: Any) -> str:
    """Stable hash of the generation arguments that define a run.

    Values are reduced with ``repr`` (args are strings/scalars/small tuples);
    arrays passed directly (``latents=``, ``prompt_embeds=``) are not hashed —
    shape/dtype validation of the carry at restore time covers those.
    """
    payload = json.dumps(
        {"kind": kind, **{k: repr(v) for k, v in args.items()}}, sort_keys=True
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


class RunCheckpoint:
    """On-disk snapshot of a sampler carry, saved every ``every`` steps.

    Pipelines call :meth:`restore` once with the freshly-built initial carry
    (the template), :meth:`maybe_save` after each dispatched chunk, and
    :meth:`complete` after the loop finishes (removes the file unless
    ``keep=True`` was requested).
    """

    def __init__(self, path: str, fingerprint: str = "", every: int = 8, keep: bool = False):
        self.path = str(path)
        self.fingerprint = fingerprint
        self.every = max(1, int(every))
        self.keep = bool(keep)
        self._last_saved: Optional[int] = None

    # -- restore ------------------------------------------------------------

    def restore(self, carry: Any) -> Tuple[int, Any]:
        """Return ``(start_step, carry)`` — leaves replaced from disk when a
        valid snapshot with a matching fingerprint exists, else ``(0, carry)``
        unchanged."""
        if not os.path.exists(self.path):
            return 0, carry
        try:
            with np.load(self.path) as z:
                if str(z["fingerprint"]) != self.fingerprint:
                    log.warning(
                        "runstate %s: fingerprint mismatch (different generation "
                        "args) — starting fresh",
                        self.path,
                    )
                    return 0, carry
                step = int(z["step"])
                leaves = [z[f"leaf_{i}"] for i in range(int(z["n_leaves"]))]
        except Exception as e:  # truncated/corrupt file: never fail the run
            log.warning("runstate %s: unreadable (%s) — starting fresh", self.path, e)
            return 0, carry

        live, treedef = jax.tree_util.tree_flatten(carry)
        if len(live) != len(leaves) or any(
            tuple(l.shape) != tuple(np.shape(c)) or l.dtype != np.asarray(c).dtype
            for l, c in zip(leaves, live)
        ):
            log.warning(
                "runstate %s: carry structure mismatch — starting fresh", self.path
            )
            return 0, carry

        import jax.numpy as jnp

        self._last_saved = step
        log.info("runstate %s: resuming denoise from step %d", self.path, step)
        return step, jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(l) for l in leaves]
        )

    # -- save ---------------------------------------------------------------

    def maybe_save(self, next_step: int, carry: Any) -> None:
        """Save when ``next_step`` is ≥ ``every`` steps past the last save."""
        if self._last_saved is not None and next_step - self._last_saved < self.every:
            return
        self.save(next_step, carry)

    def save(self, next_step: int, carry: Any) -> None:
        leaves, _ = jax.tree_util.tree_flatten(carry)
        arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}  # host sync
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:  # file handle: np.savez must not append .npz
            np.savez(
                f,
                step=np.int64(next_step),
                n_leaves=np.int64(len(leaves)),
                fingerprint=self.fingerprint,
                **arrs,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
        self._last_saved = next_step

    def complete(self) -> None:
        """The run finished: drop the snapshot (unless ``keep``)."""
        if self.keep:
            return
        try:
            os.remove(self.path)
        except OSError:
            pass


def as_checkpoint(
    checkpoint: "str | RunCheckpoint | None", fingerprint: str, every: int
) -> Optional[RunCheckpoint]:
    """Normalize a pipeline's ``checkpoint=`` kwarg (path or instance)."""
    if checkpoint is None:
        return None
    if isinstance(checkpoint, RunCheckpoint):
        if not checkpoint.fingerprint:
            checkpoint.fingerprint = fingerprint
        return checkpoint
    return RunCheckpoint(str(checkpoint), fingerprint, every=every)
