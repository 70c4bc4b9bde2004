"""Noise generation with torch-parity — torch-free at runtime.

The reference draws all stochastic values from a ``torch.Generator`` seeded
with 42 (``run.py:94``): initial latent noise via diffusers ``randn_tensor``
and per-sample VAE posterior draws (``...cogvideox...py:388-391,419``). For
fixed-seed fp32 output parity (BASELINE north star) we reproduce the exact
draw *sequence* host-side and feed the result to the jitted sampler as an
input — the device never needs torch RNG semantics, and the compiled graph
stays RNG-free (SURVEY §7 "hard parts" #1).

Since round 3 the backend is :mod:`alg_tpu.core.torch_rng` — a pure-numpy,
bit-exact reimplementation of torch's CPU generator (MT19937 engine +
``normal_fill``/``normal_distribution`` transforms, validated bitwise in
``tests/test_torch_rng.py``) — so torch is a test-only dependency. Noise is
always materialized *before* the jit'd loop; the per-step schedulers here are
deterministic (DDIM / DPM / flow-match), so no in-loop draws are needed for
any shipped config (DDIM ``eta>0`` and DPM-SDE noise stacks are pre-generated
host-side the same way).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from alg_tpu.core.torch_rng import TorchCPUGenerator


def torch_randn(shape: Sequence[int], generator=None, seed: Optional[int] = None, dtype=np.float32) -> np.ndarray:
    """Standard-normal draw matching torch's CPU Generator sequence, bitwise.

    Either pass an existing :class:`TorchCPUGenerator` (draw order matters —
    the reference threads one generator through latent init and VAE sampling)
    or a seed to create a fresh one. A real ``torch.Generator`` is NOT
    accepted — the whole point is running without torch.
    """
    if generator is None:
        generator = TorchCPUGenerator(42 if seed is None else seed)
    return generator.randn(tuple(shape), dtype=np.float32).astype(dtype)


def torch_randn_like(array, generator=None, seed: Optional[int] = None) -> np.ndarray:
    return torch_randn(np.shape(array), generator=generator, seed=seed, dtype=np.asarray(array).dtype)


class NoiseSource:
    """Sequential torch-ordered noise draws from one generator per run.

    Mirrors the reference's single ``torch.Generator`` threaded through every
    draw (``run.py:94``); backed by the numpy reimplementation, so parity-grade
    runs no longer require torch (VERDICT r2 item #6). ``use_torch`` is kept
    for backward compatibility and ignored (the stream is torch's either way).
    """

    def __init__(self, seed: int = 42, use_torch: bool = True):
        self.seed = seed
        self._gen = TorchCPUGenerator(seed)

    def randn(self, shape: Sequence[int], dtype=np.float32) -> np.ndarray:
        return self._gen.randn(tuple(shape), dtype=np.float32).astype(dtype)

    def rand(self, shape: Sequence[int], dtype=np.float32) -> np.ndarray:
        return self._gen.rand(tuple(shape), dtype=np.float32).astype(dtype)
