"""Noise generation with torch-parity.

The reference draws all stochastic values from a ``torch.Generator`` seeded
with 42 (``run.py:94``): initial latent noise via diffusers ``randn_tensor``
and per-sample VAE posterior draws (``...cogvideox...py:388-391,419``). For
fixed-seed fp32 output parity (BASELINE north star) we reproduce the exact
draw *sequence* host-side with torch-CPU and feed the result to the jitted
sampler as an input — the device never needs torch RNG semantics, and the
compiled graph stays RNG-free (SURVEY §7 "hard parts" #1).

When torch is unavailable (or parity is not requested) a JAX PRNG fallback is
used. Noise is always materialized *before* the jit'd loop; per-step schedulers
here are deterministic (DDIM eta=0 / DPM / flow-match), so no in-loop draws
are needed for any shipped config.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import torch

    _HAS_TORCH = True
except ImportError:  # pragma: no cover
    _HAS_TORCH = False


def torch_randn(shape: Sequence[int], generator=None, seed: Optional[int] = None, dtype=np.float32) -> np.ndarray:
    """Standard-normal draw matching torch's CPU Generator sequence.

    Either pass an existing ``torch.Generator`` (draw order matters — the
    reference threads one generator through latent init and VAE sampling) or a
    seed to create a fresh one.
    """
    if not _HAS_TORCH:
        raise RuntimeError("torch is required for torch-parity noise; use NoiseSource(jax_seed=...) instead")
    if generator is None:
        generator = torch.Generator()
        generator.manual_seed(42 if seed is None else seed)
    out = torch.randn(tuple(shape), generator=generator, dtype=torch.float32)
    return out.numpy().astype(dtype)


def torch_randn_like(array, generator=None, seed: Optional[int] = None) -> np.ndarray:
    return torch_randn(np.shape(array), generator=generator, seed=seed, dtype=np.asarray(array).dtype)


class NoiseSource:
    """Sequential noise draws: torch-parity when possible, JAX PRNG otherwise.

    One instance per sampling run, mirroring the reference's single
    ``torch.Generator`` threaded through every draw (``run.py:94``).
    """

    def __init__(self, seed: int = 42, use_torch: bool = True):
        self.seed = seed
        self.use_torch = use_torch and _HAS_TORCH
        if self.use_torch:
            self._gen = torch.Generator()
            self._gen.manual_seed(seed)
        else:
            import jax

            self._key = jax.random.PRNGKey(seed)

    def randn(self, shape: Sequence[int], dtype=np.float32) -> np.ndarray:
        if self.use_torch:
            return torch_randn(shape, generator=self._gen, dtype=dtype)
        import jax

        self._key, sub = jax.random.split(self._key)
        return np.asarray(jax.random.normal(sub, tuple(shape), dtype=np.float32)).astype(dtype)
