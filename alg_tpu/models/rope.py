"""Rotary position embedding helpers.

Two pairing conventions appear across the model zoo:
  * interleaved pairs ``(x0,x1),(x2,x3),...`` — CogVideoX / Hunyuan / Wan
    (diffusers ``apply_rotary_emb(..., use_real_unbind_dim=-1)`` and the
    complex-view variants),
  * half-split ``(x[:d/2], x[d/2:])`` — Llama-style text encoders.

All cos/sin tables are precomputed host-side per run (positions are static)
and fed to the jitted model as arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def rope_frequencies(dim: int, positions: np.ndarray, theta: float = 10000.0) -> np.ndarray:
    """Angles ``[N, dim/2]``: outer(pos, 1/theta^(arange(0,dim,2)/dim))."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(positions.astype(np.float64), inv)


def cos_sin_interleaved(angles: np.ndarray, dtype=np.float32):
    """(cos, sin) with each angle repeated twice: ``[N, dim]`` for interleaved pairs."""
    c = np.repeat(np.cos(angles), 2, axis=-1).astype(dtype)
    s = np.repeat(np.sin(angles), 2, axis=-1).astype(dtype)
    return c, s


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs: out = x·cos + rot(x)·sin, rot: (x0,x1)→(−x1,x0).

    ``x``: [..., S, D]; ``cos``/``sin``: [S, D] (or broadcastable).
    Matches diffusers ``apply_rotary_emb(use_real=True, use_real_unbind_dim=-1)``.
    Computes in the input dtype (bf16 rope for bf16 activations — the rotation
    is value-preserving so bf16 rounding here matches the surrounding compute;
    fp32 parity runs stay fp32).

    The pair rotation is expressed as lane rolls + an even/odd select instead
    of a (..., D/2, 2) reshape/stack: even lanes take −(next lane), odd lanes
    take +(previous lane) — no roll ever crosses a pair boundary. On TPU the
    reshape form lowers to lane-shuffle relayouts that cost ~2× (measured
    5.1 → 2.7 ms per [2,48,17776,64] tensor on v5e); the values are
    bit-identical.
    """
    c = jnp.asarray(cos, x.dtype)
    s = jnp.asarray(sin, x.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (x.shape[-1],), 0)
    even = (lane % 2) == 0
    rot = jnp.where(even, -jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))
    return x * c + rot * s


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Llama-style rotate-half: rot(x) = (−x[d/2:], x[:d/2]).

    ``cos``/``sin``: [S, D] built by tiling the ``[S, D/2]`` angle table twice
    (``concatenate`` not ``repeat``).
    """
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


def cos_sin_half(angles: np.ndarray, dtype=np.float32):
    """(cos, sin) tiled twice along the feature dim: Llama convention."""
    c = np.concatenate([np.cos(angles), np.cos(angles)], axis=-1).astype(dtype)
    s = np.concatenate([np.sin(angles), np.sin(angles)], axis=-1).astype(dtype)
    return c, s
