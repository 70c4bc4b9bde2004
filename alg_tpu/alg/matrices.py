"""Low-pass filters as precomputed separable linear operators.

Both reference filter types (reference ``lp_utils.py:40-54``) are linear maps
over the spatial dims, separable into row/column operators:

    filtered = M_h @ x @ M_w^T        with  M_h: [H, H],  M_w: [W, W]

This is the centerpiece of the TPU-native design: the adaptive strength
schedule modulates the filter *parameters* per denoise step (reference
``pipeline_cogvideox_image2video_lowpass.py:1034-1040``), which changes resize
*shapes* — a jit blocker if done directly. Instead we precompute one matrix
pair per step at trace time (identity on inactive steps), stack them into
``[T, H, H]`` / ``[T, W, W]`` arrays, and gather by step index inside the
compiled ``lax.scan``. The filter becomes two batched matmuls on the MXU —
fixed shapes, zero recompiles, zero host round-trips — and is numerically
identical to the direct implementation up to fp32 matmul rounding.

Matrices are built eagerly (host side, before jit) with numpy/eager-jax.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.alg.filters import gaussian_kernel_1d, resolve_kernel_size


@functools.lru_cache(maxsize=256)
def bilinear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """``[out_size, in_size]`` matrix of an antialiased bilinear 1D resize.

    Exactly the operator applied by ``jax.image.resize(method="linear",
    antialias=True)`` (== torch ``F.interpolate(bilinear, align_corners=False,
    antialias=True)``), extracted by resizing the identity. Resize is linear,
    so this is exact, not an approximation.
    """
    eye = np.eye(in_size, dtype=np.float32)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        out = jax.image.resize(jnp.asarray(eye), (out_size, in_size), method="linear", antialias=True)
    return np.asarray(out)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


@functools.lru_cache(maxsize=256)
def down_up_matrix(size: int, resize_factor: float) -> np.ndarray:
    """``[size, size]`` operator of down-then-up antialiased bilinear resize.

    Matches reference ``lp_utils.py:49-54``: down to ``max(1, round(size*f))``
    and back, antialias both directions. ``f == 1.0`` → identity (no-op early
    exit, ``lp_utils.py:25-26``).
    """
    if resize_factor == 1.0:
        return np.eye(size, dtype=np.float32)
    mid = max(1, int(round(size * resize_factor)))
    a_down = bilinear_resize_matrix(size, mid)
    a_up = bilinear_resize_matrix(mid, size)
    return (a_up @ a_down).astype(np.float32)


def _reflect_index(i: int, n: int) -> int:
    """PyTorch 'reflect' padding index (no edge repeat), e.g. n=4: -1→1, 4→2."""
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i = abs(i) % period
    return period - i if i >= n else i


@functools.lru_cache(maxsize=256)
def gaussian_blur_matrix(size: int, kernel_size: int, sigma: float) -> np.ndarray:
    """``[size, size]`` operator of a 1D Gaussian blur with reflect padding.

    torchvision kernel construction + reflect pad (reference
    ``lp_utils.py:40-47`` semantics). ``sigma == 0`` → identity.
    """
    if sigma == 0:
        return np.eye(size, dtype=np.float32)
    kernel = gaussian_kernel_1d(kernel_size, sigma)
    pad = kernel_size // 2
    m = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        for t in range(kernel_size):
            j = _reflect_index(i + t - pad, size)
            m[i, j] += kernel[t]
    return m


def filter_matrices(
    filter_type: str,
    height: int,
    width: int,
    blur_sigma: float = 0.0,
    blur_kernel_size=3,
    resize_factor: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Row/column operators ``(M_h [H,H], M_w [W,W])`` for one filter config.

    No-op configs (reference early exits, ``lp_utils.py:22-28``) yield
    identity matrices. The Gaussian kernel size is resolved from H for both
    dims, matching ``lp_utils.py:41-47``.
    """
    if filter_type == "none":
        return np.eye(height, dtype=np.float32), np.eye(width, dtype=np.float32)
    if filter_type == "down_up":
        return down_up_matrix(height, resize_factor), down_up_matrix(width, resize_factor)
    if filter_type == "gaussian_blur":
        if blur_sigma == 0:
            return np.eye(height, dtype=np.float32), np.eye(width, dtype=np.float32)
        kernel_val = resolve_kernel_size(blur_kernel_size, height)
        return (
            gaussian_blur_matrix(height, kernel_val, blur_sigma),
            gaussian_blur_matrix(width, kernel_val, blur_sigma),
        )
    raise ValueError(f"Unknown filter_type: {filter_type!r}")


def apply_filter_matrices(x: jnp.ndarray, m_h: jnp.ndarray, m_w: jnp.ndarray) -> jnp.ndarray:
    """Apply separable spatial operators to the trailing (H, W) dims.

    ``y[..., a, b] = sum_{h,w} m_h[a,h] * x[..., h, w] * m_w[b,w]`` — two
    MXU matmuls. Accumulates in fp32, returns the input dtype.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = jnp.einsum(
        "ah,...hw,bw->...ab",
        m_h.astype(jnp.float32),
        xf,
        m_w.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.astype(orig_dtype)
