"""Low-pass filters — eager JAX counterparts of the reference ALG filters.

Behavior spec: reference ``lp_utils.py:8-60`` (``apply_low_pass_filter``).
Semantics reproduced exactly:
  * ``filter_type`` in {"none", "down_up", "gaussian_blur"} with no-op early
    exits for ``none``, ``down_up`` @ resize_factor==1.0, and ``gaussian_blur``
    @ sigma==0 (``lp_utils.py:22-28``).
  * 5D ``[B, C, F, H, W]`` inputs are filtered spatially per frame
    (``lp_utils.py:30-37``) — here the spatial ops broadcast over leading dims
    so no reshape is needed.
  * ``gaussian_blur``: float kernel size is relative to H (``max(int(ks*H),1)``),
    forced odd (``lp_utils.py:41-46``); torchvision kernel construction
    (linspace over ±(ks-1)/2, normalized Gaussian pdf) with reflect padding.
  * ``down_up``: bilinear resize to ``max(1, round(d*f))`` and back, half-pixel
    centers (align_corners=False), antialiased both directions
    (``lp_utils.py:49-54``). ``jax.image.resize(method="linear",
    antialias=True)`` is numerically identical to torch's implementation
    (verified < 1e-6 max abs err on fp32).

These eager functions are used for tests and one-off filtering; the hot path
inside the jit-compiled denoise loop uses the precomputed linear-operator form
in :mod:`alg_tpu.alg.matrices` (bitwise-equivalent up to fp32 matmul rounding).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> np.ndarray:
    """Normalized 1D Gaussian kernel, torchvision construction.

    ``x = linspace(-(ks-1)/2, (ks-1)/2, ks); pdf = exp(-0.5*(x/sigma)^2)``
    normalized to sum 1 (torchvision ``_get_gaussian_kernel1d``).
    """
    ksize_half = (kernel_size - 1) * 0.5
    x = np.linspace(-ksize_half, ksize_half, kernel_size, dtype=np.float32)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def resolve_kernel_size(blur_kernel_size, height: int) -> int:
    """Kernel-size coercion: float → relative to H; forced odd.

    Reference ``lp_utils.py:41-46``.
    """
    if isinstance(blur_kernel_size, float):
        kernel_val = max(int(blur_kernel_size * height), 1)
    else:
        kernel_val = int(blur_kernel_size)
    if kernel_val % 2 == 0:
        kernel_val += 1
    return kernel_val


def _reflect_pad_spatial(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(x, pad, mode="reflect")


def _separable_blur(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Depthwise separable Gaussian blur over the trailing (H, W) dims."""
    k = kernel.shape[0]
    pad = k // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xp = _reflect_pad_spatial(x, pad, pad)
    xp = xp.reshape((-1, 1) + xp.shape[-2:])  # [N, 1, H+2p, W+2p]
    kh = jnp.asarray(kernel, x.dtype).reshape(1, 1, k, 1)
    kw = jnp.asarray(kernel, x.dtype).reshape(1, 1, 1, k)
    dn = jax.lax.conv_dimension_numbers(xp.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    hi = jax.lax.Precision.HIGHEST
    y = jax.lax.conv_general_dilated(xp, kh, (1, 1), "VALID", dimension_numbers=dn, precision=hi)
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID", dimension_numbers=dn, precision=hi)
    return y.reshape(lead + (h, w))


def _down_up(x: jnp.ndarray, resize_factor: float) -> jnp.ndarray:
    h0, w0 = x.shape[-2:]
    h1 = max(1, int(round(h0 * resize_factor)))
    w1 = max(1, int(round(w0 * resize_factor)))
    down_shape = x.shape[:-2] + (h1, w1)
    y = jax.image.resize(x, down_shape, method="linear", antialias=True)
    return jax.image.resize(y, x.shape, method="linear", antialias=True)


def apply_low_pass_filter(
    tensor: jnp.ndarray,
    filter_type: str,
    blur_sigma: float = 0.0,
    blur_kernel_size=3,
    resize_factor: float = 1.0,
) -> jnp.ndarray:
    """Apply the selected low-pass filter to the trailing (H, W) dims.

    Mirrors reference ``lp_utils.py:8-60`` for 4D ``[B,C,H,W]`` and 5D
    ``[B,C,F,H,W]`` inputs (any leading dims accepted). All filter parameters
    are static Python values — this function is meant for eager/pixel-space
    use; the in-loop path uses :func:`alg_tpu.alg.matrices.apply_filter_matrices`.
    """
    if filter_type == "none":
        return tensor
    if filter_type == "down_up" and resize_factor == 1.0:
        return tensor
    if filter_type == "gaussian_blur" and blur_sigma == 0:
        return tensor

    if filter_type == "gaussian_blur":
        h = tensor.shape[-2]
        kernel_val = resolve_kernel_size(blur_kernel_size, h)
        kernel = gaussian_kernel_1d(kernel_val, blur_sigma)
        return _separable_blur(tensor, kernel)
    elif filter_type == "down_up":
        return _down_up(tensor, resize_factor)
    else:
        raise ValueError(f"Unknown filter_type: {filter_type!r}")
