"""Parity tests: alg_tpu filters vs a torch re-implementation of the reference.

The torch helpers below re-implement the exact math of reference
``lp_utils.py:8-60`` (torchvision gaussian_blur formula + F.interpolate
bilinear/antialias) so parity is checked against the true reference semantics
without needing torchvision.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from alg_tpu.alg.filters import apply_low_pass_filter, gaussian_kernel_1d, resolve_kernel_size
from alg_tpu.alg.matrices import (
    apply_filter_matrices,
    down_up_matrix,
    filter_matrices,
    gaussian_blur_matrix,
)

pytestmark = pytest.mark.fast


def torch_gaussian_blur(x: torch.Tensor, kernel_size: int, sigma: float) -> torch.Tensor:
    """torchvision.transforms.functional.gaussian_blur math (reflect pad, separable)."""
    ksize_half = (kernel_size - 1) * 0.5
    grid = torch.linspace(-ksize_half, ksize_half, steps=kernel_size)
    pdf = torch.exp(-0.5 * (grid / sigma) ** 2)
    k1d = (pdf / pdf.sum()).to(x.dtype)
    c = x.shape[-3]
    kx = k1d.view(1, 1, 1, kernel_size).expand(c, 1, 1, kernel_size)
    ky = k1d.view(1, 1, kernel_size, 1).expand(c, 1, kernel_size, 1)
    pad = kernel_size // 2
    xp = F.pad(x, [pad, pad, pad, pad], mode="reflect")
    y = F.conv2d(xp, kx, groups=c)
    y = F.conv2d(y, ky, groups=c)
    return y


def torch_lowpass(x: torch.Tensor, filter_type: str, blur_sigma=0.0, blur_kernel_size=3, resize_factor=1.0):
    """Reference apply_low_pass_filter (lp_utils.py:8-60) on 4D/5D tensors."""
    if filter_type == "none":
        return x
    if filter_type == "down_up" and resize_factor == 1.0:
        return x
    if filter_type == "gaussian_blur" and blur_sigma == 0:
        return x
    is_5d = x.ndim == 5
    if is_5d:
        # exact reference behavior: raw .view, not a permute (lp_utils.py:30-35);
        # functionally equivalent to per-(H,W)-slice filtering
        b, c, k, h, w = x.shape
        x = x.contiguous().view(b * k, c, h, w)
    if filter_type == "gaussian_blur":
        h0 = x.shape[-2]
        kernel_val = resolve_kernel_size(blur_kernel_size, h0)
        x = torch_gaussian_blur(x, kernel_val, blur_sigma)
    elif filter_type == "down_up":
        h0, w0 = x.shape[-2:]
        h1 = max(1, int(round(h0 * resize_factor)))
        w1 = max(1, int(round(w0 * resize_factor)))
        x = F.interpolate(x, size=(h1, w1), mode="bilinear", align_corners=False, antialias=True)
        x = F.interpolate(x, size=(h0, w0), mode="bilinear", align_corners=False, antialias=True)
    if is_5d:
        x = x.view(b, c, k, h, w)
    return x


@pytest.mark.parametrize("factor", [0.25, 0.4, 0.625, 0.9])
def test_down_up_matches_torch_4d(rng, factor):
    x = rng.randn(2, 3, 15, 21).astype(np.float32)
    ours = np.asarray(apply_low_pass_filter(jnp.asarray(x), "down_up", resize_factor=factor))
    ref = torch_lowpass(torch.from_numpy(x), "down_up", resize_factor=factor).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_down_up_matches_torch_5d(rng):
    # reference flattens [B,C,F,H,W] frames into batch; spatial result must match per frame
    x = rng.randn(1, 4, 3, 12, 16).astype(np.float32)
    ours = np.asarray(apply_low_pass_filter(jnp.asarray(x), "down_up", resize_factor=0.5))
    ref = torch_lowpass(torch.from_numpy(x), "down_up", resize_factor=0.5).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.parametrize("sigma,ks", [(1.5, 5), (2.0, 0.3), (0.7, 4)])
def test_gaussian_blur_matches_torch(rng, sigma, ks):
    x = rng.randn(2, 3, 17, 19).astype(np.float32)
    ours = np.asarray(
        apply_low_pass_filter(jnp.asarray(x), "gaussian_blur", blur_sigma=sigma, blur_kernel_size=ks)
    )
    ref = torch_lowpass(torch.from_numpy(x), "gaussian_blur", blur_sigma=sigma, blur_kernel_size=ks).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_noop_early_exits(rng):
    x = rng.randn(1, 2, 8, 8).astype(np.float32)
    j = jnp.asarray(x)
    assert apply_low_pass_filter(j, "none") is j
    assert apply_low_pass_filter(j, "down_up", resize_factor=1.0) is j
    assert apply_low_pass_filter(j, "gaussian_blur", blur_sigma=0) is j


def test_kernel_size_coercion():
    # float → relative to H; even → odd (lp_utils.py:41-46)
    assert resolve_kernel_size(0.25, 16) == 5  # int(4) → odd 5
    assert resolve_kernel_size(0.1, 5) == 1  # max(int(0.5),1)=1
    assert resolve_kernel_size(4, 100) == 5
    assert resolve_kernel_size(7, 100) == 7


def test_gaussian_kernel_matches_torchvision_formula():
    k = gaussian_kernel_1d(5, 1.3)
    half = 2.0
    x = np.linspace(-half, half, 5)
    pdf = np.exp(-0.5 * (x / 1.3) ** 2)
    np.testing.assert_allclose(k, pdf / pdf.sum(), rtol=1e-6)
    assert abs(k.sum() - 1.0) < 1e-6


# ---- linear-operator (matrix) form ----


@pytest.mark.parametrize("factor", [0.25, 0.4, 0.625])
def test_matrix_down_up_equals_direct(rng, factor):
    x = rng.randn(2, 3, 13, 18).astype(np.float32)
    direct = np.asarray(apply_low_pass_filter(jnp.asarray(x), "down_up", resize_factor=factor))
    mh = down_up_matrix(13, factor)
    mw = down_up_matrix(18, factor)
    via_matrix = np.asarray(apply_filter_matrices(jnp.asarray(x), jnp.asarray(mh), jnp.asarray(mw)))
    np.testing.assert_allclose(via_matrix, direct, atol=3e-6)


def test_matrix_gaussian_equals_direct(rng):
    x = rng.randn(1, 2, 14, 14).astype(np.float32)
    direct = np.asarray(
        apply_low_pass_filter(jnp.asarray(x), "gaussian_blur", blur_sigma=1.2, blur_kernel_size=5)
    )
    mh = gaussian_blur_matrix(14, 5, 1.2)
    via_matrix = np.asarray(apply_filter_matrices(jnp.asarray(x), jnp.asarray(mh), jnp.asarray(mh)))
    np.testing.assert_allclose(via_matrix, direct, atol=3e-6)


def test_filter_matrices_noop_is_identity():
    mh, mw = filter_matrices("none", 7, 9)
    np.testing.assert_array_equal(mh, np.eye(7, dtype=np.float32))
    np.testing.assert_array_equal(mw, np.eye(9, dtype=np.float32))
    mh, mw = filter_matrices("down_up", 7, 9, resize_factor=1.0)
    np.testing.assert_array_equal(mh, np.eye(7, dtype=np.float32))
    mh, mw = filter_matrices("gaussian_blur", 7, 9, blur_sigma=0.0)
    np.testing.assert_array_equal(mh, np.eye(7, dtype=np.float32))


def test_blur_matrix_rows_sum_to_one():
    m = gaussian_blur_matrix(16, 7, 2.0)
    np.testing.assert_allclose(m.sum(axis=1), np.ones(16), atol=1e-6)
