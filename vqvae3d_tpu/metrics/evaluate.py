"""Reconstruction quality metrics (NMSE, PSNR, slice-wise 3D SSIM).

JAX re-implementation of /root/reference/metrics/evaluate.py:
  * ``nmse`` (:18-20), ``psnr`` (:23-24),
  * ``ssim3d_slices`` (:27-36) — 3D SSIM as the mean 2D SSIM over depth
    slices, with the 2D SSIM matching pytorch-lightning 1.2's functional
    ssim (gaussian 11×11 window, sigma 1.5, k1=0.01, k2=0.03).

Volumes are channels-last (B, H, W, D, C); the depth axis (slices) is the
last spatial axis, matching the reference's 'b c h w d → (b d) c h w'.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def nmse(orig: jax.Array, pred: jax.Array) -> jax.Array:
    """Normalized mean squared error: ||pred − orig||² / ||orig||²."""
    orig = orig.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    return jnp.sum((pred - orig) ** 2) / jnp.sum(orig**2)


def psnr(orig: jax.Array, pred: jax.Array, data_range: float) -> jax.Array:
    orig = orig.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    mse = jnp.mean((pred - orig) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(img: jax.Array, k: np.ndarray) -> jax.Array:
    """Depthwise separable gaussian filter. img: (N, H, W, C), VALID."""
    c = img.shape[-1]
    kh = jnp.asarray(k).reshape(-1, 1, 1, 1)
    kw = jnp.asarray(k).reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        img, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return out


def ssim2d(
    pred: jax.Array,
    target: jax.Array,
    data_range: Optional[float] = None,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM over a batch of 2D images, (N, H, W, C) channels-last."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.max(target) - jnp.min(target)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    k = _gaussian_kernel1d(kernel_size, sigma)
    mu_p = _filter2d_separable(pred, k)
    mu_t = _filter2d_separable(target, k)
    mu_pp = _filter2d_separable(pred * pred, k)
    mu_tt = _filter2d_separable(target * target, k)
    mu_pt = _filter2d_separable(pred * target, k)

    var_p = mu_pp - mu_p**2
    var_t = mu_tt - mu_t**2
    cov = mu_pt - mu_p * mu_t

    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map)


def ssim3d_slices(
    pred: jax.Array, target: jax.Array, data_range: Optional[float] = None, **kw
) -> jax.Array:
    """3D SSIM as mean 2D SSIM over depth slices.

    pred/target: (B, H, W, D, C) → slices (B·D, H, W, C).
    """
    def to_slices(x):
        b, h, w, d, c = x.shape
        return jnp.moveaxis(x, 3, 1).reshape(b * d, h, w, c)

    return ssim2d(to_slices(pred), to_slices(target), data_range=data_range, **kw)
