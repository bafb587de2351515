"""Baur-style reconstruction/anomaly loss (JAX).

Re-implements /root/reference/metrics/baur.py: per-sample L1 + L2 distances
over flattened volumes, an (disabled by default, lambda_gdl=0, baur.py:12)
gradient-difference loss over the three image-gradient directions, plus the
summed quantization losses. Channels-last (B, H, W, D, C).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _image_gradients(image: jax.Array):
    """Forward differences along the three spatial axes, zero-padded at the
    trailing edge (reference baur.py:55-84)."""
    grads = []
    for axis in (1, 2, 3):
        d = jnp.diff(image, axis=axis)
        pad = [(0, 0)] * image.ndim
        pad[axis] = (0, 1)
        grads.append(jnp.pad(d, pad))
    return grads


def _pairwise_distance(x: jax.Array, y: jax.Array, p: int) -> jax.Array:
    """Sum over batch of per-sample p-norm distances of flattened volumes
    (torch nn.PairwiseDistance semantics, eps=1e-6)."""
    b = x.shape[0]
    diff = jnp.abs(x.reshape(b, -1) - y.reshape(b, -1)) + 1e-6
    if p == 1:
        return jnp.sum(diff)
    return jnp.sum(jnp.sqrt(jnp.sum(diff**2, axis=1)))


def baur_loss_3d(
    recon: jax.Array,
    target: jax.Array,
    quantization_losses: Sequence[jax.Array],
    lambda_reconstruction: float = 1.0,
    lambda_gdl: float = 0.0,
) -> jax.Array:
    recon = recon.astype(jnp.float32)
    target = target.astype(jnp.float32)

    l1 = _pairwise_distance(target, recon, p=1) * lambda_reconstruction
    l2 = _pairwise_distance(target, recon, p=2) * lambda_reconstruction

    gdl = 0.0
    if lambda_gdl:
        g_t = _image_gradients(target)
        g_r = _image_gradients(recon)
        l1_gdl = sum(_pairwise_distance(a, b, p=1) for a, b in zip(g_t, g_r))
        l2_gdl = sum(_pairwise_distance(a, b, p=2) for a, b in zip(g_t, g_r))
        gdl = (l1_gdl + l2_gdl) * lambda_gdl

    q = sum(jnp.asarray(l) for l in quantization_losses)
    return l1 + l2 + gdl + q
