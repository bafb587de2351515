"""Shared helpers for the autoregressive priors.

JAX equivalents of /root/reference/pixel_model/train_helpers.py:
``bits_per_dim`` (:10), one-hot encoding (:14), mixup with a
derangement permutation (:20-55, Sattolo's algorithm) and the mixed
criterion (:58-63); plus the PixelSNAIL coordinate background
(pixelsnail.py:283-293).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bits_per_dim(mean_nll: jax.Array) -> jax.Array:
    """Natural-log NLL → bits/dim."""
    return mean_nll / jnp.log(2.0)


def idx_to_one_hot(data: jax.Array, num_classes: int, dtype=jnp.float32) -> jax.Array:
    """(..., ) int grid → (..., num_classes) one-hot, channels-last."""
    return jax.nn.one_hot(data, num_classes, dtype=dtype)


def sattolo_cycle(key, batch_size: int) -> jax.Array:
    """Random cyclic permutation (derangement) — Sattolo's algorithm with
    jittable fixed-trip loop (reference train_helpers.py:22-37)."""
    if batch_size < 2:
        return jnp.zeros((batch_size,), jnp.int32)

    def body(i, carry):
        out, key = carry
        # iteration i corresponds to reference's i from B-1 down to 1
        idx = batch_size - 1 - i
        key, sub = jax.random.split(key)
        j = jax.random.randint(sub, (), 0, idx)  # 0 <= j <= idx-1
        vi, vj = out[idx], out[j]
        out = out.at[idx].set(vj).at[j].set(vi)
        return out, key

    out = jnp.arange(batch_size, dtype=jnp.int32)
    out, _ = jax.lax.fori_loop(0, batch_size - 1, body, (out, key))
    return out


def mixup_data(
    key,
    x: jax.Array,
    y: jax.Array,
    alpha: float,
    condition: Optional[jax.Array] = None,
):
    """Mixup over the batch with a derangement pairing.

    Returns (mixed_x, mixed_condition, (y_a, y_b), lam).
    """
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha, dtype=x.dtype)
    index = sattolo_cycle(k_perm, x.shape[0])
    mixed_x = lam * x + (1 - lam) * x[index]
    mixed_condition = (
        lam * condition + (1 - lam) * condition[index]
        if condition is not None
        else None
    )
    return mixed_x, mixed_condition, (y, y[index]), lam


def mixup_cross_entropy(logits, targets, lam):
    """lam·CE(y_a) + (1−lam)·CE(y_b); logits channels-last."""
    y_a, y_b = targets
    return lam * cross_entropy(logits, y_a) + (1 - lam) * cross_entropy(
        logits, y_b
    )


@jax.custom_vjp
def cross_entropy(logits, targets):
    """Per-voxel NLL, fused form (reference train.py criterion:
    F.cross_entropy per voxel).

    Mathematically identical to ``-log_softmax(logits)[target]`` but
    computed as ``logsumexp(logits) - logits[target]`` with a custom
    VJP: the full-lane fp32 log-prob volume (268 MB at the top-prior
    grid) never materializes in forward OR backward — the profiled
    fp32 log_softmax/sub, its 268 MB backward fusion, and the
    gather-jvp were the dominant non-kernel compute of the top-prior
    step. The backward emits ``g·(softmax − onehot)`` as one
    elementwise fusion using an iota-compare for the one-hot (no
    scatter — scatters serialize on TPU).

    Oracle-tested against ``log_softmax`` + ``take_along_axis`` (value
    and gradient, fp32 and bf16 logits, plain and mixup paths) in
    ``tests/test_prior_folded_loss.py``.

    Note: ``jax.custom_vjp`` makes this function reverse-mode-only —
    forward-mode AD (``jax.jvp``) and higher-order differentiation
    through it raise at trace time. Training is first-order
    reverse-mode, so no current caller is affected.
    """
    return _ce_fwd(logits, targets)[0]


def _ce_stats(logits, targets):
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(lf - m[..., None]), axis=-1))
    # target logit via iota-compare masked reduce, NOT take_along_axis:
    # a gather over the T(8,128)-tiled fp32 logits volume is
    # scalar-addressed on TPU and profiled 8 ms/step at the top-prior
    # grid; the masked lane-reduce streams the same bytes at vector
    # speed and fuses with the logsumexp passes.
    # iota in int32 with targets cast up: building the iota in
    # targets.dtype would silently wrap for narrow int targets when
    # input_dim exceeds their range (ADVICE r4).
    onehot = targets[..., None].astype(jnp.int32) == jnp.arange(
        logits.shape[-1], dtype=jnp.int32
    )
    tl = jnp.sum(jnp.where(onehot, lf, 0.0), axis=-1)
    return lse - tl, lse


def _ce_fwd(logits, targets):
    out, lse = _ce_stats(logits, targets)
    return out, (logits, targets, lse)


def _ce_bwd(res, g):
    logits, targets, lse = res
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    onehot = (
        targets[..., None].astype(jnp.int32)
        == jnp.arange(logits.shape[-1], dtype=jnp.int32)
    ).astype(jnp.float32)
    dlogits = (g[..., None] * (p - onehot)).astype(logits.dtype)
    return dlogits, np.zeros(targets.shape, dtype=jax.dtypes.float0)


cross_entropy.defvjp(_ce_fwd, _ce_bwd)


def generate_background(batch: int, dims: Tuple[int, int, int]) -> jax.Array:
    """3-channel normalized coordinate grid (B, s0, s1, s2, 3) —
    PixelSNAIL's positional background (reference pixelsnail.py:283-293)."""
    s0, s1, s2 = dims
    c0 = jnp.linspace(-1, 1, s0)[:, None, None]
    c1 = jnp.linspace(-1, 1, s1)[None, :, None]
    c2 = jnp.linspace(-1, 1, s2)[None, None, :]
    grid = jnp.stack(
        [
            jnp.broadcast_to(c0, dims),
            jnp.broadcast_to(c1, dims),
            jnp.broadcast_to(c2, dims),
        ],
        axis=-1,
    )
    return jnp.broadcast_to(grid[None], (batch, *dims, 3))
