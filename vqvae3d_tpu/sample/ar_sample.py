"""Ancestral (autoregressive) sampling of code grids on TPU.

The reference samples with a Python loop over voxels, re-running the model
on a *growing prefix slice* each step — every prefix size is a new shape,
so it recompiles constantly and still pays O(V²) compute
(pixel_model/pixelcnn.py:260-283). TPU-native redesign: one
``lax.fori_loop`` over raster positions with FIXED shapes — the model is
traced and compiled exactly once; each iteration runs a full-grid forward
(causality guarantees un-sampled positions cannot influence the current
logit) and writes one voxel. Still O(V²) compute but zero recompilation;
per-layer incremental caching is the next optimization stage.

Sampling function: the reference uses hard gumbel-softmax with temperature
tau (sample_embeddings.py:126-127). Note hard gumbel-softmax's argmax is
invariant to tau — the reference's tau never changed the sampled class; we
implement true temperature sampling (categorical over logits/tau), which
subsumes the reference behavior at tau=1 and makes tau meaningful. The
reference's "retry while argmax==0" hack (pixelcnn.py:277-282) is a
workaround for its own -1-filled inputs; with causally-sound inputs it is
unnecessary and not replicated.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqvae3d_tpu.models.prior_utils import idx_to_one_hot
from vqvae3d_tpu.ops.resize import trilinear_resize


def ancestral_sample(
    model,
    params,
    rng: jax.Array,
    dims: Tuple[int, int, int],
    batch_size: int,
    condition_idx: Optional[jax.Array] = None,
    tau: float = 1.0,
) -> jax.Array:
    """Sample (batch_size, *dims) int32 code grids from a prior.

    condition_idx: (batch_size, *coarser_dims) int grid of the next-coarser
    level, or None for the unconditional (coarsest) prior.
    """
    cfg = model.config
    k = cfg.input_dim
    v_total = math.prod(dims)

    condition = None
    if cfg.use_conditioning:
        assert condition_idx is not None
        one_hot = idx_to_one_hot(condition_idx, cfg.condition_dim)
        condition = trilinear_resize(one_hot, dims)
    else:
        assert condition_idx is None

    result0 = jnp.zeros((batch_size, *dims, k), jnp.float32)

    def body(v, carry):
        result, rng = carry
        logits = model.apply({"params": params}, result, condition, train=False)
        flat = logits.reshape(batch_size, v_total, k)
        logit_v = jax.lax.dynamic_index_in_dim(flat, v, axis=1, keepdims=False)
        rng, sub = jax.random.split(rng)
        sampled = jax.random.categorical(sub, logit_v / tau, axis=-1)  # (B,)
        one_hot = jax.nn.one_hot(sampled, k, dtype=result.dtype)
        result = (
            result.reshape(batch_size, v_total, k)
            .at[:, v]
            .set(one_hot)
            .reshape(result.shape)
        )
        return result, rng

    result, _ = jax.lax.fori_loop(0, v_total, body, (result0, rng))
    return jnp.argmax(result, axis=-1).astype(jnp.int32)


def make_ancestral_sampler(
    model, dims: Tuple[int, int, int], batch_size: int, tau: float = 1.0
):
    """Jitted sampler: (params, rng[, condition_idx]) → (B, *dims) int32.
    Compiled once per (dims, batch_size) — no per-prefix recompiles."""

    if model.config.use_conditioning:

        @jax.jit
        def sampler(params, rng, condition_idx):
            return ancestral_sample(
                model, params, rng, dims, batch_size, condition_idx, tau
            )

    else:

        @jax.jit
        def sampler(params, rng):
            return ancestral_sample(model, params, rng, dims, batch_size, None, tau)

    return sampler
