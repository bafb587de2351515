"""Logistic-mixture likelihood machinery (JAX).

Re-implements /root/reference/metrics/distribution.py: the ``Logistic``
distribution (:10-19), ``mixture_nll_loss`` (:22-50), ``sample_mixture``
(:53-87, incl. the greedy argmax-component mode) and ``generic_nll_loss``
(:90-101). The reference wires these into the VQ-VAE imports but ships the
huber loss; they are provided for parity and for experimentation with
discretized-logistic heads.

Convention: the mixture-component axis is the CHANNEL axis (axis 1 in the
reference's NCDHW; here, the last axis after ``_fix_mixture_shapes``-style
permutation is handled by the caller simply passing component-last arrays).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic_log_prob(x: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """log pdf of Logistic(loc, scale) at x (elementwise)."""
    z = (x - loc) / scale
    # log pdf = -z - 2*softplus(-z) - log(scale)
    return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(scale)


def logistic_sample(key, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """Sample via inverse sigmoid of a uniform (the reference's
    TransformedDistribution construction)."""
    u = jax.random.uniform(key, loc.shape, loc.dtype, 1e-6, 1.0 - 1e-6)
    return loc + scale * (jnp.log(u) - jnp.log1p(-u))


def mixture_nll_loss(
    x: jax.Array,
    mixture_comp_logits: jax.Array,
    loc: jax.Array,
    scale: jax.Array,
    reduce_sum: bool = True,
) -> jax.Array:
    """NLL of x under a logistic mixture.

    x: (...,); mixture_comp_logits/loc/scale: (..., n_mix) — component-last.
    """
    log_pi = jax.nn.log_softmax(mixture_comp_logits, axis=-1)
    log_prob = logistic_log_prob(x[..., None], loc, scale)
    nll = -jax.scipy.special.logsumexp(log_pi + log_prob, axis=-1)
    return jnp.sum(nll) if reduce_sum else nll


def sample_mixture(
    key,
    mixture_comp_logits: jax.Array,
    loc: jax.Array,
    scale: jax.Array,
    greedy: bool = True,
) -> jax.Array:
    """Sample from the mixture; greedy picks the argmax component
    (reference :66-74), else a categorical draw."""
    k_comp, k_base = jax.random.split(key)
    if greedy:
        comp = jnp.argmax(mixture_comp_logits, axis=-1)
    else:
        comp = jax.random.categorical(k_comp, mixture_comp_logits, axis=-1)
    loc_sel = jnp.take_along_axis(loc, comp[..., None], axis=-1)[..., 0]
    scale_sel = jnp.take_along_axis(scale, comp[..., None], axis=-1)[..., 0]
    return logistic_sample(k_base, loc_sel, scale_sel)


def generic_nll_loss(
    x: jax.Array,
    log_prob_fn,
    reduce_sum: bool = True,
    **dist_kwargs,
) -> jax.Array:
    """-log p(x) under an arbitrary log_prob function (reference :90-101)."""
    nll = -log_prob_fn(x, **dist_kwargs)
    return jnp.sum(nll) if reduce_sum else nll
