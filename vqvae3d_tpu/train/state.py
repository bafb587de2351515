"""Train state: params + optimizer + functional quantizer EMA state.

The reference relies on torch buffers riding the module for the quantizer's
EMA accumulators (vqvae/layers.py:614-623) and Lightning for Adam(amsgrad)
(vqvae/model.py:91-93). Here everything is an explicit pytree, so the whole
train step jits and shards as one program and Orbax checkpoints it
atomically.
"""
from __future__ import annotations

from typing import Any

import jax
import optax
from flax import core
from flax import struct
from flax.training import train_state


class VQVAETrainState(train_state.TrainState):
    """TrainState + the ``quantizer`` variable collection (EMA codebooks)."""

    quantizer: core.FrozenDict[str, Any] = struct.field(pytree_node=True, default=None)


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with AMSGrad, torch defaults (b1=.9, b2=.999, eps=1e-8) —
    vqvae/model.py:92.

    Wrapped in optax.flatten: the model has thousands of tiny conv kernels
    and Fixup scalars (205 blocks × ~10 params), and per-leaf optimizer ops
    dominate the step on TPU (profiled: ~2 s/step of sub-millisecond padded
    VPU fusions + per-param DMA at 512-res). Flattening runs one fused
    update over a single concatenated vector.
    """
    return optax.flatten(optax.amsgrad(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8))


def create_vqvae_train_state(model, rng, sample_input, lr: float | None = None):
    """Initialize variables and build the train state.

    sample_input: a (B, H, W, D, C) array (can be jnp.zeros on any backend;
    init is shape-driven).
    """
    # jit the init: un-jitted tracing executes hundreds of conv inits
    # op-by-op (catastrophic under remote-compile backends)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, sample_input, train=False
    )
    params = variables["params"]
    quantizer = variables["quantizer"]
    if lr is None:
        lr = model.config.base_lr
    return VQVAETrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(lr),
        quantizer=quantizer,
    )
