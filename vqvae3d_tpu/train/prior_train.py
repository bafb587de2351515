"""Stage-2 (prior) loss and jitted/sharded train + eval steps.

Reproduces /root/reference/pixel_model/pixelcnn.py:102-148 (and the
identical pixelsnail.py:112-161 path):

  * data → one-hot; condition → one-hot of the coarser grid, trilinearly
    upsampled to the data resolution (:116-119),
  * optional mixup over the batch with a Sattolo-derangement pairing and
    Beta(alpha, alpha) lambda (:127-129, train_helpers.py:20-63),
  * per-voxel cross-entropy (mean), bits/dim, accuracy (val).

Both priors share this module — the model is any flax module with signature
``apply(variables, data_onehot, condition, train, rngs)`` → logits.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from vqvae3d_tpu.models.prior_utils import (
    bits_per_dim,
    cross_entropy,
    idx_to_one_hot,
    mixup_cross_entropy,
    mixup_data,
)
from vqvae3d_tpu.parallel.mesh import batch_sharding, replicated_sharding


class PriorTrainState(train_state.TrainState):
    pass


def create_prior_train_state(model, rng, sample_batch: Dict, lr: float | None = None):
    """sample_batch: {'data': (B, s0, s1, s2) int, 'condition': optional}."""
    cfg = model.config
    data = idx_to_one_hot(jnp.asarray(sample_batch["data"]), cfg.input_dim)
    cond = None
    if cfg.use_conditioning:
        cond = _prep_condition(
            jnp.asarray(sample_batch["condition"]), cfg.condition_dim, data.shape[1:4]
        )
    params_rng, dropout_rng = jax.random.split(rng)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": params_rng, "dropout": dropout_rng}, data, cond, train=False
    )
    if lr is None:
        lr = cfg.lr
    from vqvae3d_tpu.train.state import make_optimizer

    tx = make_optimizer(lr)
    return PriorTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def _prep_condition(condition_idx, condition_dim: int, dims) -> jax.Array:
    """int coarser grid → one-hot. The trilinear upsample to the data dims
    (reference pixelcnn.py:116-119) happens INSIDE the model, after the
    1x1 embedding — exactly equivalent (the embedding is affine and
    trilinear interpolation preserves constants) and ~condition_dim/
    model_dim times less resize traffic. The models upsample the one-hot
    first when handed a full-resolution condition, so both call
    conventions work."""
    del dims
    return idx_to_one_hot(condition_idx, condition_dim)


def _fold_voxelwise(t: jax.Array) -> jax.Array:
    """(B, s0, s1, s2) voxel map → its 2x block-space layout
    (B, s0/2, s1/2, s2/2, 8), phase order matching space_to_depth lanes."""
    from vqvae3d_tpu.ops.resize import space_to_depth

    return space_to_depth(t[..., None], 2)


def prior_loss_fn(
    model,
    params,
    batch: Dict[str, jax.Array],
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
):
    cfg = model.config
    data_idx = batch["data"]
    dims = data_idx.shape[1:4]

    target = data_idx
    # one-hot straight in the model's compute dtype (the model casts
    # before its first matmul anyway — 0/1 are exact in bf16), halving
    # the full-res one-hot's HBM traffic; mixup keeps fp32 so the
    # lam-mixing happens at full precision (reference train_helpers.py
    # mixes fp32 one-hots).
    mixup_active = cfg.mixup_alpha != 0 and train
    oh_dtype = jnp.float32 if mixup_active else cfg.dtype
    model_input = idx_to_one_hot(data_idx, cfg.input_dim, dtype=oh_dtype)
    condition = None
    if cfg.use_conditioning:
        condition = _prep_condition(batch["condition"], cfg.condition_dim, dims)

    loss_per_voxel_fn = cross_entropy
    targets = target
    if mixup_active:
        rng, mix_rng = jax.random.split(rng)
        model_input, condition, targets, lam = mixup_data(
            mix_rng, model_input, target, cfg.mixup_alpha, condition
        )
        loss_per_voxel_fn = lambda lo, t: mixup_cross_entropy(lo, t, lam)  # noqa: E731

    rngs = {"dropout": rng} if (train and rng is not None) else None
    logits = model.apply(
        {"params": params},
        model_input,
        condition,
        train=train,
        rngs=rngs,
        folded_logits=True,
    )

    eval_idx = data_idx
    if logits.shape[1:4] != data_idx.shape[1:4]:
        # the model kept its block-space layout: (B, s/2³, 8*K), lane
        # order (phase, class). The loss is voxel-pointwise, so it
        # computes EXACTLY in this layout — fold the targets instead of
        # unfolding a full-resolution input_dim-wide logits volume.
        logits = logits.reshape(*logits.shape[:4], 8, cfg.input_dim)
        targets = jax.tree_util.tree_map(_fold_voxelwise, targets)
        eval_idx = _fold_voxelwise(data_idx)

    unreduced = loss_per_voxel_fn(logits, targets)
    loss = jnp.mean(unreduced)

    log = {
        "loss_min": jnp.min(unreduced),
        "loss_max": jnp.max(unreduced),
        "loss_mean": loss,
        "loss_std": jnp.std(unreduced),
        "bits_per_dim": bits_per_dim(loss),
    }
    if not train:
        pred = jnp.argmax(logits, axis=-1)
        log["accuracy"] = jnp.mean((pred == eval_idx).astype(jnp.float32))
    return loss, log


def make_prior_train_step(model, mesh=None, donate: bool = True):
    def train_step(state: PriorTrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return prior_loss_fn(model, params, batch, train=True, rng=step_rng)

        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), log

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)

    repl = replicated_sharding(mesh)
    batch_shard = {"data": batch_sharding(mesh, ndim=4)}
    if model.config.use_conditioning:
        batch_shard["condition"] = batch_sharding(mesh, ndim=4)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate_argnums,
    )


def make_prior_eval_step(model, mesh=None):
    def eval_step(state: PriorTrainState, batch):
        _, log = prior_loss_fn(model, state.params, batch, train=False)
        return log

    if mesh is None:
        return jax.jit(eval_step)

    repl = replicated_sharding(mesh)
    batch_shard = {"data": batch_sharding(mesh, ndim=4)}
    if model.config.use_conditioning:
        batch_shard["condition"] = batch_sharding(mesh, ndim=4)
    return jax.jit(
        eval_step, in_shardings=(repl, batch_shard), out_shardings=repl
    )
