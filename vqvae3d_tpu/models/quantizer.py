"""EMA vector quantizer — functional state, fp32-pinned, mesh-aware.

Mirrors the semantics of /root/reference/vqvae/layers.py:602-728:

  * nearest-code lookup by exact fp32 L2 argmin (reference :700-702 disables
    matmul for accuracy; here: fp32 MXU accumulation / Pallas kernel —
    vqvae3d_tpu.ops.quantizer_ops),
  * EMA codebook update with Laplace smoothing (:636-663),
  * data-dependent first-pass init of the codebook from batch statistics
    under ``lax.cond`` (:665-683),
  * commitment loss ``0.1 * mse(quantized, inputs)`` (:716-717),
  * straight-through estimator (:720).

Distributed semantics: the reference hand-all-reduces cluster counts, dw and
init stats over DDP ranks (:645-647, :670-676). Here the train step is jitted
over a ``jax.sharding.Mesh`` with the batch sharded on the 'data' axis; the
batch-dim reductions below (segment_sum / mean) are *global* reductions that
XLA lowers to ICI collectives — same math, no hand-written comms.

Note one deliberate deviation: the reference averages per-rank stds for the
first-pass init (an approximation); we compute the true global std.

State lives in the linen collection ``"quantizer"`` so it checkpoints with
the params; train steps must pass ``mutable=["quantizer"]``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae3d_tpu.ops.quantizer_ops import l2_argmin


class QuantizerState(NamedTuple):
    """Pure-pytree view of the quantizer EMA state (for functional use)."""

    embed: jax.Array  # (K, D) e_i
    embed_avg: jax.Array  # (K, D) m_i
    cluster_size: jax.Array  # (K,)  N_i
    initialized: jax.Array  # () bool


def init_quantizer_state(key, num_embeddings: int, embedding_dim: int) -> QuantizerState:
    embed = jax.random.normal(key, (num_embeddings, embedding_dim), jnp.float32)
    # embed_avg must be a distinct buffer (not an alias) so state donation in
    # jitted train steps doesn't see the same buffer twice
    return QuantizerState(
        embed=embed,
        embed_avg=jnp.copy(embed),
        cluster_size=jnp.zeros((num_embeddings,), jnp.float32),
        initialized=jnp.zeros((), jnp.bool_),
    )


def ema_first_pass_init(state: QuantizerState, flat: jax.Array) -> QuantizerState:
    """Data-dependent codebook init: embed ← randn·std + mean (global stats)."""
    k = state.embed.shape[0]
    n = flat.shape[0]  # global N under jit+GSPMD
    mean = jnp.mean(flat, axis=0)
    std = jnp.std(flat, axis=0)
    embed = state.embed * std + mean
    return QuantizerState(
        embed=embed,
        embed_avg=embed,
        cluster_size=state.cluster_size + n / k,
        initialized=jnp.ones((), jnp.bool_),
    )


def ema_update(
    state: QuantizerState,
    flat: jax.Array,
    indices: jax.Array,
    decay: float,
    laplace_alpha: float,
) -> QuantizerState:
    """EMA codebook update from (globally reduced) cluster stats."""
    k = state.embed.shape[0]
    # Global-batch cluster sums via a one-hot matmul on the MXU. A
    # segment_sum/scatter formulation is ~50× slower here: TPU scatters with
    # potentially-colliding indices lower to serialized updates (measured
    # 1.1 s/step at N=131k vs ~ms for the matmul). fp32 + HIGHEST keeps the
    # accumulation exact (the reference computes these stats in fp32,
    # layers.py:638-643). Under a sharded batch XLA still inserts the
    # cross-device reduction (the reference's all_reduce pair, :645-647).
    one_hot = jax.nn.one_hot(indices, k, dtype=jnp.float32)  # (N, K)
    counts = jnp.sum(one_hot, axis=0)
    dw = jax.lax.dot_general(
        one_hot,
        flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (K, D)

    cluster_size = state.cluster_size * decay + counts * (1.0 - decay)
    embed_avg = state.embed_avg * decay + dw * (1.0 - decay)

    n = jnp.sum(cluster_size)
    smoothed = n * (cluster_size + laplace_alpha) / (n + k * laplace_alpha)
    embed = embed_avg / smoothed[:, None]
    return QuantizerState(
        embed=embed,
        embed_avg=embed_avg,
        cluster_size=cluster_size,
        initialized=state.initialized,
    )


def quantize(
    state: QuantizerState,
    inputs: jax.Array,
    *,
    train: bool,
    commitment_cost: float = 0.1,
    decay: float = 0.99,
    laplace_alpha: float = 1e-5,
    argmin_method: str = "auto",
):
    """Pure functional quantization.

    inputs: (..., D) channels-last, any leading shape. Returns
    (loss, quantized_st, indices, new_state). ``quantized_st`` carries
    straight-through gradients; lookup uses the pre-EMA-update codebook
    (matching the reference's op order, layers.py:695-706).
    """
    d = state.embed.shape[1]
    x = inputs.astype(jnp.float32)
    flat = x.reshape(-1, d)

    if train:
        state = jax.lax.cond(
            state.initialized,
            lambda s: s,
            lambda s: ema_first_pass_init(s, flat),
            state,
        )

    # The lookup is non-differentiable (reference runs it under no_grad,
    # layers.py:689); stop_gradient keeps autodiff out of the Pallas kernel.
    indices = l2_argmin(
        jax.lax.stop_gradient(flat),
        jax.lax.stop_gradient(state.embed),
        method=argmin_method,
    )
    quantized = jnp.take(state.embed, indices, axis=0).reshape(x.shape)

    if train:
        state = ema_update(state, flat, indices, decay, laplace_alpha)

    e_latent_loss = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(x)))
    loss = commitment_cost * e_latent_loss

    quantized_st = x + jax.lax.stop_gradient(quantized - x)
    indices = indices.reshape(x.shape[:-1])
    return loss, quantized_st, indices, state


class Quantizer(nn.Module):
    """linen wrapper owning the EMA state in the ``"quantizer"`` collection."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.1
    decay: float = 0.99
    laplace_alpha: float = 1e-5
    argmin_method: str = "auto"

    def _state_vars(self):
        def init_embed():
            key = self.make_rng("params")
            return jax.random.normal(
                key, (self.num_embeddings, self.embedding_dim), jnp.float32
            )

        embed = self.variable("quantizer", "embed", init_embed)
        embed_avg = self.variable(
            "quantizer", "embed_avg", lambda: jnp.copy(embed.value)
        )
        cluster_size = self.variable(
            "quantizer",
            "cluster_size",
            lambda: jnp.zeros((self.num_embeddings,), jnp.float32),
        )
        initialized = self.variable(
            "quantizer", "initialized", lambda: jnp.zeros((), jnp.bool_)
        )
        return embed, embed_avg, cluster_size, initialized

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        embed, embed_avg, cluster_size, initialized = self._state_vars()
        state = QuantizerState(
            embed.value, embed_avg.value, cluster_size.value, initialized.value
        )
        loss, quantized, indices, new_state = quantize(
            state,
            inputs,
            train=train,
            commitment_cost=self.commitment_cost,
            decay=self.decay,
            laplace_alpha=self.laplace_alpha,
            argmin_method=self.argmin_method,
        )
        if train and not self.is_initializing():
            embed.value = new_state.embed
            embed_avg.value = new_state.embed_avg
            cluster_size.value = new_state.cluster_size
            initialized.value = new_state.initialized
        # Cast back to the surrounding compute dtype (the quantizer itself is
        # fp32-pinned, reference layers.py:685-687).
        return loss, quantized.astype(inputs.dtype), indices

    def embed_code(self, indices: jax.Array) -> jax.Array:
        """Codebook lookup: (...,) int → (..., D) fp32 (layers.py:633)."""
        embed = self.get_variable("quantizer", "embed")
        return jnp.take(embed, indices, axis=0)
