"""Memory-efficient causal attention with train-time logit dropout.

VERDICT r1 #7: the reference applies dropout to PRE-MASK attention logits
with dropped entries set to −1e3 (/root/reference/pixel_model/layers.py:
636-639), which is active in all published PixelSNAIL training configs
(dropout 0.5) — so the train path could never use a stock flash kernel and
fell back to dense O(S²) logits (2 GB/stream at the mid level's S=8192).

This module is the TPU-native fix: an online-softmax (flash-style)
attention computed at the XLA level — query blocks unrolled (so each
block's key-loop bound is the static ``qi+1``: only causally-reachable
key blocks are ever computed, and reverse-mode AD through the fori_loop
works) — with the reference's dropout quirk applied per (CQ, CK) logit
tile. The q·k and p·v dots run in the input dtype (bf16 on the train
path) with fp32 accumulation; softmax statistics stay fp32. Memory is
O(S·CK) instead of O(S²); every FLOP is an MXU dot. The backward pass
rematerializes per-block (jax.checkpoint) so no logit tile is ever saved.

Dropout semantics (mirrors the dense path in models/causal_blocks.py):
kept logits are scaled 1/(1-p), dropped logits are set to −1e3 (NOT −inf —
a dropped entry still loses against real logits but keeps softmax finite
when everything is dropped). The mask is drawn per (q-block, k-block) from
``fold_in(rng, qi·nkb + ki)`` — deterministic given the rng, but a
different stream layout than the dense path's single full-shape bernoulli,
so dense and chunked dropout patterns differ for the same rng (dropout=0
is bit-comparable; tested in tests/test_chunked_attention.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

NEG_BIG = -1e3  # reference layers.py:639 masked_fill value


def _fast_dropout_key(rng: jax.Array) -> jax.Array:
    """Rebase a dropout key onto the 'rbg' PRNG (XLA RngBitGenerator — the
    TPU hardware PRNG instruction).

    The mid-level published PixelSNAIL config (S=8192, dropout 0.5) draws
    ~13G random bits per train step for the per-tile logit masks; with the
    default threefry PRNG the ALU hashing dominates the step (PERF.md
    "Stage-2"). Dropout needs no counter-based reproducibility across
    backends, so the hardware generator is the right tool. fold_in/split on
    the rebased key still work (they act on the 4-word key itself, cheap);
    bit streams differ from threefry — same caveat as the chunked-vs-dense
    stream layout, already documented above. VQVAE3D_SLOW_RNG=1 restores
    threefry bits.
    """
    if os.environ.get("VQVAE3D_SLOW_RNG") == "1":
        return rng
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        if jax.random.key_impl(rng) == jax.random.key_impl(
            jax.random.key(0, impl="rbg")
        ):
            return rng
        kd = jax.random.key_data(rng)
    else:
        kd = rng
    kd = kd.reshape(-1)
    if kd.size == 2:
        kd = jnp.tile(kd, 2)
    return jax.random.wrap_key_data(kd[:4], impl="rbg")


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "dropout_p", "block_q", "block_k")
)
def causal_attention_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    dropout_p: float = 0.0,
    dropout_rng: jax.Array | None = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """q, k, v: (B, nh, S, dh) → (B, nh, S, dh), causal (diagonal included).

    S is padded up to a block multiple internally; padded queries produce
    garbage rows that are sliced off, padded keys sit strictly in the
    future of every real query so the causal mask removes them.
    """
    b, nh, s, dh = q.shape
    assert k.shape == (b, nh, s, dh) and v.shape[:3] == (b, nh, s)
    dv = v.shape[-1]
    if dropout_p > 0.0:
        assert dropout_rng is not None

    blk_q = min(block_q, _round_up(s, 128))
    blk_k = min(block_k, _round_up(s, 128))
    sp = _round_up(s, max(blk_q, blk_k))
    # keep block sizes dividing the padded length
    while sp % blk_q:
        blk_q //= 2
    while sp % blk_k:
        blk_k //= 2
    pad = sp - s
    if pad:
        zq = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q = jnp.pad(q, zq)
        k = jnp.pad(k, zq)
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad), (0, 0)])

    nqb = sp // blk_q
    nkb = sp // blk_k
    # The matmuls run in the INPUT dtype (bf16 on the train path — fp32
    # dots with Precision.HIGHEST ran at ~1/8 MXU rate, profiled at the
    # mid level) with fp32 accumulation; the softmax statistics (m, l,
    # logit max/exp) stay fp32 throughout.
    cdt = q.dtype
    # fp32 inputs (fp32-precision training/eval) keep exact fp32 dots;
    # bf16 default precision is already exact for bf16 operands.
    prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None
    q = (q.astype(jnp.float32) * sm_scale).astype(cdt)

    k_blocks = k.reshape(b, nh, nkb, blk_k, dh)
    v_blocks = v.reshape(b, nh, nkb, blk_k, dv)
    q_blocks = q.reshape(b, nh, nqb, blk_q, dh)

    rng0 = dropout_rng if dropout_rng is not None else jax.random.PRNGKey(0)
    if dropout_p > 0.0:
        rng0 = _fast_dropout_key(rng0)

    def one_q_block(qi, qb):
        """qb: (B, nh, blk_q, dh) → (B, nh, blk_q, dv). qi is a python int:
        the key loop bound qi+1 is static, so only causally-reachable key
        blocks are ever computed (half the FLOPs of a full sweep) and
        reverse-mode AD through fori_loop works."""
        q_idx = qi * blk_q + jnp.arange(blk_q)

        def kv_step(ki, carry):
            m, l, acc = carry
            kb = jax.lax.dynamic_index_in_dim(k_blocks, ki, 2, False)
            vb = jax.lax.dynamic_index_in_dim(v_blocks, ki, 2, False)
            logits = jax.lax.dot_general(
                qb,
                kb,
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (b, nh, blk_q, blk_k) fp32
            if dropout_p > 0.0:
                rng_blk = jax.random.fold_in(rng0, qi * nkb + ki)
                keep = jax.random.bernoulli(
                    rng_blk, 1.0 - dropout_p, logits.shape
                )
                logits = jnp.where(keep, logits / (1.0 - dropout_p), NEG_BIG)
            k_idx = ki * blk_k + jnp.arange(blk_k)
            causal = q_idx[:, None] >= k_idx[None, :]
            logits = jnp.where(causal[None, None], logits, -jnp.inf)

            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            # m is -inf until the first reachable key: guard the rescale
            alpha = jnp.where(
                jnp.isneginf(m), 0.0, jnp.exp(m - m_new)
            )
            p = jnp.exp(logits - m_new[..., None])
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jax.lax.dot_general(
                p.astype(cdt),
                vb,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((b, nh, blk_q), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, nh, blk_q), jnp.float32)
        acc0 = jnp.zeros((b, nh, blk_q, dv), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, qi + 1, kv_step, (m0, l0, acc0))
        return acc / jnp.maximum(l, 1e-30)[..., None]

    outs = [
        jax.checkpoint(functools.partial(one_q_block, qi))(q_blocks[:, :, qi])
        for qi in range(nqb)
    ]
    out = jnp.stack(outs, axis=2).reshape(b, nh, sp, dv)
    if pad:
        out = out[:, :, :s]
    return out.astype(v.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
