"""Pallas TPU flash causal attention with IN-KERNEL logit dropout.

The reference applies dropout to PRE-MASK attention logits with dropped
entries set to -1e3 (/root/reference/pixel_model/layers.py:636-639) — live
in every published PixelSNAIL train config (dropout 0.5). Round-2's first
fix (ops/chunked_attention.py) computed the online softmax at the XLA
level; it made S=8192 training *affordable* (O(S·blk) memory) but the
profile shows it is ~100x off the compute roofline: ~400 tiny `while`
loops per step whose bodies are dominated by dynamic-slice/broadcast
HBM traffic (async-copy 39% of device time, mid config 571 ms/step).

This module is the real fix: two Pallas kernels (fwd; combined dq+dk+dv),
everything VMEM-resident per (batch·head) grid cell, with the dropout
mask generated ON CORE by the TPU hardware PRNG (pltpu.prng_seed /
prng_random_bits) — zero HBM traffic for ~13G mask bits per step at the
mid level. The mask is regenerated bit-identically in the backward
kernels by reseeding with the same per-tile id: seed = (base_seed,
((bh·nqb + qi)·nkb + ki)); Mosaic supports at most 2 seed words, so the
tile coordinates are folded into one int32 (collision-free: the id is
the flattened tile index).

Dropout semantics mirror the dense/chunked paths exactly: kept logits
scaled 1/(1-p), dropped set to -1e3 (NOT -inf), causal mask applied
AFTER dropout. keep = (uniform uint32 >= round(p·2^32)) — exact for
p=0.5 (threshold 2^31). Like the chunked path, the bit stream differs
from the dense path's jax.random.bernoulli for the same rng; dropout=0
is parity-testable against the dense path (tests/test_flash_dropout.py).

The backward is ONE kernel over k-blocks computing dq, dk and dv together
— each logit tile's recompute (dot, PRNG mask, exp) happens exactly once,
vs twice in the classic dq/dkv split; dq accumulates in a persistent VMEM
scratch across the k grid steps and flushes at the last one. Per-tile
forward recompute uses the saved (out, lse); no logit tile is ever
materialized in HBM. `collect_mask`
(debug, small S only) additionally writes the keep mask so tests can
build a dense reference with the *kernel's own* mask and check fwd and
all three grads exactly.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
import jax.experimental.pallas.tpu as pltpu

NEG_BIG = -1e3  # reference layers.py:639 masked_fill value

# Headroom over the default 16 MB scoped-vmem limit: small head dims pad
# to 128 lanes (dh=8 at the mid level -> 16x), and the combined backward
# keeps a full-sequence fp32 dq accumulator resident.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _keep_threshold(dropout_p: float) -> jnp.uint32:
    # P(bits >= t) = (2^32 - t) / 2^32 = 1 - p  =>  t = p * 2^32.
    # Exact for p = k/2^32 (in particular p=0.5 -> t=2^31).
    return jnp.uint32(min(int(round(dropout_p * 2**32)), 2**32 - 1))


def _scale_q(qb, sm_scale):
    return (qb.astype(jnp.float32) * sm_scale).astype(qb.dtype)


def _prec(dt):
    # fp32 operands keep exact fp32 dots (matches ops/chunked_attention.py);
    # bf16 default precision is already exact for bf16 operands.
    return lax.Precision.HIGHEST if dt == jnp.float32 else None


def _tile_keep(seed, tile_id, blk, dropout_p):
    """(blk, blk) bool keep-mask for one logit tile, from the hardware PRNG.

    Deterministic in (seed, tile_id): the backward kernels reseed with the
    same id and regenerate the identical mask.
    """
    pltpu.prng_seed(seed, tile_id)
    bits = pltpu.bitcast(pltpu.prng_random_bits((blk, blk)), jnp.uint32)
    return bits >= _keep_threshold(dropout_p)


def _dropped_masked_logits(qbs, kb, seed, tile_id, qi, ki, blk, dropout_p):
    """Recomputes one logit tile exactly as the forward saw it:
    scaled q·k^T (fp32 accum) -> dropout (pre-mask, reference quirk)
    -> causal mask. Returns (logits, keep).

    The causal mask only has an effect on the DIAGONAL tile, but gating it
    behind ``lax.cond(qi == ki, ...)`` measured SLOWER (fwd 2.6 -> 3.4 ms
    at mid-level shapes): the branch blocks Mosaic's software pipelining
    of the k-loop, which costs more than the saved iota/compare VPU work.
    So the mask runs unconditionally."""
    logits = lax.dot_general(
        qbs, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(qbs.dtype),
    )  # (blk_q, blk_k) fp32
    keep = None
    if dropout_p > 0.0:
        keep = _tile_keep(seed, tile_id, blk, dropout_p)
        logits = jnp.where(keep, logits * (1.0 / (1.0 - dropout_p)), NEG_BIG)

    q_idx = qi * blk + lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    k_idx = ki * blk + lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    logits = jnp.where(q_idx >= k_idx, logits, -jnp.inf)
    return logits, keep


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *mask_ref,
                blk, nqb, nkb, sm_scale, dropout_p):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    dv = v_ref.shape[-1]
    qbs = _scale_q(q_ref[0], sm_scale)
    seed = seed_ref[0]
    if mask_ref:
        # unreachable (future) tiles keep=1: they are causally masked, so
        # the dense reference ignores their mask value either way.
        mask_ref[0][0] = jnp.ones(mask_ref[0].shape[1:], jnp.uint8)

    def body(ki, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(ki * blk, blk), :]
        vb = v_ref[0, pl.ds(ki * blk, blk), :]
        tile_id = (bh * nqb + qi) * nkb + ki
        logits, keep = _dropped_masked_logits(
            qbs, kb, seed, tile_id, qi, ki, blk, dropout_p
        )
        if mask_ref:
            mask_ref[0][0, :, pl.ds(ki * blk, blk)] = (
                keep.astype(jnp.uint8) if keep is not None
                else jnp.ones((blk, blk), jnp.uint8)
            )
        m_new = jnp.maximum(m, jnp.max(logits, axis=1))
        # m is -inf only before the first (diagonal-containing) tile, and
        # m_new is always finite (every row reaches its diagonal key), so
        # exp(m - m_new) is 0 on the first iteration, never NaN.
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[:, None])
        l_new = l * alpha + jnp.sum(p, axis=1)
        acc_new = acc * alpha[:, None] + lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(vb.dtype),
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((blk,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((blk,), jnp.float32)
    acc0 = jnp.zeros((blk, dv), jnp.float32)
    m, l, acc = lax.fori_loop(0, qi + 1, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)
    # lse is stored with a broadcast 8-sublane dim: Pallas TPU requires the
    # last two block dims to be (8, 128)-aligned, so a (1, blk) row block
    # is not expressible — (1, 8, blk) with identical rows is.
    lse_ref[0] = jnp.broadcast_to((m + jnp.log(l))[None, :], (8, lse_ref.shape[-1]))


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, dq_acc_ref, *,
                blk, nqb, nkb, sm_scale, dropout_p):
    """Combined dq + dk + dv in ONE pass: each logit tile is recomputed
    (dot, PRNG mask, exp) exactly once — the kernel is elementwise-bound,
    so halving the recompute beats the classic two-kernel split.

    Grid is (BH, ki); dq accumulates across the ki steps in a persistent
    VMEM scratch (NOT the output block: reading an output block back per
    grid step forces an HBM round-trip — measured +150 ms/step at the mid
    level) and is written to the dq output once, at the last ki."""
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    dv = v_ref.shape[-1]
    dh = q_ref.shape[-1]
    cdt = q_ref.dtype
    kb = k_ref[0]
    vb = v_ref[0]
    seed = seed_ref[0]
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0

    @pl.when(ki == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros((nqb * blk, dh), jnp.float32)

    def body(qi, carry):
        dk_acc, dv_acc = carry
        # qbs is the scaled q, so dk_acc = ds^T (s·q) = s · ds^T q — the
        # sm_scale is already folded in (dq scales per-tile instead).
        qbs = _scale_q(q_ref[0, pl.ds(qi * blk, blk), :], sm_scale)
        do_b = do_ref[0, pl.ds(qi * blk, blk), :].astype(cdt)
        lse_row = lse_ref[0, 0, pl.ds(qi * blk, blk)][:, None]
        delta_row = delta_ref[0, 0, pl.ds(qi * blk, blk)][:, None]
        tile_id = (bh * nqb + qi) * nkb + ki
        logits, keep = _dropped_masked_logits(
            qbs, kb, seed, tile_id, qi, ki, blk, dropout_p
        )
        p = jnp.exp(logits - lse_row)  # causally-masked -> exp(-inf) = 0
        dv_acc = dv_acc + lax.dot_general(
            p.astype(cdt), do_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(cdt),
        )
        dp = lax.dot_general(
            do_b, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(do_b.dtype),
        )
        ds = p * (dp - delta_row)
        if dropout_p > 0.0:
            ds = jnp.where(keep, ds * inv_keep, 0.0)
        dk_acc = dk_acc + lax.dot_general(
            ds.astype(cdt), qbs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(cdt),
        )
        dq_tile = lax.dot_general(
            ds.astype(cdt), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(cdt),
        )
        dq_acc_ref[pl.ds(qi * blk, blk), :] += dq_tile * sm_scale
        return dk_acc, dv_acc

    dk0 = jnp.zeros((blk, dh), jnp.float32)
    dv0 = jnp.zeros((blk, dv), jnp.float32)
    dk, dvv = lax.fori_loop(ki, nqb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dvv.astype(dv_ref.dtype)

    @pl.when(ki == nkb - 1)
    def _flush():
        dq_ref[0] = dq_acc_ref[:].astype(dq_ref.dtype)


def _block_layout(s: int, block: int):
    blk = min(block, _round_up(s, 128))
    sp = _round_up(s, blk)
    while sp % blk:
        blk //= 2
    return blk, sp


def _pad_seq(x, sp):
    s = x.shape[1]
    if s == sp:
        return x
    return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))


def _fwd_call(q, k, v, seed, sm_scale, dropout_p, block, collect_mask=False):
    bhn, sp, dh = q.shape
    dv = v.shape[-1]
    blk = block
    n = sp // blk
    kernel = functools.partial(
        _fwd_kernel, blk=blk, nqb=n, nkb=n,
        sm_scale=sm_scale, dropout_p=dropout_p,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((bhn, sp, dv), q.dtype),
        jax.ShapeDtypeStruct((bhn, 8, sp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, blk, dv), lambda bh, qi: (bh, qi, 0)),
        pl.BlockSpec((1, 8, blk), lambda bh, qi: (bh, 0, qi)),
    ]
    if collect_mask:
        out_shapes.append(jax.ShapeDtypeStruct((bhn, sp, sp), jnp.uint8))
        out_specs.append(pl.BlockSpec((1, blk, sp), lambda bh, qi: (bh, qi, 0)))
    res = pl.pallas_call(
        kernel,
        grid=(bhn, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, dh), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, sp, dh), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, sp, dv), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
    )(seed, q, k, v)
    return res


def _bwd_call(q, k, v, do, lse, delta, seed, sm_scale, dropout_p, block):
    bhn, sp, dh = q.shape
    dv = v.shape[-1]
    blk = block
    n = sp // blk
    common = dict(blk=blk, nqb=n, nkb=n, sm_scale=sm_scale, dropout_p=dropout_p)
    full = lambda d: pl.BlockSpec((1, sp, d), lambda bh, i: (bh, 0, 0))
    tile = lambda d: pl.BlockSpec((1, blk, d), lambda bh, i: (bh, i, 0))
    row_full = pl.BlockSpec((1, 8, sp), lambda bh, i: (bh, 0, 0))

    dq, dk, dvv = pl.pallas_call(
        functools.partial(_bwd_kernel, **common),
        grid=(bhn, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(dh), tile(dh), tile(dv), full(dv), row_full, row_full,
        ],
        out_specs=[
            # dq: constant index_map along ki — VMEM-resident accumulator
            # for the whole bh row (fp32; cast by the caller)
            pl.BlockSpec((1, sp, dh), lambda bh, ki: (bh, 0, 0)),
            pl.BlockSpec((1, blk, dh), lambda bh, ki: (bh, ki, 0)),
            pl.BlockSpec((1, blk, dv), lambda bh, ki: (bh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bhn, sp, dh), jnp.float32),
            jax.ShapeDtypeStruct((bhn, sp, dh), q.dtype),
            jax.ShapeDtypeStruct((bhn, sp, dv), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((sp, dh), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
    )(seed, q, k, v, do, lse, delta)
    return dq.astype(q.dtype), dk, dvv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_dropout(q, k, v, seed, sm_scale, dropout_p, block):
    out, _ = _flash_dropout_fwd(q, k, v, seed, sm_scale, dropout_p, block)
    return out


def _flash_dropout_fwd(q, k, v, seed, sm_scale, dropout_p, block):
    out, lse = _fwd_call(q, k, v, seed, sm_scale, dropout_p, block)
    return out, (q, k, v, seed, out, lse)


def _flash_dropout_bwd(sm_scale, dropout_p, block, res, do):
    q, k, v, seed, out, lse = res
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (delta.shape[0], 8, delta.shape[1]))
    dq, dk, dv = _bwd_call(
        q, k, v, do.astype(q.dtype), lse, delta, seed,
        sm_scale, dropout_p, block,
    )
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dseed


_flash_dropout.defvjp(_flash_dropout_fwd, _flash_dropout_bwd)


def seed_from_rng(rng: jax.Array) -> jax.Array:
    """Derive the kernel's (1,) int32 base seed from a JAX PRNG key.

    flax's make_rng already folds the module path and step into the key,
    so one word of key data is enough to decorrelate layers and steps.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    word = rng.reshape(-1)[-1]
    return lax.bitcast_convert_type(word, jnp.int32).reshape(1)


def flash_causal_dropout_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    dropout_p: float = 0.0,
    seed: jax.Array | None = None,
    block: int = 512,
    collect_mask: bool = False,
):
    """q, k, v: (B, nh, S, dh) -> (B, nh, S, dv), causal (diagonal incl.),
    reference-quirk logit dropout generated in-kernel. TPU only (the
    hardware-PRNG primitives have no interpret-mode lowering).

    S is padded to a block multiple: padded keys are causally unreachable;
    padded query rows produce garbage that is sliced off (their backward
    contribution is exactly zero because their `do` rows are zero).

    collect_mask additionally returns the (B, nh, S, S) uint8 keep-mask
    (debug/testing only — O(S²) memory; forward pass only).
    """
    b, nh, s, dh = q.shape
    assert k.shape == (b, nh, s, dh) and v.shape[:3] == (b, nh, s)
    dv = v.shape[-1]
    if dropout_p > 0.0:
        assert seed is not None, "dropout requires a seed"
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    blk, sp = _block_layout(s, block)
    q3 = _pad_seq(q.reshape(b * nh, s, dh), sp)
    k3 = _pad_seq(k.reshape(b * nh, s, dh), sp)
    v3 = _pad_seq(v.reshape(b * nh, s, dv), sp)

    if collect_mask:
        out, _, mask = _fwd_call(
            q3, k3, v3, seed, sm_scale, dropout_p, blk, collect_mask=True
        )
        out = out[:, :s].reshape(b, nh, s, dv)
        mask = mask[:, :s, :s].reshape(b, nh, s, s)
        return out, mask

    out = _flash_dropout(q3, k3, v3, seed, sm_scale, dropout_p, blk)
    return out[:, :s].reshape(b, nh, s, dv)
