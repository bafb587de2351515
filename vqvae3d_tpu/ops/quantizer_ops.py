"""Codebook nearest-neighbor (L2 argmin) ops — the VQ-VAE hot kernel.

The reference computes ``argmin(cdist(flat, embed))`` with matmul disabled
for accuracy (/root/reference/vqvae/layers.py:698-702). TPU-first redesign:

  * ``l2_argmin_ref`` — pure-JAX fp32 distance expansion ``|x|² − 2x·e + |e|²``
    with HIGHEST-precision dot (fp32-accurate on MXU), chunked over N so the
    (N, K) distance matrix never fully materializes in HBM.
  * ``l2_argmin_pallas`` — Pallas TPU kernel: codebook resident in VMEM,
    rows streamed through in tiles, distances computed on the MXU and
    arg-minned on the fly (no (N, K) buffer at all).
  * ``l2_argmin_stats_pallas`` — the same kernel FUSED with the EMA cluster
    statistics (per-code counts and Σx), accumulated in VMEM across grid
    steps — the (N, K) one-hot matrix the unfused EMA matmul materializes
    in HBM (268 MB at N=524k, K=128) never exists. Mirrors the stats the
    reference all-reduces at vqvae/layers.py:638-647.

All return int32 indices; parity is tested in tests/test_quantizer.py.
Off-TPU backends run the kernels in interpret mode, so ``method='pallas'``
is exercisable on the CPU test mesh (incl. under shard_map).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunk_argmin(flat_chunk: jax.Array, embed: jax.Array) -> jax.Array:
    """(n, D) × (K, D) → (n,) int32 nearest-code indices, fp32 exact-ish."""
    x = flat_chunk.astype(jnp.float32)
    e = embed.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (n, 1)
    e2 = jnp.sum(e * e, axis=-1)  # (K,)
    xe = jax.lax.dot_general(
        x,
        e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (n, K)
    dists = x2 - 2.0 * xe + e2[None, :]
    return jnp.argmin(dists, axis=-1).astype(jnp.int32)


def l2_argmin_ref(
    flat: jax.Array, embed: jax.Array, chunk_size: int = 65536
) -> jax.Array:
    """Nearest codebook index per row of ``flat``.

    flat: (N, D); embed: (K, D) → (N,) int32. Chunked over N to bound the
    transient (chunk, K) distance buffer.
    """
    n, d = flat.shape
    if n <= chunk_size:
        return _chunk_argmin(flat, embed)
    pad = (-n) % chunk_size
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    chunks = flat.reshape(-1, chunk_size, d)
    idx = jax.lax.map(lambda c: _chunk_argmin(c, embed), chunks)
    return idx.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _l2_argmin_kernel(xt_ref, e_ref, e2_ref, out_ref):
    """One grid step handles a (D, TN) tile of transposed inputs.

    xt_ref: (D, TN) fp32 — rows on the lane dim (TPU-native: N is large).
    e_ref:  (K, D) fp32 codebook (VMEM-resident, small: K≤512, D≤32).
    e2_ref: (K, 1) fp32 per-code squared norms.
    out_ref: (1, TN) int32 argmin indices.
    """
    xt = xt_ref[:]  # (D, TN)
    e = e_ref[:]  # (K, D)
    # (K, D) @ (D, TN) -> (K, TN) on the MXU. Precision.HIGHEST forces the
    # multi-pass bf16 decomposition for fp32-exact products — the single-pass
    # default truncates operands to bf16 and mis-assigns ~5% of codes
    # (the TPU analog of the reference's "mm is too inaccurate" note,
    # vqvae/layers.py:698-701).
    xe = jax.lax.dot_general(
        e,
        xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # |x|² is constant across K — irrelevant for the argmin. dist ∝ e² − 2x·e.
    dists = e2_ref[:] - 2.0 * xe  # (K, TN)
    out_ref[:] = jnp.argmin(dists, axis=0, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def l2_argmin_pallas(flat: jax.Array, embed: jax.Array, tile_n: int = 2048):
    """Pallas nearest-code lookup. flat: (N, D); embed: (K, D) → (N,) int32.

    Strategy: transpose to (D, N) so the huge N dimension rides the 128-wide
    lane axis; the codebook and its norms stay pinned in VMEM across the whole
    grid; each grid step computes a (K, TN) distance tile on the MXU and
    reduces it to per-lane argmins immediately — the (N, K) distance matrix
    never exists in HBM.
    """
    n, d = flat.shape
    k = embed.shape[0]
    e = embed.astype(jnp.float32)
    e2 = jnp.sum(e * e, axis=-1, keepdims=True)  # (K, 1)

    pad = (-n) % tile_n
    xt = jnp.swapaxes(flat.astype(jnp.float32), 0, 1)  # (D, N)
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    n_pad = n + pad

    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        _l2_argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        interpret=_interpret(),
    )(xt, e, e2)
    return out[0, :n]


# ---------------------------------------------------------------------------
# Fused argmin + EMA cluster statistics
# ---------------------------------------------------------------------------


def _l2_argmin_stats_kernel(nvalid_ref, xt_ref, e_ref, e2_ref,
                            idx_ref, counts_ref, dw_ref):
    """Argmin tile + running (K,) counts and (K, D) Σx accumulators.

    The counts/dw output blocks map to the SAME block every grid step, so
    they live in VMEM across the whole grid and are written back once —
    TPU grids are sequential, making the accumulation race-free.
    Padded columns (global col ≥ nvalid) are masked out of the stats.
    """
    i = pl.program_id(0)
    tn = xt_ref.shape[1]
    k = e_ref.shape[0]

    xt = xt_ref[:]  # (D, TN) fp32
    xe = jax.lax.dot_general(
        e_ref[:],
        xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dists = e2_ref[:] - 2.0 * xe  # (K, TN)
    idx = jnp.argmin(dists, axis=0).astype(jnp.int32)  # (TN,)
    idx_ref[:] = idx[None, :]

    # one-hot (K, TN) membership; mask out padding columns
    col = i * tn + jax.lax.broadcasted_iota(jnp.int32, (k, tn), 1)
    valid = col < nvalid_ref[0]
    oh = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (k, tn), 0) == idx[None, :]) & valid,
        1.0,
        0.0,
    ).astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    counts_ref[:] += jnp.sum(oh, axis=1, keepdims=True)  # (K, 1)
    dw_ref[:] += jax.lax.dot_general(
        oh,
        xt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, D)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def l2_argmin_stats_pallas(flat: jax.Array, embed: jax.Array, tile_n: int = 2048):
    """Fused lookup + EMA stats. flat: (N, D); embed: (K, D).

    Returns (idx (N,) int32, counts (K,) fp32, dw (K, D) fp32) where
    counts[k] = |{n : idx_n = k}| and dw[k] = Σ_{idx_n=k} flat_n — the
    cluster stats of the reference EMA update (vqvae/layers.py:638-643)
    computed in one pass without materializing the (N, K) one-hot.
    """
    n, d = flat.shape
    k = embed.shape[0]
    e = embed.astype(jnp.float32)
    e2 = jnp.sum(e * e, axis=-1, keepdims=True)

    pad = (-n) % tile_n
    xt = jnp.swapaxes(flat.astype(jnp.float32), 0, 1)  # (D, N)
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    n_pad = n + pad
    nvalid = jnp.full((1,), n, jnp.int32)

    grid = (n_pad // tile_n,)
    idx, counts, dw = pl.pallas_call(
        _l2_argmin_stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
        ),
        interpret=_interpret(),
    )(nvalid, xt, e, e2)
    return idx[0, :n], counts[:, 0], dw


def l2_argmin_stats_ref(flat: jax.Array, embed: jax.Array):
    """Pure-JAX equivalent of the fused kernel (one-hot MXU matmul)."""
    idx = l2_argmin_ref(flat, embed)
    k = embed.shape[0]
    one_hot = jax.nn.one_hot(idx, k, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    dw = jax.lax.dot_general(
        one_hot,
        flat.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return idx, counts, dw


def l2_argmin_stats(flat: jax.Array, embed: jax.Array, method: str = "auto"):
    """Dispatch for the fused lookup+stats: Pallas on TPU, ref elsewhere."""
    if method == "ref":
        return l2_argmin_stats_ref(flat, embed)
    if method == "pallas":
        return l2_argmin_stats_pallas(flat, embed)
    assert method == "auto"
    if jax.default_backend() == "tpu":
        return l2_argmin_stats_pallas(flat, embed)
    return l2_argmin_stats_ref(flat, embed)


def l2_argmin(flat: jax.Array, embed: jax.Array, method: str = "auto") -> jax.Array:
    """Dispatch: Pallas on TPU, chunked pure-JAX elsewhere."""
    if method == "ref":
        return l2_argmin_ref(flat, embed)
    if method == "pallas":
        return l2_argmin_pallas(flat, embed)
    assert method == "auto"
    backend = jax.default_backend()
    if backend == "tpu":
        return l2_argmin_pallas(flat, embed)
    return l2_argmin_ref(flat, embed)
