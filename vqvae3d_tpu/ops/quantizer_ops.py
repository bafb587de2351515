"""Codebook nearest-neighbor (L2 argmin) ops — the VQ-VAE hot kernel.

The reference computes ``argmin(cdist(flat, embed))`` with matmul disabled
for accuracy (/root/reference/vqvae/layers.py:698-702). TPU-first redesign:

  * ``l2_argmin_ref`` — pure-JAX fp32 distance expansion ``|x|² − 2x·e + |e|²``
    with HIGHEST-precision dot (fp32-accurate on MXU), chunked over N so the
    (N, K) distance matrix never fully materializes in HBM.
  * ``l2_argmin_pallas`` — Pallas TPU kernel: codebook resident in VMEM,
    rows streamed through in tiles, distances computed on the MXU and
    arg-minned on the fly (no (N, K) buffer at all).

Both return int32 indices; parity is tested in tests/test_quantizer.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    )(xt, e, e2)
    return out[0, :n]


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
