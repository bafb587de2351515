"""Pallas row-decode kernel for cached PixelCNN ancestral sampling.

The cached sampler's voxel phase (sample/cached_sample.py::_width_step
driven by a fori_loop) is ~75% of top-level sampling time: each of the
524k voxel steps runs ~50 layers x ~10 tiny (B,16)-sized XLA ops, and
every intermediate round-trips HBM at ~0.5-1 us latency — ~180 us/voxel
measured (PERF.md "Ancestral sampling"). This kernel runs ONE WHOLE ROW
(s2 voxels x all layers x sampling) as a single pallas_call with every
weight, cache and intermediate VMEM/register-resident.

Design notes:
  * Weights arrive leaf-stacked over layers (L, ...) and the layer loop is
    a lax.fori_loop with dynamic indexing — code size stays O(1) in L.
  * Sampling stays EXACT w.r.t. the XLA path: jax.random.categorical is
    gumbel-argmax, and the per-voxel key sequence (rng, sub = split(rng))
    is replicated OUTSIDE the kernel into a (B, s2, K) Gumbel table; the
    kernel just does argmax(logits/tau + gumbel). Same draws, same grids
    (equality-tested on the interpret path in tests/test_cached_sample.py).
  * Layer 0 is the mask-'A' entry block: its input (and skip input) is the
    PREVIOUS voxel's parse_input embedding, zeroed at the first column —
    selected inside the layer loop via li == 0 (is_first is layer 0 by
    construction, sample/cached_sample.py::_extract_layers).
  * Skip unification: layers without a skip_conv use an identity matrix +
    zero bias, so `w = out + sk_in @ SkW + SkB` is the one formula for
    both (reference PreActFixupCausalResBlock skip semantics,
    pixel_model/layers.py:338-497).

Replaces the voxel fori_loop only; the slice/row cache phases stay XLA
(they are dense, batched work XLA handles well).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae3d_tpu.ops.fused_block import _elu

f32 = jnp.float32


def _row_kernel(
    # VMEM operands
    w1_ref,  # (L, C, br)
    wk_ref,  # (L, ws, br, br)
    w3_ref,  # (L, br, C)
    skw_ref,  # (L, C, C)
    skb_ref,  # (L, C)
    sc_ref,  # (L, 8) SMEM: b1a b1b b2a b2b b3a b3b b4 scale
    d2w_ref,  # (L, s2, B, br) — voxel index on an UNTILED leading dim
    h2w_ref,  # (L, s2, B, br)   (Mosaic: dynamic indices on the tiled
    cnd_ref,  # (L, s2, B, br)    last-two dims must be provably aligned)
    dhfin_ref,  # (s2, B, C): d_fin_row + h_fin_row
    w_in_ref,  # (K, C)
    b_in_ref,  # (1, C)
    w_out_ref,  # (C, K)
    b_out_ref,  # (1, K)
    gum_ref,  # (s2, B, K) gumbel noise (categorical's own draws)
    out_ref,  # (s2, 1, B) int32 sampled indices
    vc,  # VMEM scratch (L, B, ws-1, br)
    *,
    tau: float,
    l0_skip: bool,
):
    L, C, br = w1_ref.shape
    ws = wk_ref.shape[1]
    s2, B, K = gum_ref.shape

    vc[:] = jnp.zeros_like(vc)
    b_in = b_in_ref[0]
    w0 = jnp.broadcast_to(b_in, (B, C))  # parse_input of the all-zero voxel
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

    def dot(a, m):
        return jax.lax.dot_general(
            a, m, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def voxel(i2, s_prev):
        # STATICALLY UNROLLED layer chain: constant weight addresses let
        # Mosaic schedule the dependent tiny-dot chain without per-layer
        # dynamic-index load machinery (measured ~2x on the voxel phase
        # vs a fori_loop with traced layer index)
        w = w0
        for li in range(L):
            first = li == 0
            u_in = s_prev if first else w
            u = _elu(u_in + sc_ref[li, 0]) + sc_ref[li, 1]
            if first:
                u = jnp.where(i2 == 0, jnp.zeros_like(u), u)
            t = dot(u, w1_ref[li])
            t = t + d2w_ref[li, i2] + h2w_ref[li, i2]
            v = _elu(t + sc_ref[li, 2]) + sc_ref[li, 3]
            # all taps in ONE dot: [cache rows | v] @ stacked kernel
            taps = jnp.concatenate(
                [vc[li, :, s] for s in range(ws - 1)] + [v], axis=-1
            )  # (B, ws*br)
            b2 = dot(taps, wk_ref[li].reshape(ws * br, br))
            for s in range(ws - 2):
                vc[li, :, s] = vc[li, :, s + 1]
            vc[li, :, ws - 2] = v
            b2 = b2 + cnd_ref[li, i2]
            w3v = _elu(b2 + sc_ref[li, 4]) + sc_ref[li, 5]
            out = dot(w3v, w3_ref[li]) * sc_ref[li, 7] + sc_ref[li, 6]
            sk_in = (s_prev if first else w) if l0_skip else w
            w = out + dot(sk_in, skw_ref[li]) + skb_ref[li]
        total = dhfin_ref[i2] + w
        logits = dot(total, w_out_ref[:]) + b_out_ref[0]
        z = logits / tau + gum_ref[i2]
        # argmax with first-occurrence tie-breaking (== jnp.argmax)
        m = jnp.max(z, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(z >= m, iota_k, K), axis=-1)
        out_ref[i2, 0] = idx
        one_hot = (iota_k == idx[:, None]).astype(f32)
        return dot(one_hot, w_in_ref[:]) + b_in

    jax.lax.fori_loop(0, s2, voxel, jnp.zeros((B, C), f32))


def stack_row_weights(layers, w_in, b_in, w_out, b_out):
    """Leaf-stack the per-layer width-stream weights from the sampler's
    _LayerParams views into the kernel's (L, ...) operands. All traced —
    runs once per slice-step trace; cost is negligible."""
    C = w_in.shape[-1]  # model_dim (w_in: (1,1,1,K,C))

    def k1(p):
        return p["width_conv"]["kernel"][0, 0, 0].astype(f32)

    w1 = jnp.stack([k1(lp.c1) for lp in layers])
    # width conv tap counts differ by mask: 'B' layers have ceil(k/2)+1
    # taps, the mask-'A' entry layer one fewer (reference
    # pixel_model/layers.py:193-201). Front-pad with ZERO taps to the max:
    # the zero tap multiplies the (never-written) cache slot — exact.
    kws = [lp.c2["width_conv"]["kernel"][0, 0].astype(f32) for lp in layers]
    ws_max = max(w.shape[0] for w in kws)
    wk = jnp.stack(
        [
            jnp.pad(w, ((ws_max - w.shape[0], 0), (0, 0), (0, 0)))
            for w in kws
        ]
    )
    w3 = jnp.stack([k1(lp.c3) for lp in layers])
    eye = jnp.eye(C, dtype=f32)
    skw, skb = [], []
    for lp in layers:
        if lp.skip is not None:
            skw.append(k1(lp.skip))
            skb.append(lp.skip["width_conv"]["bias"].astype(f32))
        else:
            skw.append(eye)
            skb.append(jnp.zeros((C,), f32))
    sc = jnp.stack(
        [
            jnp.stack(
                [lp.s["1a"], lp.s["1b"], lp.s["2a"], lp.s["2b"],
                 lp.s["3a"], lp.s["3b"], lp.s["4"], lp.scale]
            )
            for lp in layers
        ]
    ).astype(f32)
    return dict(
        w1=w1, wk=wk, w3=w3, skw=jnp.stack(skw), skb=jnp.stack(skb), sc=sc,
        w_in=w_in[0, 0, 0].astype(f32), b_in=b_in.reshape(1, -1).astype(f32),
        w_out=w_out[0, 0, 0].astype(f32),
        b_out=b_out.reshape(1, -1).astype(f32),
        l0_skip=layers[0].skip is not None,
    )


def row_decode(
    stacked,
    d2w_row,  # (L, B, s2, br)
    h2w_row,  # (L, B, s2, br)
    cnd_row,  # (L, B, s2, br) or None
    dhfin_row,  # (B, s2, C)
    gumbel,  # (s2, B, K)
    tau: float,
    interpret: bool = False,
) -> jax.Array:
    """Sample one row; returns (B, s2) int32 indices."""
    L, B, s2, br = d2w_row.shape
    if cnd_row is None:
        cnd_row = jnp.zeros_like(d2w_row)
    # voxel-indexed operands go in with s2 LEADING (untiled) — see kernel
    d2w_row = d2w_row.transpose(0, 2, 1, 3)
    h2w_row = h2w_row.transpose(0, 2, 1, 3)
    cnd_row = cnd_row.transpose(0, 2, 1, 3)
    dhfin_row = dhfin_row.transpose(1, 0, 2)
    ws = stacked["wk"].shape[1]
    kern = functools.partial(
        _row_kernel, tau=float(tau), l0_skip=stacked["l0_skip"]
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[vmem] * 5 + [smem] + [vmem] * 9,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s2, 1, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L, B, max(ws - 1, 1), br), f32),
        ],
        interpret=interpret,
    )(
        stacked["w1"], stacked["wk"], stacked["w3"], stacked["skw"],
        stacked["skb"], stacked["sc"],
        d2w_row.astype(f32), h2w_row.astype(f32), cnd_row.astype(f32),
        dhfin_row.astype(f32),
        stacked["w_in"], stacked["b_in"], stacked["w_out"], stacked["b_out"],
        gumbel.astype(f32),
    )[:, 0].T  # (s2, 1, B) -> (B, s2)


def gumbel_row(rng, b: int, s2: int, k: int):
    """Replicate the XLA voxel loop's key sequence for one row: per voxel
    ``rng, sub = split(rng)`` then categorical's own gumbel draw of shape
    (B, K). Returns (rng_after, (B, s2, K) gumbel)."""

    def f(r, _):
        r, sub = jax.random.split(r)
        return r, sub

    rng, subs = jax.lax.scan(f, rng, None, length=s2)
    g = jax.vmap(lambda s: jax.random.gumbel(s, (b, k)))(subs)  # (s2, B, K)
    return rng, g


__all__ = ["row_decode", "stack_row_weights", "gumbel_row"]
