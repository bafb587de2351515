"""Pallas row-decode kernel for cached PixelCNN ancestral sampling.

The cached sampler's per-voxel phase (sample/cached_sample.py::_width_step
in a fori_loop) was ~75% of top-level sampling time: each of the 524k
voxel steps ran ~50 layers x ~10 tiny (B,16)-sized XLA ops, every
intermediate round-tripping HBM at ~0.5-1 us latency (~180 us/voxel
measured, PERF.md "Ancestral sampling"). The per-row HEIGHT tower was the
next ~20%: 1.47 ms x 16,384 row recomputes of a full-slice causal tower
whose per-row information content is one row.

This kernel runs ONE WHOLE ROW in a single pallas_call:

  phase 1 — incremental height-row step: the height tower restricted to
    row i1 is an exact function of (a) the previous row's parse_input
    embedding (the mask-'A' s1-shift), (b) per-layer cached post-2b conv
    rows v[i1-1] (the s1-causal tap), and (c) the depth-phase injections
    d2h at this row — so one row of height-stream values and the h2w
    injections costs O(s2) per layer instead of O(s1*s2). The v-row
    caches thread through the row loop as kernel in/out operands.
  phase 2 — the ~50-layer voxel chain + gumbel-argmax sampling, all
    weights/caches VMEM-resident (statically unrolled layer loop).

Exactness: jax.random.categorical is gumbel-argmax; the per-voxel key
sequence (rng, sub = split(rng)) is replicated OUTSIDE into a Gumbel
table, so the kernel samples the SAME grids as the XLA loop (equality-
tested in interpret mode, conditioned and unconditioned, in
tests/test_cached_sample.py).

Mosaic layout rules honored: dynamic in-kernel indices land on untiled
leading dims (layer) or the SUBLANE dim (voxel i2 of (..., s2, lanes)
refs — verified supported); the int32 sample output keeps s2 leading
because lane-dim dynamic writes are rejected.

Reference being replaced: pixel_model/pixelcnn.py:260-283 (O(V^2)
sampling loop); block math pixel_model/layers.py:338-497.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae3d_tpu.ops.fused_block import _elu

f32 = jnp.float32


def _shift_s2(p, d):
    """out[s] = p[s + d] with zero fill; s2 is dim 1 (sublanes)."""
    if d == 0:
        return p
    z = jnp.zeros((p.shape[0], abs(d), p.shape[2]), p.dtype)
    if d > 0:
        return jnp.concatenate([p[:, d:], z], axis=1)
    return jnp.concatenate([z, p[:, :d]], axis=1)


def _row_kernel(
    # scalar prefetch
    i1_ref,  # SMEM (1,) int32: row index within the slice
    # width weights
    w1_ref,  # (L, C, br)
    wk_ref,  # (L, ws, br, br)
    w3sk_ref,  # (L, br+C, C): [w3*scale ; skip] merged — the layer's two
    #            output-side dots (w3 out-proj and skip 1x1) run as ONE
    #            MXU op, cutting the per-layer critical path 4 dots -> 3
    skb2_ref,  # (L, C): b4 + skip bias (folded)
    sc_ref,  # (L, 8) SMEM: b1a b1b b2a b2b b3a b3b b4 scale
    #          (6/7 pre-folded into w3sk/skb2; kernel reads 0-5 only)
    # height weights
    hw1_ref,  # (L, C, br)
    herf_ref,  # (L, br, br)
    herfb_ref,  # (L, br)
    hwk_ref,  # (L, 2, 3, br, br)
    hw3sk_ref,  # (L, br+C, C): merged as w3sk
    hskb2_ref,  # (L, C)
    # per-row data
    d2h_ref,  # (L, B, s2, br)
    d2w_ref,  # (L, B, s2, br)
    cnd_ref,  # (L, B, s2, br) (zeros when unconditioned)
    dfin_ref,  # (B, s2, C): depth-stream final at this row
    sprev_ref,  # (B, s2, C): parse_input of the PREVIOUS row (zeros at i1=0)
    vhc_ref,  # (L, B, s2, br): height v-row caches (row i1-1)
    w_in_ref,  # (K, C)
    b_in_ref,  # (1, C)
    w_out_ref,  # (C, K)
    b_out_ref,  # (1, K)
    gum_ref,  # (s2, B, K) gumbel noise (categorical's own draws)
    forced_ref,  # (s2, 1, B) int32: teacher indices ((1,1,1) dummy unless
    #              forced — exactness testing against the one-shot forward)
    # outputs
    out_ref,  # (s2, 1, B) int32 sampled indices
    vhc_out_ref,  # (L, B, s2, br): updated height v-row caches (row i1)
    logit_ref,  # (s2, B, K) f32 per-voxel logits (written when forced)
    # scratch
    hw_scr,  # (L, B, s2, br): h2w injections computed by phase 1
    hfin_scr,  # (B, s2, C): height-stream final row
    vc,  # (L, B, ws-1, br): width tap caches
    *,
    tau: float,
    l0_skip: bool,
    forced: bool,
):
    L, C, br = w1_ref.shape
    ws = wk_ref.shape[1]
    s2, B, K = gum_ref.shape
    i1 = i1_ref[0]

    def dot(a, m):
        """Contract the last dim of a with the first of m. Rank-3 operands
        collapse to 2-D first — Mosaic lowers a (B, s2, X)x(X, Y)
        dot_general far worse than the equivalent (B*s2, X) matmul
        (measured ~40x on the height phase)."""
        from vqvae3d_tpu.sample.cached_sample import sample_precision

        prec = sample_precision()
        if a.ndim == 3:
            bb, ss, xx = a.shape
            r = jax.lax.dot_general(
                a.reshape(bb * ss, xx), m, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )
            return r.reshape(bb, ss, m.shape[-1])
        return jax.lax.dot_general(
            a, m, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=prec,
        )

    b_in = b_in_ref[0]

    # ---- phase 1: height-row step (vectorized over s2) ----
    sprev = sprev_ref[:]
    h = jnp.broadcast_to(b_in, (B, s2, C))  # parse_in of the unsampled row
    for li in range(L):
        first = li == 0
        if first:
            u = _elu(sprev + sc_ref[li, 0]) + sc_ref[li, 1]
            u = jnp.where(i1 == 0, jnp.zeros_like(u), u)
        else:
            u = _elu(h + sc_ref[li, 0]) + sc_ref[li, 1]
        tp = dot(u, hw1_ref[li])  # (B, s2, br)
        hw_scr[li] = dot(tp, herf_ref[li]) + herfb_ref[li]
        t = tp + d2h_ref[li]
        v = _elu(t + sc_ref[li, 2]) + sc_ref[li, 3]
        vprev = vhc_ref[li]
        b2 = jnp.zeros_like(v)
        for j1 in range(3):
            p = dot(vprev, hwk_ref[li, 0, j1]) + dot(v, hwk_ref[li, 1, j1])
            b2 = b2 + _shift_s2(p, j1 - 1)
        vhc_out_ref[li] = v
        b2 = b2 + cnd_ref[li]
        w3v = _elu(b2 + sc_ref[li, 4]) + sc_ref[li, 5]
        sk_in = (sprev if first else h) if l0_skip else h
        h = (
            dot(jnp.concatenate([w3v, sk_in], axis=-1), hw3sk_ref[li])
            + hskb2_ref[li]
        )
    hfin_scr[:] = h

    # ---- phase 2: voxel chain + sampling ----
    vc[:] = jnp.zeros_like(vc)
    w0 = jnp.broadcast_to(b_in, (B, C))  # parse_in of the all-zero voxel
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

    def voxel(i2, s_prev):
        # statically unrolled layer chain: constant weight addresses, no
        # per-layer dynamic-index machinery
        w = w0
        for li in range(L):
            first = li == 0
            u_in = s_prev if first else w
            u = _elu(u_in + sc_ref[li, 0]) + sc_ref[li, 1]
            if first:
                u = jnp.where(i2 == 0, jnp.zeros_like(u), u)
            t = dot(u, w1_ref[li])
            t = t + d2w_ref[li, :, i2] + hw_scr[li, :, i2]
            v = _elu(t + sc_ref[li, 2]) + sc_ref[li, 3]
            # all width taps in ONE dot: [cache rows | v] @ stacked kernel
            taps = jnp.concatenate(
                [vc[li, :, s] for s in range(ws - 1)] + [v], axis=-1
            )  # (B, ws*br)
            b2 = dot(taps, wk_ref[li].reshape(ws * br, br))
            for s in range(ws - 2):
                vc[li, :, s] = vc[li, :, s + 1]
            vc[li, :, ws - 2] = v
            b2 = b2 + cnd_ref[li, :, i2]
            w3v = _elu(b2 + sc_ref[li, 4]) + sc_ref[li, 5]
            sk_in = (s_prev if first else w) if l0_skip else w
            w = (
                dot(jnp.concatenate([w3v, sk_in], axis=-1), w3sk_ref[li])
                + skb2_ref[li]
            )
        total = dfin_ref[:, i2] + hfin_scr[:, i2] + w
        logits = dot(total, w_out_ref[:]) + b_out_ref[0]
        if forced:
            logit_ref[i2] = logits
            idx = forced_ref[i2, 0]
        else:
            z = logits / tau + gum_ref[i2]
            # argmax with first-occurrence tie-breaking (== jnp.argmax)
            m = jnp.max(z, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(z >= m, iota_k, K), axis=-1)
        out_ref[i2, 0] = idx
        if B == 1:
            # the embed matmul off the chain: one dynamic sublane-dim read
            return w_in_ref[idx[0]][None] + b_in
        one_hot = (iota_k == idx[:, None]).astype(f32)
        return dot(one_hot, w_in_ref[:]) + b_in

    jax.lax.fori_loop(0, s2, voxel, jnp.zeros((B, C), f32))


def stack_row_weights(layers, w_in, b_in, w_out, b_out):
    """Leaf-stack per-layer width + height weights from the sampler's
    _LayerParams views into the kernel's (L, ...) operands. All traced —
    runs once per slice-step trace."""
    C = w_in.shape[-1]  # model_dim (w_in: (1,1,1,K,C))

    def k1(p, stream="width_conv"):
        return p[stream]["kernel"][0, 0, 0].astype(f32)

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

    def skips(stream):
        skw, skb = [], []
        for lp in layers:
            if lp.skip is not None:
                skw.append(k1(lp.skip, stream))
                skb.append(lp.skip[stream]["bias"].astype(f32))
            else:
                skw.append(eye)
                skb.append(jnp.zeros((C,), f32))
        return jnp.stack(skw), jnp.stack(skb)

    skw, skb = skips("width_conv")
    hskw, hskb = skips("height_conv")
    sc = jnp.stack(
        [
            jnp.stack(
                [lp.s["1a"], lp.s["1b"], lp.s["2a"], lp.s["2b"],
                 lp.s["3a"], lp.s["3b"], lp.s["4"], lp.scale]
            )
            for lp in layers
        ]
    ).astype(f32)
    hw1 = jnp.stack([k1(lp.c1, "height_conv") for lp in layers])
    herf = jnp.stack([lp.erf_h["kernel"][0, 0, 0].astype(f32) for lp in layers])
    herfb = jnp.stack([lp.erf_h["bias"].astype(f32) for lp in layers])
    hwk = jnp.stack(
        [lp.c2["height_conv"]["kernel"][0].astype(f32) for lp in layers]
    )
    hw3 = jnp.stack([k1(lp.c3, "height_conv") for lp in layers])
    # Fold the per-layer scale/b4 into the output projection and merge it
    # with the skip 1x1 so the kernel's two output-side dots become one:
    # out*scale + b4 + sk_in@skw + skb == [w3v|sk_in] @ [w3*scale; skw]
    # + (b4 + skb). (fp reassociation only — low-bit logit differences.)
    scale = sc[:, 7][:, None, None]
    b4 = sc[:, 6][:, None]
    return dict(
        w1=w1, wk=wk, sc=sc,
        w3sk=jnp.concatenate([w3 * scale, skw], axis=1),
        skb2=b4 + skb,
        hw1=hw1, herf=herf, herfb=herfb, hwk=hwk,
        hw3sk=jnp.concatenate([hw3 * scale, hskw], axis=1),
        hskb2=b4 + hskb,
        w_in=w_in[0, 0, 0].astype(f32), b_in=b_in.reshape(1, -1).astype(f32),
        w_out=w_out[0, 0, 0].astype(f32),
        b_out=b_out.reshape(1, -1).astype(f32),
        l0_skip=layers[0].skip is not None,
    )


def row_decode(
    stacked,
    d2h_row,  # (L, B, s2, br)
    d2w_row,  # (L, B, s2, br)
    cnd_row,  # (L, B, s2, br) or None
    dfin_row,  # (B, s2, C)
    sprev_row,  # (B, s2, C)
    vhc,  # (L, B, s2, br)
    gumbel,  # (s2, B, K)
    i1,  # int32 scalar: row index
    tau: float,
    interpret: bool = False,
    forced_idx=None,  # (B, s2) int32: teacher-force + return logits
):
    """Sample one row. Returns ((B, s2) int32 indices, vhc_out) — or,
    with ``forced_idx``, ((B, s2) indices, vhc_out, (B, s2, K) logits)."""
    L, B, s2, br = d2w_row.shape
    C = dfin_row.shape[-1]
    K = gumbel.shape[-1]
    if cnd_row is None:
        cnd_row = jnp.zeros_like(d2w_row)
    ws = stacked["wk"].shape[1]
    forced = forced_idx is not None
    kern = functools.partial(
        _row_kernel, tau=float(tau), l0_skip=stacked["l0_skip"],
        forced=forced,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fop = (
        forced_idx.T.reshape(s2, 1, B).astype(jnp.int32)
        if forced
        else jnp.zeros((1, 1, 1), jnp.int32)
    )
    out, vhc_out, logits = pl.pallas_call(
        kern,
        in_specs=[smem] + [vmem] * 4 + [smem] + [vmem] * 18,
        out_specs=[vmem, vmem, vmem],
        out_shape=[
            jax.ShapeDtypeStruct((s2, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((L, B, s2, br), f32),
            jax.ShapeDtypeStruct((s2, B, K) if forced else (1, 1, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, B, s2, br), f32),
            pltpu.VMEM((B, s2, C), f32),
            pltpu.VMEM((L, B, max(ws - 1, 1), br), f32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(i1, jnp.int32).reshape(1),
        stacked["w1"], stacked["wk"], stacked["w3sk"], stacked["skb2"],
        stacked["sc"],
        stacked["hw1"], stacked["herf"], stacked["herfb"], stacked["hwk"],
        stacked["hw3sk"], stacked["hskb2"],
        d2h_row.astype(f32), d2w_row.astype(f32), cnd_row.astype(f32),
        dfin_row.astype(f32), sprev_row.astype(f32), vhc.astype(f32),
        stacked["w_in"], stacked["b_in"], stacked["w_out"], stacked["b_out"],
        gumbel.astype(f32), fop,
    )
    if forced:
        return out[:, 0].T, vhc_out, logits.transpose(1, 0, 2)
    return out[:, 0].T, vhc_out  # (s2, 1, B) -> (B, s2)


def gumbel_row(rng, b: int, s2: int, k: int):
    """Replicate the XLA voxel loop's key sequence for one row: per voxel
    ``rng, sub = split(rng)`` then categorical's own gumbel draw of shape
    (B, K). Returns (rng_after, (s2, B, K) gumbel)."""

    def f(r, _):
        r, sub = jax.random.split(r)
        return r, sub

    rng, subs = jax.lax.scan(f, rng, None, length=s2)
    g = jax.vmap(lambda s: jax.random.gumbel(s, (b, k)))(subs)  # (s2, B, K)
    return rng, g


__all__ = ["row_decode", "stack_row_weights", "gumbel_row"]
