"""Stack-resident Pallas megakernel for CAUSAL 3-stream resblock stacks.

The published top-level prior (PixelCNN, 50 mask-'B' blocks x model_dim 16
over the 128x128x32 code grid — reference slurm-jobs/train_pixelcnn_top.job,
block math reference pixel_model/layers.py:338-497) is the stage-2 analog of
the stage-1 deep stacks: tiny channels over half a million voxels. The
block-space lax.scan (ops/causal_stack.py) fixed the lane-padding tax
(540 -> 386 ms/step on v5e) but its per-op trace is still ~90% async-copy /
slice / copy: every intermediate of every block round-trips HBM through
XLA's pad/slice fusions.

This kernel runs the ENTIRE mask-'B' segment as ONE pallas_call — the
stage-2 counterpart of ops/stack_kernel.py. The causal architecture is
mapped onto a SINGLE union stream:

  * the three causal streams concatenate on lanes (X = [d|h|w], 3*C8
    lanes); per-stream 1x1 convs become block-diagonal matrices, and the
    ExpandRF cross-stream mixing (reference layers.py:225-248) FOLDS INTO
    the first matrix as a lower-block-triangular factor — one MXU dot
    replaces four, and every elementwise op runs once on dense lanes
    instead of three times on 32-lane (128-padded) tensors;
  * the three per-stream causal convolutions (asymmetric FRONT-only pads,
    ops/causal_stack.py::causal_conv_pads) become ONE union-tap conv:
    each stream's folded kernel embeds block-diagonally at tap offsets
    shifted by the pad difference — 18 tap dots instead of 26, exact;
  * a SINGLE fused depth-chunk sweep per block: each chunk keeps a
    (chunk+1)-row sliding window of the padded conv input with one CARRY
    row for the causal depth tap; the backward sweeps depth in REVERSE
    with a carry row of the cotangent (the transposed causal conv looks
    one row ahead);
  * the condition branch streams from HBM per chunk with its weight
    pre-concatenated ([wc|wc|wc]) so the add and its gradients are single
    dots; the cross-block condition cotangent accumulates in a resident
    scratch (same bf16 precision as the scan path's backward carry).

IO follows the streaming-io design proven in stack_kernel.py: volume-sized
operands live in HBM (memory_space ANY) and move by explicit async DMA
(lane dims must be 128-multiples — gated), per-block inputs are saved
chunk-by-chunk (the DMA overlaps the chunk's compute and is fenced before
the in-place residual write), and the backward recomputes each block's
forward from its saved inputs.

All weight combinations (block-diagonal embedding, ExpandRF factor, union
kernel) are TRACED functions of the folded parameters, so the custom VJP's
combined-weight cotangents map back to the parameter tree by autodiff —
checkpoints and the torch converter are untouched. Equals
ops/causal_stack.py::apply_causal_stack at dropout 0 (the published top
config trains at dropout 0); tested in interpret mode against the scan in
tests/test_causal_kernel.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae3d_tpu.ops.fused_block import (
    _contract_voxels,
    _dot_last,
    _dot_last_t,
    _elu,
    _elu_grad,
)
from vqvae3d_tpu.ops.stack_kernel import _chunked, _read_scalars

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=117 * 1024 * 1024)

# Depth-chunk for the fused sweeps. The sliding-window scratches are tiny,
# so the constraint is chunk fp32 temps (Mosaic spill mass). Measured on
# v5e at the published top config (union layout): 4 fits with margin.
_CHUNK = int(os.environ.get("VQVAE3D_CAUSAL_CHUNK", "4"))

# Union conv geometry: tap extents and fwd front/back pads per axis for
# kernel_size=3 (the only size the reference uses). Every stream's folded
# causal kernel embeds at offsets (k + 1 - lo_s) per axis — see
# pack_causal_union.
_UTAPS = (2, 3, 3)
_UPADS = ((1, 0), (1, 1), (1, 1))
_UPADS_BWD = tuple((hi, lo) for lo, hi in _UPADS)


def _sumvec(x):
    """(T, H, W, C) -> (C,) fp32 per-lane sum."""
    c = x.shape[-1]
    return jnp.sum(x.astype(jnp.float32).reshape(-1, c), axis=0)


def _start_all(copies):
    for cp in copies:
        cp.start()


def _wait_all(copies):
    for cp in copies:
        cp.wait()


def _conv_taps(win_ref, wu_ref, z0, cs, h, w, transposed):
    """Union tap-sum conv producing cs owned rows from the sliding window.

    Window rows hold the padded conv input at depth rows [z0 - 1 + k] for
    k in [0, cs] (row 0 = carry; forward) or the cotangent at rows
    [z0 + k] for k in [0, cs] (row cs = lookahead carry; transposed) — in
    both cases tap j0 of out row t reads window row t + j0, and the H/W
    offsets are the tap indices themselves (front pads 1 each way).
    """
    j0n, j1n, j2n = _UTAPS
    cb = wu_ref.shape[-1]
    acc = jnp.zeros((cs, h, w, cb), jnp.float32)
    for j0 in range(j0n):
        for j1 in range(j1n):
            for j2 in range(j2n):
                v = win_ref[pl.ds(z0 + j0, cs), j1 : j1 + h, j2 : j2 + w, :]
                if transposed:
                    wt = wu_ref[0, j0n - 1 - j0, j1n - 1 - j1, j2n - 1 - j2]
                    dn = (((3,), (1,)), ((), ()))
                else:
                    wt = wu_ref[0, j0, j1, j2]
                    dn = (((3,), (0,)), ((), ()))
                acc += jax.lax.dot_general(
                    v, wt, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
    return acc


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    x_hbm,  # (B, D, H, W, Cu) ANY — lane-concat [d|h|w] streams
    cond_hbm,  # (B, D, H, W, C8c) ANY (dummy when has_cond=False)
    mk_ref,  # (1, 1, Cb): per-(block, sample) 0/1 channel-dropout keep mask
    w1_ref,  # (1, Cu, Cb): block-diag w1 @ ExpandRF factor
    be_ref,  # (1, 1, Cb)
    wu_ref,  # (1, 2, 3, 3, Cb, Cb): union conv kernel
    w3_ref,  # (1, Cb, Cu): block-diag w3
    wc_ref,  # (1, C8c, Cb): [wc|wc|wc] (dummy when has_cond=False)
    bc_ref,  # (1, 1, Cb)
    sc_ref,  # (1, 1, 8) SMEM
    save_hbm,  # (NB, B, D, H, W, Cu) ANY — or None (primal)
    y_hbm,  # (B, D, H, W, Cu) ANY
    xv,  # VMEM (D, H, W, Cu): resident union stream
    win,  # VMEM (chunk+1, H+2, W+2, Cb): a2 sliding window
    condw,  # VMEM (chunk, H, W, C8c)
    in_sem, save_sem, out_sem, cond_sem,
    *,
    has_cond,
    dropout_p,
    nb,
    chunk,
):
    i = pl.program_id(1)
    bi = pl.program_id(0)
    d, h, w, _ = xv.shape
    dt = xv.dtype
    f32 = jnp.float32

    @pl.when((i == 0) & (bi == 0))
    def _():
        win[:] = jnp.zeros_like(win)  # borders zero forever

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm.at[bi], xv, in_sem)
        cp.start()
        cp.wait()

    # causal front-pad row: reset the depth carry at each block
    win[0] = jnp.zeros_like(win[0])

    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)
    be = be_ref[0, 0].astype(dt)

    def body(z0, cs, acc):
        rows = pl.ds(z0, cs)
        if save_hbm is not None:
            cp = pltpu.make_async_copy(
                xv.at[rows], save_hbm.at[i, bi, rows], save_sem
            )
            cp.start()
        xc = xv[rows]
        a1 = _elu(xc + b1a) + b1b
        e = _dot_last(a1, w1_ref[0], dt) + be
        a2 = _elu(e + b2a) + b2b
        win[pl.ds(1, cs), 1 : 1 + h, 1 : 1 + w, :] = a2
        conv = _conv_taps(win, wu_ref, 0, cs, h, w, False)
        if dropout_p > 0:
            # torch Dropout3d after the causal conv (reference
            # pixel_model/layers.py:445; scan analog causal_stack.py::
            # _channel_dropout_folded): zero dropped channels, divide kept
            # ones by (1-p) — the same x/(1-p) op as the scan for exactness.
            # Rank-4 mask view: Mosaic's layout pass crashes on rank-1
            # operands broadcast into rank-4 ops.
            mk4 = mk_ref[0].astype(f32).reshape(1, 1, 1, mk_ref.shape[-1])
            conv = jnp.where(mk4 > 0, conv / (1.0 - dropout_p), 0.0)
        if has_cond:
            ccp = pltpu.make_async_copy(
                cond_hbm.at[bi, rows], condw.at[pl.ds(0, cs)], cond_sem
            )
            ccp.start()
            ccp.wait()
            conv = conv + jax.lax.dot_general(
                condw[pl.ds(0, cs)],
                wc_ref[0],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + bc_ref[0, 0].astype(f32)
        a3 = _elu(conv.astype(dt) + b3a) + b3b
        u3 = _dot_last(a3, w3_ref[0], dt)
        if save_hbm is not None:
            cp.wait()
        xv[rows] = u3 * scale + b4 + xc
        win[0] = win[cs]  # depth carry for the next chunk
        return acc

    _chunked(d, chunk, body, 0)

    @pl.when(i == nb - 1)
    def _():
        cp = pltpu.make_async_copy(xv, y_hbm.at[bi], out_sem)
        cp.start()
        cp.wait()


def _fwd_kernel_nosave(
    x_hbm, cond_hbm, mk_ref,
    w1_ref, be_ref, wu_ref, w3_ref, wc_ref, bc_ref, sc_ref,
    y_hbm,
    xv, win, condw,
    in_sem, save_sem, out_sem, cond_sem,
    *, has_cond, dropout_p, nb, chunk,
):
    _fwd_kernel(
        x_hbm, cond_hbm, mk_ref,
        w1_ref, be_ref, wu_ref, w3_ref, wc_ref, bc_ref, sc_ref,
        None, y_hbm,
        xv, win, condw,
        in_sem, save_sem, out_sem, cond_sem,
        has_cond=has_cond, dropout_p=dropout_p, nb=nb, chunk=chunk,
    )


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _chunked_rev(total: int, ch: int, fn, init):
    """Like stack_kernel._chunked but sweeping depth in REVERSE chunk order
    (the static tail — the highest rows — first, then full chunks
    descending). ``fn(z0, cs, acc)``."""
    n_full, rem = divmod(total, ch)
    acc = init
    if rem:
        acc = fn(n_full * ch, rem, acc)
    if n_full:
        acc = jax.lax.fori_loop(
            0, n_full, lambda t, a: fn((n_full - 1 - t) * ch, ch, a), acc
        )
    return acc


def _bwd_kernel(
    save_hbm,  # (NB, B, D, H, W, Cu) ANY
    gy_hbm,  # (B, D, H, W, Cu) ANY
    cond_hbm,  # (B, D, H, W, C8c) ANY
    mk_ref,  # (1, 1, Cb) 0/1 keep mask (reverse block order)
    w1_ref, be_ref, wu_ref, w3_ref, wc_ref, bc_ref, sc_ref,
    dx_hbm,  # (B, D, H, W, Cu) ANY
    dw1_ref,  # (1, 1, Cu, Cb) f32 per-block
    dbe_ref,  # (1, 1, 1, Cb)
    dwu_ref,  # (1, 1, 2, 3, 3, Cb, Cb)
    dw3_ref,  # (1, 1, Cb, Cu)
    dwc_ref,  # (1, 1, C8c, Cb)
    dbc_ref,  # (1, 1, 1, Cb)
    dsc_ref,  # (1, 1, 1, 8)
    gcond_hbm,  # (B, D, H, W, C8c) ANY: Σ_blocks g_c · wcᵀ — the one
    #             cross-block gradient, accumulated in gcacc (dt precision —
    #             the same bf16 carry the scan path's backward uses)
    gv,  # VMEM (D, H, W, Cu): resident cotangent
    awin,  # VMEM (chunk+1, H+2, W+2, Cb): recomputed a2 window
    gwin,  # VMEM (chunk+1, H+2, W+2, Cb): g_c window (carry at row
    #        ``chunk``: the reverse sweep looks one row AHEAD)
    gcacc,  # VMEM (D, H, W, C8c)
    xw,  # VMEM (chunk+1, H, W, Cu): saved-input window (row 0 = z0-1)
    condw,  # VMEM (chunk, H, W, C8c)
    gy_sem, save_sem, dx_sem, cond_sem,
    *,
    has_cond,
    dropout_p,
    nb,
    chunk,
):
    i = pl.program_id(1)
    bi = pl.program_id(0)
    d, h, w, cu = gv.shape
    cb = awin.shape[-1]
    dt = gv.dtype
    f32 = jnp.float32

    @pl.when((i == 0) & (bi == 0))
    def _():
        awin[:] = jnp.zeros_like(awin)
        gwin[:] = jnp.zeros_like(gwin)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(gy_hbm.at[bi], gv, gy_sem)
        cp.start()
        cp.wait()
        if has_cond:
            gcacc[:] = jnp.zeros_like(gcacc)

    # per-block reset: the TOP chunk's carry row (g_c[D] = back pad) must
    # be zero; every other window row is rewritten before it is read
    cs_first = d % chunk or chunk
    gwin[cs_first] = jnp.zeros_like(gwin[cs_first])

    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)
    be = be_ref[0, 0].astype(dt)

    def read_saved(z0, cs):
        """Saved x rows [z0-1, z0+cs) into xw rows [0, cs]; row 0 is
        garbage at z0 == 0 (its a2 is overwritten with the causal zero
        pad below)."""
        cp = pltpu.make_async_copy(
            save_hbm.at[nb - 1 - i, bi, pl.ds(z0, cs)],
            xw.at[pl.ds(1, cs)],
            save_sem,
        )
        cp.start()

        @pl.when(jnp.asarray(z0) > 0)
        def _():
            cp2 = pltpu.make_async_copy(
                save_hbm.at[nb - 1 - i, bi, pl.ds(z0 - 1, 1)],
                xw.at[pl.ds(0, 1)],
                save_sem,
            )
            cp2.start()
            cp2.wait()

        cp.wait()
        return xw[pl.ds(0, cs + 1)]

    def body(z0, cs, acc):
        (dw1a, dbea, dwua, dw3a, d_b1a, d_b1b, d_b2a, d_b2b,
         d_b3a, d_b3b, d_b4, d_scale, dwca, dbca) = acc
        rows = pl.ds(z0, cs)
        # recompute a2 rows [z0-1, z0+cs) (window rows [0, cs])
        xcw = read_saved(z0, cs)
        a1w = _elu(xcw + b1a) + b1b
        ew = _dot_last(a1w, w1_ref[0], dt) + be
        a2w = _elu(ew + b2a) + b2b
        awin[pl.ds(0, cs + 1), 1 : 1 + h, 1 : 1 + w, :] = a2w

        @pl.when(jnp.asarray(z0) == 0)
        def _():
            awin[0] = jnp.zeros_like(awin[0])

        conv = _conv_taps(awin, wu_ref, 0, cs, h, w, False)
        if dropout_p > 0:
            mk4 = mk_ref[0].astype(f32).reshape(1, 1, 1, mk_ref.shape[-1])
            conv = jnp.where(mk4 > 0, conv / (1.0 - dropout_p), 0.0)
        cond_c = None
        if has_cond:
            ccp = pltpu.make_async_copy(
                cond_hbm.at[bi, rows], condw.at[pl.ds(0, cs)], cond_sem
            )
            ccp.start()
            ccp.wait()
            cond_c = condw[pl.ds(0, cs)]
            conv = conv + jax.lax.dot_general(
                cond_c,
                wc_ref[0],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + bc_ref[0, 0].astype(f32)
        a3 = _elu(conv.astype(dt) + b3a) + b3b
        u3 = _dot_last(a3, w3_ref[0], dt)
        g = gv[rows]
        g_u3 = g * scale
        g_a3 = _dot_last_t(g_u3, w3_ref[0], dt)
        g_c = g_a3 * _elu_grad(conv.astype(dt) + b3a)
        if dropout_p > 0:
            # cotangent entering the conv OUTPUT (pre-dropout): masked +
            # rescaled; the unmasked g_c keeps feeding b3a / condition
            # grads (the condition adds AFTER dropout)
            mk4 = mk_ref[0].astype(f32).reshape(1, 1, 1, mk_ref.shape[-1])
            g_cm = jnp.where(
                mk4 > 0, g_c.astype(f32) / (1.0 - dropout_p), 0.0
            ).astype(dt)
        else:
            g_cm = g_c
        gwin[pl.ds(0, cs), 1 : 1 + h, 1 : 1 + w, :] = g_cm
        dw3a = dw3a + _contract_voxels(a3, g_u3)
        d_scale += jnp.sum(g.astype(f32) * u3.astype(f32))
        d_b4 += jnp.sum(g.astype(f32))
        d_b3a += jnp.sum(g_c.astype(f32))
        d_b3b += jnp.sum(g_a3.astype(f32))
        if has_cond:
            gcacc[rows] = gcacc[rows] + _dot_last_t(g_c, wc_ref[0], dt)
            dwca = dwca + _contract_voxels(cond_c, g_c)
            dbca = dbca + _sumvec(g_c)

        # transposed union conv + early grads + union dW taps
        gacc = _conv_taps(gwin, wu_ref, 0, cs, h, w, True)
        g_a2 = gacc.astype(dt)
        eo = ew[1 : 1 + cs]
        g_e = g_a2 * _elu_grad(eo + b2a)
        d_b2a += jnp.sum(g_e.astype(f32))
        d_b2b += jnp.sum(g_a2.astype(f32))
        dbea = dbea + _sumvec(g_e)
        dw1a = dw1a + _contract_voxels(a1w[1 : 1 + cs], g_e)
        g_a1 = _dot_last_t(g_e, w1_ref[0], dt)
        g_x = g_a1 * _elu_grad(xcw[1 : 1 + cs] + b1a)
        d_b1a += jnp.sum(g_x.astype(f32))
        d_b1b += jnp.sum(g_a1.astype(f32))
        gv[rows] = gv[rows] + g_x

        guc = gwin[pl.ds(0, cs), 1 : 1 + h, 1 : 1 + w, :]
        taps = []
        for j0 in range(_UTAPS[0]):
            for j1 in range(_UTAPS[1]):
                for j2 in range(_UTAPS[2]):
                    v = awin[pl.ds(j0, cs), j1 : j1 + h, j2 : j2 + w, :]
                    taps.append(_contract_voxels(v, guc))
        dwua = dwua + jnp.stack(taps)
        # reverse-sweep carry: the earlier chunk's transposed conv looks
        # one row past its top — this chunk's bottom g_c row
        gwin[chunk] = gwin[0]
        return (
            dw1a, dbea, dwua, dw3a,
            d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale,
            dwca, dbca,
        )

    zero = jnp.zeros((), f32)
    c8c = condw.shape[-1]
    ntaps = _UTAPS[0] * _UTAPS[1] * _UTAPS[2]
    acc0 = (
        jnp.zeros((cu, cb), f32),
        jnp.zeros((cb,), f32),
        jnp.zeros((ntaps, cb, cb), f32),
        jnp.zeros((cb, cu), f32),
        zero, zero, zero, zero, zero, zero, zero, zero,
        jnp.zeros((c8c, cb), f32),
        jnp.zeros((cb,), f32),
    )
    (dw1a, dbea, dwua, dw3a, d_b1a, d_b1b, d_b2a, d_b2b,
     d_b3a, d_b3b, d_b4, d_scale, dwca, dbca) = _chunked_rev(
        d, chunk, body, acc0
    )

    dw1_ref[0, 0] = dw1a
    dbe_ref[0, 0, 0] = dbea
    dwu_ref[0, 0] = dwua.reshape(*_UTAPS, cb, cb)
    dw3_ref[0, 0] = dw3a
    dwc_ref[0, 0] = dwca
    dbc_ref[0, 0, 0] = dbca
    dsc_ref[0, 0, 0] = jnp.stack(
        [d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale]
    )

    @pl.when(i == nb - 1)
    def _():
        cps = [pltpu.make_async_copy(gv, dx_hbm.at[bi], dx_sem)]
        if has_cond:
            cps.append(
                pltpu.make_async_copy(gcacc, gcond_hbm.at[bi], dx_sem)
            )
        _start_all(cps)
        _wait_all(cps)


# ---------------------------------------------------------------------------
# Wrapper: custom VJP over the combined (traced) weight stacks
# ---------------------------------------------------------------------------


def _weight_specs(cu, cb, c8c, nb, reverse):
    ix = (lambda bi, i: nb - 1 - i) if reverse else (lambda bi, i: i)
    return [
        pl.BlockSpec((1, cu, cb), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec((1, 1, cb), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec(
            (1, *_UTAPS, cb, cb), lambda bi, i: (ix(bi, i), 0, 0, 0, 0, 0)
        ),
        pl.BlockSpec((1, cb, cu), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec((1, c8c, cb), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec((1, 1, cb), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec(
            (1, 1, 8),
            lambda bi, i: (ix(bi, i), 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]


def _scratch_shapes(d, h, w, cu, cb, c8c, dt, chunk, backward):
    out = [
        pltpu.VMEM((d, h, w, cu), dt),  # resident stream / cotangent
        pltpu.VMEM((chunk + 1, h + 2, w + 2, cb), dt),  # a2 window
    ]
    if backward:
        out += [
            pltpu.VMEM((chunk + 1, h + 2, w + 2, cb), dt),  # g_c window
            pltpu.VMEM((d, h, w, c8c), dt),  # gcacc
            pltpu.VMEM((chunk + 1, h, w, cu), dt),  # saved-x window
        ]
    out += [pltpu.VMEM((chunk, h, w, c8c), dt)]
    out += [pltpu.SemaphoreType.DMA] * 4
    return out


def _mask_spec(nb, cb, reverse):
    """BlockSpec for the (NB, B, Cb) channel-dropout keep mask: one
    (block, sample) row per grid step."""
    if reverse:
        return pl.BlockSpec((1, 1, cb), lambda bi, i: (nb - 1 - i, bi, 0))
    return pl.BlockSpec((1, 1, cb), lambda bi, i: (i, bi, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def causal_stack_fused(static, x, cond, mask, w1, be, wu, w3, wc, bc, sc):
    """Run NB causal mask-'B' blocks on the lane-concat folded streams with
    the union volume VMEM-resident across the whole stack.

    static: (has_cond, dropout_p, interpret). x: (B, D, H, W, 3*C8) — the
    folded depth/height/width streams concatenated on lanes. cond: (B, D,
    H, W, C8c) folded condition embedding (dummy (B,1,1,1,c) when has_cond
    is False). mask: (NB, B, Cb) 0/1 channel-dropout keep decisions in the
    union lane order (dummy (NB, B, 1)-broadcastable zeros when dropout_p
    is 0) — streamed in as DATA, no in-kernel PRNG needed, because torch
    Dropout3d masks are per-(sample, channel) only (reference
    pixel_model/layers.py:445). Weights are the combined per-block stacks
    from ``pack_causal_union``. Equals scanning
    ops/causal_stack.py::causal_preact_block_folded at the same dropout.

    The primal call runs a no-saves kernel; only the VJP forward pays the
    per-block save traffic.
    """
    return _fwd_impl(
        static, x, cond, mask, w1, be, wu, w3, wc, bc, sc, False
    )[0]


def _fwd_impl(static, x, cond, mask, w1, be, wu, w3, wc, bc, sc, saves):
    has_cond, dropout_p, interpret = static
    b, d, h, w, cu = x.shape
    nb, _, cb = w1.shape
    c8c = cond.shape[-1]
    dt = x.dtype
    chunk = _CHUNK
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = (
        [any_spec] * 2
        + [_mask_spec(nb, cb, False)]
        + _weight_specs(cu, cb, c8c, nb, False)
    )
    kern = functools.partial(
        _fwd_kernel if saves else _fwd_kernel_nosave,
        has_cond=has_cond, dropout_p=dropout_p, nb=nb, chunk=chunk,
    )
    vol = jax.ShapeDtypeStruct((b, d, h, w, cu), dt)
    out_specs = ([any_spec] if saves else []) + [any_spec]
    out_shape = (
        [jax.ShapeDtypeStruct((nb, b, d, h, w, cu), dt)] if saves else []
    ) + [vol]
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_scratch_shapes(
            d, h, w, cu, cb, c8c, dt, chunk, backward=False
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        x, cond, _mask_operand(mask, nb, b, cb, dt),
        w1.astype(dt), be.astype(dt), wu.astype(dt), w3.astype(dt),
        wc.astype(dt), bc.astype(dt),
        sc.astype(jnp.float32).reshape(nb, 1, 8),
    )
    if saves:
        return (out[1], out[0])
    return (out[0], None)


def _mask_operand(mask, nb, b, cb, dt):
    """Broadcast the mask to the kernel's (NB, B, Cb) layout (the dummy
    passed at dropout 0 is (NB, B, 1))."""
    return jnp.broadcast_to(mask.astype(dt), (nb, b, cb))


def _fwd_rule(static, x, cond, mask, w1, be, wu, w3, wc, bc, sc):
    y, saved = _fwd_impl(
        static, x, cond, mask, w1, be, wu, w3, wc, bc, sc, True
    )
    return y, (saved, cond, mask, w1, be, wu, w3, wc, bc, sc)


def _bwd_rule(static, res, gy):
    has_cond, dropout_p, interpret = static
    saved, cond, mask, w1, be, wu, w3, wc, bc, sc = res
    nb, b, d, h, w, cu = saved.shape
    cb = w1.shape[-1]
    c8c = cond.shape[-1]
    dt = gy.dtype
    chunk = _CHUNK
    f32 = jnp.float32
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = (
        [any_spec] * 3
        + [_mask_spec(nb, cb, True)]
        + _weight_specs(cu, cb, c8c, nb, True)
    )

    def rev(extra):
        return lambda bi, i: (bi, nb - 1 - i) + (0,) * extra

    dw_out_specs = [
        pl.BlockSpec((1, 1, cu, cb), rev(2)),
        pl.BlockSpec((1, 1, 1, cb), rev(2)),
        pl.BlockSpec((1, 1, *_UTAPS, cb, cb), rev(5)),
        pl.BlockSpec((1, 1, cb, cu), rev(2)),
        pl.BlockSpec((1, 1, c8c, cb), rev(2)),
        pl.BlockSpec((1, 1, 1, cb), rev(2)),
        pl.BlockSpec((1, 1, 1, 8), rev(2)),
    ]
    dw_out_shape = [
        jax.ShapeDtypeStruct((b, nb, cu, cb), f32),
        jax.ShapeDtypeStruct((b, nb, 1, cb), f32),
        jax.ShapeDtypeStruct((b, nb, *_UTAPS, cb, cb), f32),
        jax.ShapeDtypeStruct((b, nb, cb, cu), f32),
        jax.ShapeDtypeStruct((b, nb, c8c, cb), f32),
        jax.ShapeDtypeStruct((b, nb, 1, cb), f32),
        jax.ShapeDtypeStruct((b, nb, 1, 8), f32),
    ]
    vol = jax.ShapeDtypeStruct((b, d, h, w, cu), dt)
    out = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            has_cond=has_cond, dropout_p=dropout_p, nb=nb, chunk=chunk,
        ),
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=[any_spec] + dw_out_specs + [any_spec],
        out_shape=[vol] + dw_out_shape + [jax.ShapeDtypeStruct(cond.shape, dt)],
        scratch_shapes=_scratch_shapes(
            d, h, w, cu, cb, c8c, dt, chunk, backward=True
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        saved, gy, cond, _mask_operand(mask, nb, b, cb, dt),
        w1.astype(dt), be.astype(dt), wu.astype(dt), w3.astype(dt),
        wc.astype(dt), bc.astype(dt),
        sc.astype(jnp.float32).reshape(nb, 1, 8),
    )
    dx, dw1, dbe, dwu, dw3, dwc, dbc, dsc, gcond = out
    g_cond = gcond.astype(cond.dtype) if has_cond else jnp.zeros_like(cond)

    def sb(a):
        return a.sum(axis=0)  # batch-summed weight grads

    return (
        dx, g_cond,
        jnp.zeros_like(mask),  # dropout mask: non-differentiable data
        sb(dw1).astype(w1.dtype),
        sb(dbe).reshape(be.shape).astype(be.dtype),
        sb(dwu).astype(wu.dtype), sb(dw3).astype(w3.dtype),
        sb(dwc).astype(wc.dtype),
        sb(dbc).reshape(bc.shape).astype(bc.dtype),
        sb(dsc).reshape(sc.shape).astype(sc.dtype),
    )


causal_stack_fused.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Packing + gate
# ---------------------------------------------------------------------------


def _blockdiag3(ws):
    """3 x (A, B) -> (3A, 3B) block-diagonal."""
    a, b = ws[0].shape
    out = jnp.zeros((3 * a, 3 * b), ws[0].dtype)
    for s, wm in enumerate(ws):
        out = out.at[s * a : (s + 1) * a, s * b : (s + 1) * b].set(wm)
    return out


def pack_causal_union(folded):
    """Combine ONE block's folded params (fold_causal_block_params output,
    vmap over blocks outside) into the union-stream kernel layout:

      W1e = blockdiag(w1_d, w1_h, w1_w) @ M   — M is the ExpandRF factor
            ([[I, wd2h, wd2w], [0, I, wh2w], [0, 0, I]] blockwise), so the
            per-stream bottleneck projection AND the cross-stream mixing
            are one matrix;
      be  = [0 | b_d2h | b_d2w + b_h2w];
      WU  = union causal kernel: stream s's folded (J0,J1,J2) kernel at
            block-diagonal lanes and tap offsets (k + 1 - lo_s) per axis
            (exactly compensating its pad difference vs the union pads);
      W3  = blockdiag(w3_d, w3_h, w3_w);
      wc/bc = [wc|wc|wc], [bc|bc|bc] (the condition adds to every stream).

    All traced — autodiff maps the combined-weight cotangents back to the
    parameter tree.
    """
    w1f, ef, w2f, condf, w3f, scalars = folded
    cb8 = w1f[0].shape[-1]
    dtw = w1f[0].dtype
    w_d2h, b_d2h, w_d2w, b_d2w, w_h2w, b_h2w = ef

    eye = jnp.eye(cb8, dtype=dtw)
    m = jnp.zeros((3 * cb8, 3 * cb8), dtw)
    for s in range(3):
        m = m.at[s * cb8 : (s + 1) * cb8, s * cb8 : (s + 1) * cb8].set(eye)
    m = m.at[0:cb8, cb8 : 2 * cb8].set(w_d2h)
    m = m.at[0:cb8, 2 * cb8 :].set(w_d2w)
    m = m.at[cb8 : 2 * cb8, 2 * cb8 :].set(w_h2w)
    w1 = _blockdiag3(w1f) @ m
    be = jnp.concatenate(
        [jnp.zeros_like(b_d2h), b_d2h, b_d2w + b_h2w]
    ).reshape(1, 3 * cb8)

    cb = 3 * cb8
    wu = jnp.zeros((*_UTAPS, cb, cb), dtw)
    w2d, w2h, w2w = w2f
    wu = wu.at[:, :, :, 0:cb8, 0:cb8].set(w2d)
    wu = wu.at[1, 0:2, :, cb8 : 2 * cb8, cb8 : 2 * cb8].set(w2h[0])
    wu = wu.at[1, 1, 0:2, 2 * cb8 :, 2 * cb8 :].set(w2w[0, 0])
    w3 = _blockdiag3(w3f)
    sc = jnp.concatenate([s.astype(jnp.float32) for s in scalars], axis=-1)
    if condf is not None:
        wc0, bc0 = condf
        wc = jnp.concatenate([wc0] * 3, axis=-1)
        bc = jnp.concatenate([bc0] * 3, axis=-1)
    else:
        # dummies (has_cond is static at the call site: condf presence)
        wc = jnp.zeros((8, cb), dtw)
        bc = jnp.zeros((cb,), dtw)
    return w1, be, wu, w3, wc, bc.reshape(1, cb), sc


def _vmem_estimate(d, h, w, cu, cb, c8c, itemsize):
    """Backward high-water estimate (bytes) at PHYSICAL sizes (lanes round
    to 128, sublanes to 8)."""

    def rup(n, m):
        return -(-n // m) * m

    def lanes(c):
        return rup(c, 128)

    res = d * h * rup(w, 8) * lanes(cu) * itemsize
    wins = 2 * (_CHUNK + 1) * (h + 2) * rup(w + 2, 8) * lanes(cb) * itemsize
    xw = (_CHUNK + 1) * h * rup(w, 8) * lanes(cu) * itemsize
    gcacc = d * h * rup(w, 8) * lanes(c8c) * itemsize
    condw = _CHUNK * h * rup(w, 8) * lanes(c8c) * itemsize
    return res + wins + xw + gcacc + condw


_SCRATCH_CAP = 92 * 1024 * 1024  # temp/spill allowance


def causal_fused_ok(
    shape, dtype, cb8: int, c8c: int, kernel_size: int = 3
) -> bool:
    """Gate: folded per-stream (B, D, H, W, C8) shapes the kernel can take
    (the union volume is 3*C8 lanes). Manual-DMA lane constraint, VMEM
    high-water, the k=3 tap tables, and a minimum size below which the
    scan path's overhead doesn't matter anyway."""
    if os.environ.get("VQVAE3D_CAUSAL_KERNEL", "1") == "0":
        return False
    if kernel_size != 3:
        return False
    b, d, h, w, c8 = shape
    cu = 3 * c8
    if cu % 128 or cb8 % 8 or (c8c and c8c % 128):
        return False
    if d < 2 * _CHUNK or d * h * w * c8 < 2 * 1024 * 1024:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return _vmem_estimate(d, h, w, cu, 3 * cb8, c8c, itemsize) <= _SCRATCH_CAP


__all__ = ["causal_stack_fused", "pack_causal_union", "causal_fused_ok"]
