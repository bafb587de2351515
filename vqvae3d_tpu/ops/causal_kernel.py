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
stage-2 counterpart of ops/stack_kernel.py, with differences forced by the
causal architecture:

  * THREE resident activation volumes (the depth/height/width causal
    streams) instead of one, plus the ExpandRF cross-stream 1x1 adds
    (reference layers.py:217-250) computed chunk-locally between them;
  * per-stream CAUSAL convolutions: each stream's folded k-conv
    (ops/causal_stack.py::causal_conv_pads -> s2d_conv.stride1_block_kernel)
    has asymmetric FRONT-only padding on its own axis;
  * a SINGLE fused depth-chunk sweep per block instead of stack_kernel's
    separate whole-volume phases. The bottleneck (Cb8 = 32) tensors pad to
    128 physical lanes in VMEM, so full-volume pad scratches would need
    ~26 MB x6 — instead each chunk keeps a (chunk+1)-row sliding window of
    the padded conv input (one CARRY row serves the causal depth tap) and
    the backward sweeps depth in REVERSE with a carry row of the cotangent
    (the transposed causal conv looks one row ahead);
  * an additive CONDITION branch (per-block 1x1 from the level-above
    embedding): the folded condition volume streams from HBM one chunk at
    a time, and its cross-block cotangent is emitted as a per-block record
    (one blocked output) contracted against the per-block condition
    weights OUTSIDE the kernel — the only stack-wide gradient that cannot
    be accumulated per grid step.

IO follows the streaming-io design proven in stack_kernel.py: volume-sized
operands live in HBM (memory_space ANY) and move by explicit async DMA
(lane dims must be 128-multiples — gated), per-block stream inputs are
saved chunk-by-chunk (the DMA overlaps the chunk's compute and is fenced
before the in-place residual write), and the backward recomputes each
block's forward from its saved inputs.

Equals ops/causal_stack.py::apply_causal_stack at dropout 0 (the published
top config trains at dropout 0); tested in interpret mode against the scan
in tests/test_causal_kernel.py. Parameter tree unaffected: weights arrive
as the traced folded stacks, so autodiff maps the folded-weight cotangents
back through the embedding transforms.
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

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)

# Depth-chunk for the fused sweeps. The sliding-window scratches are tiny
# ((chunk+1) x (H+2) x (W+2) x Cb8), so unlike stack_kernel._STREAM_CHUNK
# the constraint is chunk fp32 temps, not scratch residency.
_CHUNK = 2

# Per-stream folded conv geometry (kernel tap extents and fwd front/back
# pads per axis) for kernel_size=3 — the only size the reference uses.
# ops/causal_stack.py::causal_conv_pads composed with stride1_block_kernel
# keeps these shapes/pads verbatim in 2x block space.
_TAPS = ((2, 3, 3), (1, 2, 3), (1, 1, 2))  # (depth, height, width) streams
_FWD_PADS = (
    ((1, 0), (1, 1), (1, 1)),
    ((0, 0), (1, 0), (1, 1)),
    ((0, 0), (0, 0), (1, 0)),
)
# backward (transposed-conv) pads swap (lo, hi) per axis
_BWD_PADS = tuple(tuple((hi, lo) for lo, hi in pads) for pads in _FWD_PADS)


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


def _conv_from_window(win_ref, w2_ref, cs, h, w, s, front_pads, transposed):
    """Tap-sum conv producing cs owned rows from a sliding-window scratch.

    win_ref rows hold the (H/W-padded) conv input at depth rows
    [z0 - 1 + k] for k in [0, cs] (row 0 = carry); the value at union
    coordinates (k, 1, 1) is input row z0 - 1 + k. front_pads are the
    conv's per-axis FRONT pads (fwd: causal lo; transposed: swapped hi):
    tap (j0, j1, j2) of out row t reads union row t + j0 + 1 - f0 and
    H/W offsets j + 1 - f.
    """
    j0n, j1n, j2n = _TAPS[s]
    f0, f1, f2 = front_pads
    cb8 = win_ref.shape[-1]
    acc = jnp.zeros((cs, h, w, cb8), jnp.float32)
    for j0 in range(j0n):
        for j1 in range(j1n):
            for j2 in range(j2n):
                v = win_ref[
                    pl.ds(j0 + 1 - f0, cs),
                    j1 + 1 - f1 : j1 + 1 - f1 + h,
                    j2 + 1 - f2 : j2 + 1 - f2 + w,
                    :,
                ]
                if transposed:
                    wt = w2_ref[0, j0n - 1 - j0, j1n - 1 - j1, j2n - 1 - j2]
                    dn = (((3,), (1,)), ((), ()))
                else:
                    wt = w2_ref[0, j0, j1, j2]
                    dn = (((3,), (0,)), ((), ()))
                acc += jax.lax.dot_general(
                    v, wt, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
    return acc


# The _conv_from_window row formula assumes the chunk's window starts at
# union row 1; the dynamic row slice pl.ds must therefore start at the
# chunk-relative offset. We slice at (j0 + 1 - f0) + 0 because callers
# always write the current chunk's rows at window rows [1, cs] and the
# carry at row 0 — i.e. the window is chunk-relative, not volume-relative.


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    xd_hbm, xh_hbm, xw_hbm,  # (B, D, H, W, C8) ANY
    cond_hbm,  # (B, D, H, W, C8c) ANY (dummy when has_cond=False)
    w1_ref,  # (1, 3, C8, Cb8)
    we_ref,  # (1, 3, Cb8, Cb8): d2h, d2w, h2w
    be_ref,  # (1, 3, Cb8)
    w2d_ref, w2h_ref, w2w_ref,  # (1, J0, J1, J2, Cb8, Cb8)
    w3_ref,  # (1, 3, Cb8, C8)
    wc_ref,  # (1, C8c, Cb8) (dummy when has_cond=False)
    bc_ref,  # (1, 1, Cb8)
    sc_ref,  # (1, 1, 8) SMEM
    save_hbm,  # (NB, B, 3, D, H, W, C8) ANY — or None (primal)
    yd_hbm, yh_hbm, yw_hbm,  # (B, D, H, W, C8) ANY
    xv,  # VMEM (3, D, H, W, C8): resident streams
    ad, ah, aw,  # VMEM (chunk+1, H+2, W+2, Cb8): a2 sliding windows
    condw,  # VMEM (chunk, H, W, C8c) condition chunk window
    in_sem, save_sem, out_sem, cond_sem,
    *,
    has_cond,
    nb,
    chunk,
):
    i = pl.program_id(1)
    bi = pl.program_id(0)
    _, d, h, w, _ = xv.shape
    dt = xv.dtype
    f32 = jnp.float32
    wins = (ad, ah, aw)
    w2refs = (w2d_ref, w2h_ref, w2w_ref)

    @pl.when((i == 0) & (bi == 0))
    def _():
        # union-window borders are zero forever; interiors rewritten
        for p in wins:
            p[:] = jnp.zeros_like(p)

    @pl.when(i == 0)
    def _():
        cps = [
            pltpu.make_async_copy(src.at[bi], xv.at[s], in_sem)
            for s, src in enumerate((xd_hbm, xh_hbm, xw_hbm))
        ]
        _start_all(cps)
        _wait_all(cps)

    # causal front-pad rows: reset the depth carry at each block
    for p in wins:
        p[0] = jnp.zeros_like(p[0])

    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)
    w1 = [w1_ref[0, s] for s in range(3)]
    w3 = [w3_ref[0, s] for s in range(3)]
    wd2h, wd2w, wh2w = (we_ref[0, k] for k in range(3))
    bd2h, bd2w, bh2w = (be_ref[0, k].astype(dt) for k in range(3))

    def body(z0, cs, acc):
        rows = pl.ds(z0, cs)
        if save_hbm is not None:
            saves = [
                pltpu.make_async_copy(
                    xv.at[s, rows],
                    save_hbm.at[i, bi, s, rows],
                    save_sem,
                )
                for s in range(3)
            ]
            _start_all(saves)
        xc = [xv[s, rows] for s in range(3)]
        a1 = [_elu(x + b1a) + b1b for x in xc]
        u1 = [_dot_last(a1[s], w1[s], dt) for s in range(3)]
        e = (
            u1[0],
            u1[1] + _dot_last(u1[0], wd2h, dt) + bd2h,
            u1[2]
            + _dot_last(u1[1], wh2w, dt)
            + bh2w
            + _dot_last(u1[0], wd2w, dt)
            + bd2w,
        )
        for s in range(3):
            a2 = _elu(e[s] + b2a) + b2b
            wins[s][pl.ds(1, cs), 1 : 1 + h, 1 : 1 + w, :] = a2
        cnd = None
        if has_cond:
            cp = pltpu.make_async_copy(
                cond_hbm.at[bi, rows], condw.at[pl.ds(0, cs)], cond_sem
            )
            cp.start()
            cp.wait()
            cnd = jax.lax.dot_general(
                condw[pl.ds(0, cs)],
                wc_ref[0],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + bc_ref[0, 0].astype(f32)
        outs = []
        for s in range(3):
            conv = _conv_from_window(
                wins[s], w2refs[s], cs, h, w, s,
                tuple(p[0] for p in _FWD_PADS[s]), False,
            )
            if cnd is not None:
                conv = conv + cnd
            a3 = _elu(conv.astype(dt) + b3a) + b3b
            outs.append(_dot_last(a3, w3[s], dt))
        if save_hbm is not None:
            _wait_all(saves)
        for s in range(3):
            xv[s, rows] = outs[s] * scale + b4 + xv[s, rows]
            # depth carry: last a2 row of this chunk pads the next chunk
            wins[s][0] = wins[s][cs]
        return acc

    _chunked(d, chunk, body, 0)

    @pl.when(i == nb - 1)
    def _():
        cps = [
            pltpu.make_async_copy(xv.at[s], dst.at[bi], out_sem)
            for s, dst in enumerate((yd_hbm, yh_hbm, yw_hbm))
        ]
        _start_all(cps)
        _wait_all(cps)


def _fwd_kernel_nosave(
    xd_hbm, xh_hbm, xw_hbm, cond_hbm,
    w1_ref, we_ref, be_ref, w2d_ref, w2h_ref, w2w_ref, w3_ref,
    wc_ref, bc_ref, sc_ref,
    yd_hbm, yh_hbm, yw_hbm,
    xv, ad, ah, aw, condw,
    in_sem, save_sem, out_sem, cond_sem,
    *, has_cond, nb, chunk,
):
    _fwd_kernel(
        xd_hbm, xh_hbm, xw_hbm, cond_hbm,
        w1_ref, we_ref, be_ref, w2d_ref, w2h_ref, w2w_ref, w3_ref,
        wc_ref, bc_ref, sc_ref,
        None, yd_hbm, yh_hbm, yw_hbm,
        xv, ad, ah, aw, condw,
        in_sem, save_sem, out_sem, cond_sem,
        has_cond=has_cond, nb=nb, chunk=chunk,
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
    save_hbm,  # (NB, B, 3, D, H, W, C8) ANY
    gyd_hbm, gyh_hbm, gyw_hbm,  # (B, D, H, W, C8) ANY
    cond_hbm,  # (B, D, H, W, C8c) ANY
    w1_ref, we_ref, be_ref, w2d_ref, w2h_ref, w2w_ref, w3_ref,
    wc_ref, bc_ref, sc_ref,
    dxd_hbm, dxh_hbm, dxw_hbm,  # (B, D, H, W, C8) ANY
    dw1_ref,  # (1, 1, 3, C8, Cb8) f32 per-block
    dwe_ref,  # (1, 1, 3, Cb8, Cb8)
    dbe_ref,  # (1, 1, 3, Cb8)
    dw2d_ref, dw2h_ref, dw2w_ref,  # (1, 1, J0, J1, J2, Cb8, Cb8)
    dw3_ref,  # (1, 1, 3, Cb8, C8)
    dwc_ref,  # (1, 1, C8c, Cb8)
    dbc_ref,  # (1, 1, 1, Cb8)
    dsc_ref,  # (1, 1, 1, 8)
    gcond_hbm,  # (B, D, H, W, C8c) ANY: Σ_blocks (Σ_streams g_c)·wcᵀ — the
    #             one cross-block gradient, accumulated in the resident
    #             gcacc scratch (dt precision — the same bf16 carry the
    #             scan path's backward uses) and DMA'd out once
    gv,  # VMEM (3, D, H, W, C8): resident cotangents
    ad, ah, aw,  # VMEM (chunk+1, H+2, W+2, Cb8): recomputed a2 windows
    gd, gh, gw,  # VMEM (chunk+1, H+2, W+2, Cb8): g_c windows (carry at row
    #              ``chunk``: the reverse sweep looks one row AHEAD)
    gcacc,  # VMEM (D, H, W, C8c): resident condition-cotangent accumulator
    xw,  # VMEM (3, chunk+1, H, W, C8): saved-input windows (row 0 = z0-1)
    condw,  # VMEM (chunk, H, W, C8c)
    gy_sem, save_sem, dx_sem, cond_sem,
    *,
    has_cond,
    nb,
    chunk,
):
    i = pl.program_id(1)
    bi = pl.program_id(0)
    _, d, h, w, c8 = gv.shape
    cb8 = ad.shape[-1]
    dt = gv.dtype
    f32 = jnp.float32
    awins = (ad, ah, aw)
    gwins = (gd, gh, gw)
    w2refs = (w2d_ref, w2h_ref, w2w_ref)

    @pl.when((i == 0) & (bi == 0))
    def _():
        for p in awins + gwins:
            p[:] = jnp.zeros_like(p)

    @pl.when(i == 0)
    def _():
        cps = [
            pltpu.make_async_copy(src.at[bi], gv.at[s], gy_sem)
            for s, src in enumerate((gyd_hbm, gyh_hbm, gyw_hbm))
        ]
        _start_all(cps)
        _wait_all(cps)
        if has_cond:
            gcacc[:] = jnp.zeros_like(gcacc)

    # per-block reset: the TOP chunk's carry row (g_c[D] = back pad) must
    # be zero; every other window row is rewritten before it is read
    cs_first = d % chunk or chunk
    for p in gwins:
        p[cs_first] = jnp.zeros_like(p[cs_first])

    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)
    w1 = [w1_ref[0, s] for s in range(3)]
    w3 = [w3_ref[0, s] for s in range(3)]
    wd2h, wd2w, wh2w = (we_ref[0, k] for k in range(3))
    bd2h, bd2w, bh2w = (be_ref[0, k].astype(dt) for k in range(3))

    def read_saved(z0, cs):
        """Saved x rows [z0-1, z0+cs) into xw rows [0, cs]; row 0 is
        garbage at z0 == 0 (its a2 is overwritten with the causal zero
        pad below)."""
        cps = [
            pltpu.make_async_copy(
                save_hbm.at[nb - 1 - i, bi, s, pl.ds(z0, cs)],
                xw.at[s, pl.ds(1, cs)],
                save_sem,
            )
            for s in range(3)
        ]
        _start_all(cps)

        @pl.when(jnp.asarray(z0) > 0)
        def _():
            cps2 = [
                pltpu.make_async_copy(
                    save_hbm.at[nb - 1 - i, bi, s, pl.ds(z0 - 1, 1)],
                    xw.at[s, pl.ds(0, 1)],
                    save_sem,
                )
                for s in range(3)
            ]
            _start_all(cps2)
            _wait_all(cps2)

        _wait_all(cps)
        return [xw[s, pl.ds(0, cs + 1)] for s in range(3)]

    def expand_rf(u1):
        return (
            u1[0],
            u1[1] + _dot_last(u1[0], wd2h, dt) + bd2h,
            u1[2]
            + _dot_last(u1[1], wh2w, dt)
            + bh2w
            + _dot_last(u1[0], wd2w, dt)
            + bd2w,
        )

    def body(z0, cs, acc):
        (dw1a, dwea, dbea, dw2a, dw3a, d_b1a, d_b1b, d_b2a, d_b2b,
         d_b3a, d_b3b, d_b4, d_scale, dwca, dbca) = acc
        rows = pl.ds(z0, cs)
        # recompute a2 rows [z0-1, z0+cs) (window rows [0, cs])
        xcw = read_saved(z0, cs)
        a1w = [_elu(x + b1a) + b1b for x in xcw]
        u1w = [_dot_last(a1w[s], w1[s], dt) for s in range(3)]
        ew = expand_rf(u1w)
        for s in range(3):
            a2 = _elu(ew[s] + b2a) + b2b
            awins[s][pl.ds(0, cs + 1), 1 : 1 + h, 1 : 1 + w, :] = a2

        @pl.when(jnp.asarray(z0) == 0)
        def _():
            for s in range(3):
                awins[s][0] = jnp.zeros_like(awins[s][0])

        cnd = None
        cond_c = None
        if has_cond:
            cp = pltpu.make_async_copy(
                cond_hbm.at[bi, rows], condw.at[pl.ds(0, cs)], cond_sem
            )
            cp.start()
            cp.wait()
            cond_c = condw[pl.ds(0, cs)]
            cnd = jax.lax.dot_general(
                cond_c,
                wc_ref[0],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + bc_ref[0, 0].astype(f32)

        # late half: conv recompute -> g_c per stream -> g windows
        gcnd = jnp.zeros((cs, h, w, cb8), f32)
        dw3n = []
        for s in range(3):
            conv = _conv_from_window(
                awins[s], w2refs[s], cs, h, w, s,
                tuple(p[0] for p in _FWD_PADS[s]), False,
            )
            if cnd is not None:
                conv = conv + cnd
            a3 = _elu(conv.astype(dt) + b3a) + b3b
            u3 = _dot_last(a3, w3[s], dt)
            g = gv[s, rows]
            g_u3 = g * scale
            g_a3 = _dot_last_t(g_u3, w3[s], dt)
            g_c = g_a3 * _elu_grad(conv.astype(dt) + b3a)
            gwins[s][pl.ds(0, cs), 1 : 1 + h, 1 : 1 + w, :] = g_c
            dw3n.append(dw3a[s] + _contract_voxels(a3, g_u3))
            d_scale += jnp.sum(g.astype(f32) * u3.astype(f32))
            d_b4 += jnp.sum(g.astype(f32))
            d_b3a += jnp.sum(g_c.astype(f32))
            d_b3b += jnp.sum(g_a3.astype(f32))
            gcnd = gcnd + g_c.astype(f32)
        dw3a = tuple(dw3n)
        if has_cond:
            gc = gcnd.astype(dt)
            gcacc[rows] = gcacc[rows] + _dot_last_t(gc, wc_ref[0], dt)
            dwca = dwca + _contract_voxels(cond_c, gc)
            dbca = dbca + _sumvec(gcnd)

        # transposed convs + ExpandRF backward + early grads + dw2 taps.
        # The g_c windows hold rows [z0, z0+cs] at window rows [0, cs]
        # (row cs = carry from the later chunk); the transposed-conv
        # window formula expects the value at union row 1 to be input row
        # z0 - 1 + 1 = z0 — which is row 0 here, so shift by viewing the
        # window as starting one row earlier: front pad f0' = f0 + 1.
        g_e = []
        for s in range(3):
            f0, f1, f2 = (p[0] for p in _BWD_PADS[s])
            gacc = _conv_from_window(
                gwins[s], w2refs[s], cs, h, w, s, (f0 + 1, f1, f2), True
            )
            g_a2 = gacc.astype(dt)
            # e rows [z0, z0+cs) are window rows [1, cs+1) of ew
            g_es = g_a2 * _elu_grad(ew[s][1 : 1 + cs] + b2a)
            d_b2a += jnp.sum(g_es.astype(f32))
            d_b2b += jnp.sum(g_a2.astype(f32))
            g_e.append(g_es)
        g_u1 = (
            g_e[0]
            + _dot_last_t(g_e[1], wd2h, dt)
            + _dot_last_t(g_e[2], wd2w, dt),
            g_e[1] + _dot_last_t(g_e[2], wh2w, dt),
            g_e[2],
        )
        u1o = [u1w[s][1 : 1 + cs] for s in range(3)]
        a1o = [a1w[s][1 : 1 + cs] for s in range(3)]
        xco = [xcw[s][1 : 1 + cs] for s in range(3)]
        dwea = (
            dwea[0] + _contract_voxels(u1o[0], g_e[1]),
            dwea[1] + _contract_voxels(u1o[0], g_e[2]),
            dwea[2] + _contract_voxels(u1o[1], g_e[2]),
        )
        dbea = (
            dbea[0] + _sumvec(g_e[1]),
            dbea[1] + _sumvec(g_e[2]),
            dbea[2] + _sumvec(g_e[2]),
        )
        dw1n, dw2n = [], []
        for s in range(3):
            g_a1 = _dot_last_t(g_u1[s], w1[s], dt)
            g_x = g_a1 * _elu_grad(xco[s] + b1a)
            d_b1a += jnp.sum(g_x.astype(f32))
            d_b1b += jnp.sum(g_a1.astype(f32))
            dw1n.append(dw1a[s] + _contract_voxels(a1o[s], g_u1[s]))
            gv[s, rows] = gv[s, rows] + g_x
            # dw2 taps: a2 window shifted taps ⊗ owned g_c rows
            guc = gwins[s][pl.ds(0, cs), 1 : 1 + h, 1 : 1 + w, :]
            (l0, _), (l1, _), (l2, _) = _FWD_PADS[s]
            j0n, j1n, j2n = _TAPS[s]
            taps = []
            for j0 in range(j0n):
                for j1 in range(j1n):
                    for j2 in range(j2n):
                        v = awins[s][
                            pl.ds(j0 + 1 - l0, cs),
                            j1 + 1 - l1 : j1 + 1 - l1 + h,
                            j2 + 1 - l2 : j2 + 1 - l2 + w,
                            :,
                        ]
                        taps.append(_contract_voxels(v, guc))
            dw2n.append(dw2a[s] + jnp.stack(taps))
            # reverse-sweep carry: the earlier chunk's transposed conv
            # looks one row past its top — this chunk's bottom g_c row
            gwins[s][chunk] = gwins[s][0]
        return (
            tuple(dw1n), dwea, dbea, tuple(dw2n), dw3a,
            d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale,
            dwca, dbca,
        )

    zero = jnp.zeros((), f32)
    c8c = condw.shape[-1]
    acc0 = (
        tuple(jnp.zeros((c8, cb8), f32) for _ in range(3)),
        tuple(jnp.zeros((cb8, cb8), f32) for _ in range(3)),
        tuple(jnp.zeros((cb8,), f32) for _ in range(3)),
        tuple(
            jnp.zeros((t0 * t1 * t2, cb8, cb8), f32) for t0, t1, t2 in _TAPS
        ),
        tuple(jnp.zeros((cb8, c8), f32) for _ in range(3)),
        zero, zero, zero, zero, zero, zero, zero, zero,
        jnp.zeros((c8c, cb8), f32),
        jnp.zeros((cb8,), f32),
    )
    (dw1a, dwea, dbea, dw2a, dw3a, d_b1a, d_b1b, d_b2a, d_b2b,
     d_b3a, d_b3b, d_b4, d_scale, dwca, dbca) = _chunked_rev(
        d, chunk, body, acc0
    )

    dw1_ref[0, 0] = jnp.stack(dw1a)
    dwe_ref[0, 0] = jnp.stack(dwea)
    dbe_ref[0, 0] = jnp.stack(dbea)
    for s, ref in enumerate((dw2d_ref, dw2h_ref, dw2w_ref)):
        t0, t1, t2 = _TAPS[s]
        ref[0, 0] = dw2a[s].reshape(t0, t1, t2, cb8, cb8)
    dw3_ref[0, 0] = jnp.stack(dw3a)
    dwc_ref[0, 0] = dwca
    dbc_ref[0, 0, 0] = dbca
    dsc_ref[0, 0, 0] = jnp.stack(
        [d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale]
    )

    @pl.when(i == nb - 1)
    def _():
        cps = [
            pltpu.make_async_copy(gv.at[s], dst.at[bi], dx_sem)
            for s, dst in enumerate((dxd_hbm, dxh_hbm, dxw_hbm))
        ]
        if has_cond:
            cps.append(
                pltpu.make_async_copy(gcacc, gcond_hbm.at[bi], dx_sem)
            )
        _start_all(cps)
        _wait_all(cps)


# ---------------------------------------------------------------------------
# Wrapper: custom VJP over the folded parameter stacks
# ---------------------------------------------------------------------------


def _weight_specs(c8, cb8, c8c, nb, reverse):
    """Blocked weight streams, indexed by the grid's block dim (forward
    order or reversed for the backward sweep)."""
    ix = (lambda bi, i: nb - 1 - i) if reverse else (lambda bi, i: i)
    return [
        pl.BlockSpec((1, 3, c8, cb8), lambda bi, i: (ix(bi, i), 0, 0, 0)),
        pl.BlockSpec((1, 3, cb8, cb8), lambda bi, i: (ix(bi, i), 0, 0, 0)),
        pl.BlockSpec((1, 3, cb8), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec(
            (1, *_TAPS[0], cb8, cb8),
            lambda bi, i: (ix(bi, i), 0, 0, 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, *_TAPS[1], cb8, cb8),
            lambda bi, i: (ix(bi, i), 0, 0, 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, *_TAPS[2], cb8, cb8),
            lambda bi, i: (ix(bi, i), 0, 0, 0, 0, 0),
        ),
        pl.BlockSpec((1, 3, cb8, c8), lambda bi, i: (ix(bi, i), 0, 0, 0)),
        pl.BlockSpec((1, c8c, cb8), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec((1, 1, cb8), lambda bi, i: (ix(bi, i), 0, 0)),
        pl.BlockSpec(
            (1, 1, 8),
            lambda bi, i: (ix(bi, i), 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]


def _scratch_shapes(d, h, w, c8, cb8, c8c, dt, chunk, backward):
    res = pltpu.VMEM((3, d, h, w, c8), dt)  # streams / cotangents
    win = lambda: [  # noqa: E731
        pltpu.VMEM((chunk + 1, h + 2, w + 2, cb8), dt) for _ in range(3)
    ]
    out = [res] + win()
    if backward:
        out += win()
        out += [pltpu.VMEM((d, h, w, c8c), dt)]  # gcacc
        out += [pltpu.VMEM((3, chunk + 1, h, w, c8), dt)]
    out += [pltpu.VMEM((chunk, h, w, c8c), dt)]
    out += [pltpu.SemaphoreType.DMA] * 4
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def causal_stack_fused(
    static, xd, xh, xw, cond, w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc
):
    """Run NB causal mask-'B' blocks on folded 3-stream activations with the
    streams VMEM-resident across the whole stack.

    static: (has_cond, interpret). xd/xh/xw: (B, D, H, W, C8) folded streams.
    cond: (B, D, H, W, C8c) folded condition embedding (dummy (B,1,1,1,c)
    when has_cond=False). Weights are the per-block folded stacks packed by
    ``pack_causal_params``. Equals scanning
    ops/causal_stack.py::causal_preact_block_folded at dropout 0.

    The primal call runs a no-saves kernel; only the VJP forward pays the
    per-block save traffic.
    """
    return _fwd_impl(
        static, xd, xh, xw, cond,
        w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc, saves=False,
    )[0]


def _fwd_impl(
    static, xd, xh, xw, cond, w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc,
    saves,
):
    has_cond, interpret = static
    b, d, h, w, c8 = xd.shape
    nb, _, _, cb8 = w1.shape
    c8c = cond.shape[-1]
    dt = xd.dtype
    chunk = _CHUNK
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] * 4 + _weight_specs(c8, cb8, c8c, nb, False)
    kern = functools.partial(
        _fwd_kernel if saves else _fwd_kernel_nosave,
        has_cond=has_cond, nb=nb, chunk=chunk,
    )
    vol = jax.ShapeDtypeStruct((b, d, h, w, c8), dt)
    out_specs = ([any_spec] if saves else []) + [any_spec] * 3
    out_shape = (
        [jax.ShapeDtypeStruct((nb, b, 3, d, h, w, c8), dt)] if saves else []
    ) + [vol, vol, vol]
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_scratch_shapes(
            d, h, w, c8, cb8, c8c, dt, chunk, backward=False
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        xd, xh, xw, cond,
        w1.astype(dt), we.astype(dt), be.astype(dt),
        w2d.astype(dt), w2h.astype(dt), w2w.astype(dt), w3.astype(dt),
        wc.astype(dt), bc.astype(dt),
        sc.astype(jnp.float32).reshape(nb, 1, 8),
    )
    if saves:
        return (tuple(out[1:4]), out[0])
    return (tuple(out[0:3]), None)


def _fwd_rule(
    static, xd, xh, xw, cond, w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc
):
    ys, saved = _fwd_impl(
        static, xd, xh, xw, cond,
        w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc, saves=True,
    )
    return ys, (saved, cond, w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc)


def _bwd_rule(static, res, gys):
    has_cond, interpret = static
    saved, cond, w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc = res
    gyd, gyh, gyw = gys
    nb, b, _, d, h, w, c8 = saved.shape
    cb8 = w1.shape[-1]
    c8c = cond.shape[-1]
    dt = gyd.dtype
    chunk = _CHUNK
    f32 = jnp.float32
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] * 5 + _weight_specs(c8, cb8, c8c, nb, True)

    def rev(extra):
        return lambda bi, i: (bi, nb - 1 - i) + (0,) * extra

    dw_out_specs = [
        pl.BlockSpec((1, 1, 3, c8, cb8), rev(3)),
        pl.BlockSpec((1, 1, 3, cb8, cb8), rev(3)),
        pl.BlockSpec((1, 1, 3, cb8), rev(2)),
        pl.BlockSpec((1, 1, *_TAPS[0], cb8, cb8), rev(5)),
        pl.BlockSpec((1, 1, *_TAPS[1], cb8, cb8), rev(5)),
        pl.BlockSpec((1, 1, *_TAPS[2], cb8, cb8), rev(5)),
        pl.BlockSpec((1, 1, 3, cb8, c8), rev(3)),
        pl.BlockSpec((1, 1, c8c, cb8), rev(2)),
        pl.BlockSpec((1, 1, 1, cb8), rev(2)),
        pl.BlockSpec((1, 1, 1, 8), rev(2)),
    ]
    dw_out_shape = [
        jax.ShapeDtypeStruct((b, nb, 3, c8, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, 3, cb8, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, 3, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, *_TAPS[0], cb8, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, *_TAPS[1], cb8, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, *_TAPS[2], cb8, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, 3, cb8, c8), f32),
        jax.ShapeDtypeStruct((b, nb, c8c, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, 1, cb8), f32),
        jax.ShapeDtypeStruct((b, nb, 1, 8), f32),
    ]
    vol = jax.ShapeDtypeStruct((b, d, h, w, c8), dt)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, has_cond=has_cond, nb=nb, chunk=chunk),
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=[any_spec] * 3 + dw_out_specs + [any_spec],
        out_shape=[vol, vol, vol]
        + dw_out_shape
        + [jax.ShapeDtypeStruct(cond.shape, dt)],
        scratch_shapes=_scratch_shapes(
            d, h, w, c8, cb8, c8c, dt, chunk, backward=True
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        saved, gyd, gyh, gyw, cond,
        w1.astype(dt), we.astype(dt), be.astype(dt),
        w2d.astype(dt), w2h.astype(dt), w2w.astype(dt), w3.astype(dt),
        wc.astype(dt), bc.astype(dt),
        sc.astype(jnp.float32).reshape(nb, 1, 8),
    )
    (dxd, dxh, dxw, dw1, dwe, dbe, dw2d, dw2h, dw2w, dw3, dwc, dbc, dsc,
     gcond) = out
    g_cond = gcond.astype(cond.dtype) if has_cond else jnp.zeros_like(cond)

    def sb(a):
        return a.sum(axis=0)  # batch-summed weight grads

    return (
        dxd, dxh, dxw, g_cond,
        sb(dw1).astype(w1.dtype), sb(dwe).astype(we.dtype),
        sb(dbe).astype(be.dtype),
        sb(dw2d).astype(w2d.dtype), sb(dw2h).astype(w2h.dtype),
        sb(dw2w).astype(w2w.dtype), sb(dw3).astype(w3.dtype),
        sb(dwc).astype(wc.dtype),
        sb(dbc).reshape(nb, cb8).astype(bc.dtype),
        sb(dsc).reshape(nb, 8).astype(sc.dtype),
    )


causal_stack_fused.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Packing + gate
# ---------------------------------------------------------------------------


def pack_causal_params(folded):
    """Pack vmapped fold_causal_block_params output into the kernel's
    argument layout. Returns (w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc,
    has_cond); dummies for wc/bc when unconditioned."""
    w1f, ef, w2f, condf, w3f, scalars = folded
    w1 = jnp.stack(w1f, axis=1)  # (NB, 3, C8, Cb8)
    w_d2h, b_d2h, w_d2w, b_d2w, w_h2w, b_h2w = ef
    we = jnp.stack([w_d2h, w_d2w, w_h2w], axis=1)
    be = jnp.stack([b_d2h, b_d2w, b_h2w], axis=1)
    w2d, w2h, w2w = w2f
    w3 = jnp.stack(w3f, axis=1)
    sc = jnp.concatenate([s.astype(jnp.float32) for s in scalars], axis=-1)
    nb, _, _, cb8 = w1.shape
    if condf is not None:
        wc, bc = condf
        bc = bc.reshape(nb, 1, cb8)
        has_cond = True
    else:
        wc = jnp.zeros((nb, 8, cb8), w1.dtype)
        bc = jnp.zeros((nb, 1, cb8), w1.dtype)
        has_cond = False
    return w1, we, be, w2d, w2h, w2w, w3, wc, bc, sc, has_cond


def _vmem_estimate(d, h, w, c8, cb8, c8c, itemsize):
    """Backward high-water estimate (bytes) at PHYSICAL sizes (lanes round
    to 128, sublanes to 8): resident cotangents + the 6 sliding windows +
    saved-x windows + the resident condition-cotangent accumulator."""

    def rup(n, m):
        return -(-n // m) * m

    def lanes(c):
        return rup(c, 128)

    res = 3 * d * h * rup(w, 8) * lanes(c8) * itemsize
    wins = 6 * (_CHUNK + 1) * (h + 2) * rup(w + 2, 8) * lanes(cb8) * itemsize
    xw = 3 * (_CHUNK + 1) * h * rup(w, 8) * lanes(c8) * itemsize
    gcacc = d * h * rup(w, 8) * lanes(c8c) * itemsize
    condw = _CHUNK * h * rup(w, 8) * lanes(c8c) * itemsize
    return res + wins + xw + gcacc + condw


_SCRATCH_CAP = 92 * 1024 * 1024  # chunk-2 temp/spill allowance


def causal_fused_ok(
    shape, dtype, cb8: int, c8c: int, kernel_size: int = 3
) -> bool:
    """Gate: folded (B, D, H, W, C8) causal streams the kernel can take.

    Manual-DMA lane constraint (stream and condition lanes must be 128
    multiples), VMEM high-water, the k=3 tap tables, and a minimum size
    below which the scan path's overhead doesn't matter anyway."""
    if os.environ.get("VQVAE3D_CAUSAL_KERNEL", "1") == "0":
        return False
    if kernel_size != 3:
        return False
    b, d, h, w, c8 = shape
    if c8 % 128 or cb8 % 8 or (c8c and c8c % 128):
        return False
    if d < 2 * _CHUNK or d * h * w * c8 < 2 * 1024 * 1024:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return _vmem_estimate(d, h, w, c8, cb8, c8c, itemsize) <= _SCRATCH_CAP


__all__ = ["causal_stack_fused", "pack_causal_params", "causal_fused_ok"]
