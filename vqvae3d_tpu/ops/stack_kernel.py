"""Stack-resident Pallas megakernel: an ENTIRE 'same'-resblock stack in one
pallas_call, the activation volume resident in VMEM across all blocks.

The 'same' PreActFixup stacks (reference vqvae/layers.py:102-216, applied
150× per level in the published downscaled config) run on tiny code-grid
volumes — e.g. the 256-res decoder level-0 stack is (32,32,16)×144 lanes in
2× block space = 4.7 MB bf16. Per-block approaches (XLA scan body, or the
per-block fused kernel in ops/fused_block.py) are OVERHEAD-bound there:
measured ~0.8-1.4 ms per block against ~0.1 ms of MXU work + ~40 µs of HBM
traffic, spent in per-call glue, slab halo rebuilds and tiny-shape dots.

This kernel amortizes all of it: grid = (batch, n_blocks); the activation
lives in a VMEM scratch with depth-halo rows, each grid step applies ONE
whole block (elu → 1×1×1 → elu → k3 'same' wrap/zeros → elu → 1×1×1 →
scale/bias/residual) to the full resident volume and updates it in place.
HBM traffic for the whole stack: the input volume once, per-block weights
(auto double-buffered BlockSpec streams), one saved block-input per block
(the rematerialization residual for backward), and the output volume once.

Backward mirrors it: grid sweeps blocks in REVERSE with the cotangent
resident in VMEM; each step re-loads that block's saved input, recomputes
the forward intermediates, and produces per-block weight/scalar grads
(written per grid step through block-indexed out specs — no cross-step
accumulation races) plus the chained input cotangent in place.

The backward is organized as THREE depth-chunked phases (recompute →
cotangent-of-conv → transposed conv + weight grads) with the cross-phase
intermediates (u1, pad(a2), g_u2c, pad(g_u2c)) held in persistent bf16
VMEM scratch. A straight-line whole-volume formulation keeps ~15
volume-sized values live at once and the Mosaic register allocator
spills them: at the real 256-res shape it wanted 138 MB of spill slots
on top of the buffers and exceeded physical VMEM. Chunking bounds every
fp32 temporary to ``_CHUNK`` depth rows, which both fits VMEM and
compiles orders of magnitude faster.

Math is identical to ops/s2d_conv.py::preact_fixup_same_block (and thus to
the stock NDHWC block): weights arrive as the block-space-embedded stacks,
so the parameter tree and the torch-checkpoint converter are untouched —
JAX autodiff maps the embedded-weight cotangents back through the traced
embedding transforms.

Gated by ``stack_fused_supported`` to volumes small enough that every
buffer fits VMEM comfortably (the published 256-res stacks; the 512-res
level-0 stack at 18.9 MB stays on the per-block paths for now).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae3d_tpu.ops.fused_block import (
    _elu,
    _elu_grad,
    _contract_voxels,
    _dot_last,
    _dot_last_t,
    _fill_hw_pad,
)

# Whole-volume temps (full-size a1/u1/a2/acc + io double buffers) peak near
# ~80-100 MB at the 8 MB volume cap; v5e has 128 MB of physical VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _read_scalars(sc_ref, dt):
    # sc_ref: (1, 1, 8) SMEM block (the stack is shipped as (NB, 1, 8) so
    # the trailing block dims equal the array dims — a Mosaic requirement)
    return [sc_ref[0, 0, i].astype(dt) for i in range(8)]


# Depth-chunk size for every compute phase: all whole-volume math runs in
# lax.fori_loop chunks of depth rows with the cross-phase values in
# persistent VMEM scratch. A straight-line whole-volume formulation (or even
# a python-unrolled chunking) lets Mosaic's scheduler interleave everything
# and the register allocator spills ~100 MB of live volume-sized values to
# scoped VMEM — past the 128 MB physical limit at the real 256-res shapes.
# fori_loop bodies are hard scheduling barriers: live set = one chunk.
_CHUNK = 8

# Streaming-path chunk. The backward phases keep many fp32 chunk temps
# live and Mosaic spills them to scoped VMEM; measured on v5e at the
# 512-res level-0 geometries (256 lanes, scratches 85-87 MB), the spill
# mass saturates near ~35-40 MB for chunk ≥ 4 regardless of row size
# (chunk 4/5/8 all exceed the 128 MB physical VMEM; chunk 2 fits with
# margin in both bf16 and f32). A fixed chunk of 2 keeps the per-chunk
# dots MXU-sized (≥2·H·W rows) and is the only setting proven safe at the
# shapes this path exists for.
_STREAM_CHUNK = 2


def _chunked(total: int, ch: int, fn, init):
    """Run ``acc = fn(z0, cs, acc)`` over [0, total) in depth chunks: full
    ``ch``-row chunks via lax.fori_loop (one compiled body, bounded live
    set), plus one static tail chunk when ``ch`` doesn't divide ``total``.
    ``fn`` may write to refs; ``z0`` is traced in the loop, static in the
    tail."""
    n_full, rem = divmod(total, ch)
    acc = init
    if n_full:
        acc = jax.lax.fori_loop(0, n_full, lambda t, a: fn(t * ch, ch, a), acc)
    if rem:
        acc = fn(n_full * ch, rem, acc)
    return acc


def _fill_hw_pad_rows(pad_ref, a, z0, wrap: bool):
    """Write rows [z0, z0+T) of pad_ref (·, H+2, W+2, C) from a (T, H, W, C)
    chunk, with circular (or, pre-zeroed, zero) padding on the H/W axes."""
    T, H, W, _ = a.shape
    rows = pl.ds(z0, T)
    pad_ref[rows, 1 : H + 1, 1 : W + 1, :] = a
    if wrap:
        pad_ref[rows, 1 : H + 1, 0, :] = a[:, :, W - 1]
        pad_ref[rows, 1 : H + 1, W + 1, :] = a[:, :, 0]
        pad_ref[rows, 0, :, :] = pad_ref[rows, H, :, :]
        pad_ref[rows, H + 1, :, :] = pad_ref[rows, 1, :, :]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_body(
    xv,  # VMEM scratch (D+2, H, W, C8): resident activation + D-halo rows
    pad_s,  # VMEM scratch (D+2, H+2, W+2, Cb8)
    w1_ref,  # (1, C8, Cb8)
    w2_ref,  # (1, 3, 3, 3, Cb8, Cb8)
    w3_ref,  # (1, Cb8, C8)
    sc_ref,  # (1, 1, 8) SMEM
    *,
    wrap,
    dt,
    chunk=_CHUNK,
    before_update=None,  # callback run after phase F1, before xv is written
    fill_halos=True,  # False: caller DMA'd real neighbor rows into xv[0]/[T+1]
    row0=0,  # global index of the first OWNED row (tiled mode)
    total_d=None,  # global depth (defaults to the resident D)
    first_step_pred=None,  # zeros-mode pad_s init predicate (tiled grids)
):
    """Apply ONE block to the resident activation in place (phases F1+F2).

    The caller has already placed the block input in xv rows [1, T+1) and
    handled saves/io; ``before_update`` lets the streaming wrapper fence its
    save DMA (which reads xv) against F2's in-place writes. In tiled mode
    (fill_halos=False) xv holds a T-row window of a total_d-row volume whose
    halo rows the caller loaded; 'zeros' masking then keys on GLOBAL row
    indices (row0 + local − 1 outside [0, total_d))."""
    i = pl.program_id(1)
    D = xv.shape[0] - 2  # owned rows in this window (the full depth when
    #                      resident/streaming; the tile size when tiled)
    H, W = xv.shape[1], xv.shape[2]
    cb8 = pad_s.shape[-1]
    f32 = jnp.float32
    if total_d is None:
        total_d = D

    if fill_halos:
        # depth halo rows (recomputed per block from the resident volume)
        if wrap:
            xv[0] = xv[D]
            xv[D + 1] = xv[1]
        else:
            xv[0] = jnp.zeros_like(xv[0])
            xv[D + 1] = jnp.zeros_like(xv[D + 1])

    if not wrap:
        # only interiors are rewritten per step; borders must start zero
        if first_step_pred is None:
            first_step_pred = (i == 0) & (pl.program_id(0) == 0)

        @pl.when(first_step_pred)
        def _():
            pad_s[:] = jnp.zeros_like(pad_s)

    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)

    # Phase F1 (rows [0, D+2)): pointwise prelude + 1×1×1 -> a2 -> pad_s
    def f1(z0, cs, acc):
        xc = xv[pl.ds(z0, cs)]
        a1 = _elu(xc + b1a) + b1b
        u1 = _dot_last(a1, w1_ref[0], dt)
        a2 = _elu(u1 + b2a) + b2b
        if not wrap:
            # 'zeros' pads a2 (the conv input), not x: the prelude maps the
            # x-halo's zero rows to a nonzero value — mask them out.
            row = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0) + z0
            g = row0 + row - 1  # global row of this xv row
            a2 = jnp.where((g < 0) | (g >= total_d), jnp.zeros_like(a2), a2)
        _fill_hw_pad_rows(pad_s, a2, z0, wrap)
        return acc

    _chunked(D + 2, chunk, f1, 0)

    if before_update is not None:
        before_update()

    # Phase F2 (owned rows [0, D)): k3 conv -> a3 -> 1×1×1 -> residual update
    def f2(z0, cs, acc):
        conv = jnp.zeros((cs, H, W, cb8), f32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    v = pad_s[pl.ds(z0 + dz, cs), dy : dy + H, dx : dx + W, :]
                    conv += jax.lax.dot_general(
                        v,
                        w2_ref[0, dz, dy, dx],
                        dimension_numbers=(((3,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
        a3 = _elu(conv.astype(dt) + b3a) + b3b
        u3 = _dot_last(a3, w3_ref[0], dt)
        rows = pl.ds(z0 + 1, cs)
        xv[rows] = u3 * scale + b4 + xv[rows]
        return acc

    _chunked(D, chunk, f2, 0)


def _fwd_kernel(
    x_ref,  # (1, D, H, W, C8) input volume (fetched once per batch item)
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    save_ref,  # (1, 1, D, H, W, C8) block input, for backward — or None
    y_ref,  # (1, D, H, W, C8) final output
    xv,
    pad_s,
    *,
    wrap,
    nb,
    chunk=_CHUNK,
):
    i = pl.program_id(1)
    D = xv.shape[0] - 2

    @pl.when(i == 0)
    def _():
        xv[1 : D + 1] = x_ref[0]

    if save_ref is not None:
        save_ref[0, 0] = xv[1 : D + 1]

    _fwd_body(
        xv, pad_s, w1_ref, w2_ref, w3_ref, sc_ref,
        wrap=wrap, dt=x_ref.dtype, chunk=chunk,
    )

    @pl.when(i == nb - 1)
    def _():
        y_ref[0] = xv[1 : D + 1]


def _fwd_kernel_nosave(
    x_ref, w1_ref, w2_ref, w3_ref, sc_ref, y_ref, xv, pad_s,
    *, wrap, nb, chunk=_CHUNK,
):
    """Primal-only forward: identical math, no per-block save outputs.

    The saves exist solely for the backward kernel; the primal path (eval,
    embedding extraction, any un-differentiated forward) would otherwise
    write nb × volume of dead HBM traffic — 1.26 GB for the 150-block
    256-res stack."""
    _fwd_kernel(
        x_ref, w1_ref, w2_ref, w3_ref, sc_ref, None, y_ref, xv, pad_s,
        wrap=wrap, nb=nb, chunk=chunk,
    )


def _fwd_kernel_streaming(
    x_hbm,  # (B, D, H, W, C8p) in HBM (memory_space=ANY), lanes 128-aligned
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    save_hbm,  # (NB, B, D+4, H, W, C8p) in HBM — or None (primal)
    y_hbm,  # (B, D, H, W, C8p) in HBM
    xv,
    pad_s,
    in_sem,
    save_sem,
    out_sem,
    *,
    wrap,
    nb,
    chunk=_CHUNK,
):
    """Streaming-io forward: identical math to _fwd_kernel, but the
    volume-sized operands live in HBM and move via explicit DMAs instead of
    double-buffered full-volume pipeline blocks. VMEM high-water drops from
    ~5 volumes (x/y/saves × 2 buffers) to the resident activation + pad
    scratch, lifting the residency cap to the 512-res level-0 stacks
    (PERF.md). Two hardware constraints shape the layout (verified on v5e):

      * a DMA'd HBM slice's lane (minor) dim must be a 128 multiple — the
        wrapper pads C8 lanes up to C8p with zero weights rows/cols (the
        tiled HBM layout is physically lane-padded anyway, so this costs
        no real HBM);
      * saves are stored WITH their 2-row depth halos (D+4 rows, wrap rows
        materialized here) so the backward's per-chunk windows are single
        contiguous static-size DMAs. In 'zeros' mode the halo rows are
        left unwritten: phase A masks the halo rows' a2 to zero (a
        jnp.where, so even NaN garbage is erased) and nothing else reads
        them.
    """
    i = pl.program_id(1)
    bi = pl.program_id(0)
    D = xv.shape[0] - 2

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm.at[bi], xv.at[pl.ds(1, D)], in_sem)
        cp.start()
        cp.wait()

    if save_hbm is not None:
        # overlap the save write-out with phase F1 (which only reads xv);
        # the fence before F2's in-place writes is the before_update hook
        copies = [
            pltpu.make_async_copy(
                xv.at[pl.ds(1, D)], save_hbm.at[i, bi, pl.ds(2, D)], save_sem
            )
        ]
        if wrap:
            # 2-row depth halos from the interior (xv row r+1 = input row r)
            for dst, src in ((0, D - 2), (1, D - 1), (D + 2, 0), (D + 3, 1)):
                copies.append(
                    pltpu.make_async_copy(
                        xv.at[pl.ds(src + 1, 1)],
                        save_hbm.at[i, bi, pl.ds(dst, 1)],
                        save_sem,
                    )
                )
        for cp in copies:
            cp.start()

        def fence():
            for cp in copies:
                cp.wait()

    else:
        fence = None

    _fwd_body(
        xv, pad_s, w1_ref, w2_ref, w3_ref, sc_ref,
        wrap=wrap, dt=x_hbm.dtype, chunk=chunk, before_update=fence,
    )

    @pl.when(i == nb - 1)
    def _():
        cp = pltpu.make_async_copy(xv.at[pl.ds(1, D)], y_hbm.at[bi], out_sem)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _fwd_kernel_streaming_nosave(
    x_hbm, w1_ref, w2_ref, w3_ref, sc_ref, y_hbm, xv, pad_s,
    in_sem, save_sem, out_sem, *, wrap, nb, chunk=_CHUNK,
):
    """Primal-only streaming forward (no per-block saves — see
    _fwd_kernel_nosave)."""
    _fwd_kernel_streaming(
        x_hbm, w1_ref, w2_ref, w3_ref, sc_ref, None, y_hbm, xv, pad_s,
        in_sem, save_sem, out_sem, wrap=wrap, nb=nb, chunk=chunk,
    )


def _bwd_body(
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    dw1_ref,  # (1, 1, C8, Cb8) f32, per-block
    dw2_ref,  # (1, 1, 3, 3, 3, Cb8, Cb8) f32, per-block
    dw3_ref,  # (1, 1, Cb8, C8) f32, per-block
    dsc_ref,  # (1, 1, 1, 8) f32, per-block
    read_x,  # read_x(z0, cs) -> (cs, H, W, C8) rows of the HALOED saved
    #          input (xs-space: rows [0, D+4), interior at [2, D+2))
    gv,  # VMEM scratch (D+2, H, W, C8): resident cotangent + D-halo rows
    pad2_s,  # VMEM scratch (D+4, H+2, W+2, Cb8): HW-padded a2
    gpad_s,  # VMEM scratch (D+2, H+2, W+2, Cb8): HW-padded g_u2c
    *,
    wrap,
    dt,
    chunk=_CHUNK,
    fill_halos=True,  # False: caller DMA'd real neighbor cotangent rows
    row0=0,  # global index of the first OWNED row (tiled mode)
    total_d=None,  # global depth (defaults to the resident D)
    first_step_pred=None,  # zeros-mode pad init predicate (tiled grids)
    accumulate_pred=None,  # tiled: None = overwrite dw outs; else add when
    #                         the predicate is False (non-first tile)
):
    """Backward for ONE block: the caller provides the haloed saved block
    input through ``read_x`` and has placed the running cotangent in gv
    rows [1, D+1); phases A–C update gv in place and write this block's
    weight grads. In tiled mode gv holds a T-row window with DMA'd halos,
    ``read_x(z0, cs)`` spans xs-window rows [0, T+4), and the dw outputs
    are revisited across tiles (``accumulate_pred`` = first-tile predicate).

    VMEM note: earlier revisions kept two more full-volume scratches (u1s —
    conv1 recompute cache — and gu2cs, the unpadded copy of gpad_s's
    interior). Both are gone so the streaming variant fits: phase C
    recomputes u1 from its xc chunk (one extra (cs,·)·(C8,Cb8) dot per
    chunk) and reads g_u2c as gpad_s's interior."""
    i = pl.program_id(1)
    D = gv.shape[0] - 2  # owned rows in this window
    H, W = gv.shape[1], gv.shape[2]
    c8 = gv.shape[-1]
    cb8 = pad2_s.shape[-1]
    f32 = jnp.float32
    if total_d is None:
        total_d = D

    if fill_halos:
        if wrap:
            gv[0] = gv[D]
            gv[D + 1] = gv[1]
        else:
            gv[0] = jnp.zeros_like(gv[0])
            gv[D + 1] = jnp.zeros_like(gv[D + 1])

    if not wrap:
        # only the interiors are rewritten per step; borders must start zero
        if first_step_pred is None:
            first_step_pred = (i == 0) & (pl.program_id(0) == 0)

        @pl.when(first_step_pred)
        def _():
            pad2_s[:] = jnp.zeros_like(pad2_s)
            gpad_s[:] = jnp.zeros_like(gpad_s)

    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)

    def dot_w2(v, wtap, transposed):
        return jax.lax.dot_general(
            v,
            wtap,
            dimension_numbers=(((3,), (1 if transposed else 0,)), ((), ())),
            preferred_element_type=f32,
        )

    # --- Phase A (xs rows [0, D+4)): recompute a1 -> a2 -> pad2_s
    def phase_a(z0, cs, acc):
        xc = read_x(z0, cs)
        a1 = _elu(xc + b1a) + b1b
        u1 = _dot_last(a1, w1_ref[0], dt)
        a2 = _elu(u1 + b2a) + b2b
        if not wrap:
            # 'zeros' pads a2 (the conv input), not x — mask the halo rows
            # the pointwise prelude mapped away from zero.
            row = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0) + z0
            g = row0 + row - 2  # global x row of this xs-window row
            a2 = jnp.where((g < 0) | (g >= total_d), jnp.zeros_like(a2), a2)
        _fill_hw_pad_rows(pad2_s, a2, z0, wrap)
        return acc

    _chunked(D + 4, chunk, phase_a, 0)

    # --- Phase B (g rows [0, D+2)): u2c -> g_u2c -> gu2cs/gpad_s, plus the
    # owned-row reductions (dw3 and the late scalar grads), masked by global
    # row index so the D-halo rows never contribute.
    def phase_b(z0, cs, acc):
        dw3a, d_scale, d_b4, d_b3a, d_b3b = acc
        conv = jnp.zeros((cs, H, W, cb8), f32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    v = pad2_s[pl.ds(z0 + dz, cs), dy : dy + H, dx : dx + W, :]
                    conv += dot_w2(v, w2_ref[0, dz, dy, dx], False)
        u2c = conv.astype(dt)
        a3 = _elu(u2c + b3a) + b3b
        g = gv[pl.ds(z0, cs)]
        g_u3 = g * scale
        g_a3 = _dot_last_t(g_u3, w3_ref[0], dt)
        g_u2c = g_a3 * _elu_grad(u2c + b3a)
        _fill_hw_pad_rows(gpad_s, g_u2c, z0, wrap)

        row = jax.lax.broadcasted_iota(jnp.int32, (cs, H, W, 1), 0) + z0
        m = ((row >= 1) & (row <= D)).astype(f32)  # owned g rows = [1, D+1)
        u3 = _dot_last(a3, w3_ref[0], dt)
        return (
            dw3a + _contract_voxels(a3 * m.astype(dt), g_u3),
            d_scale + jnp.sum(g.astype(f32) * u3.astype(f32) * m),
            d_b4 + jnp.sum(g.astype(f32) * m),
            d_b3a + jnp.sum(g_u2c.astype(f32) * m),
            d_b3b + jnp.sum(g_a3.astype(f32) * m),
        )

    zero = jnp.zeros((), f32)
    dw3a, d_scale, d_b4, d_b3a, d_b3b = _chunked(
        D + 2,
        chunk,
        phase_b,
        (jnp.zeros((cb8, c8), f32), zero, zero, zero, zero),
    )

    # --- Phase C (owned rows [0, D)): transposed conv, early grads, dw1/dw2,
    # chained input cotangent written back into gv.
    def phase_c(z0, cs, acc):
        dw1a, dw2a, d_b1a, d_b1b, d_b2a, d_b2b = acc
        ga2acc = jnp.zeros((cs, H, W, cb8), f32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    v = gpad_s[
                        pl.ds(2 - dz + z0, cs),
                        2 - dy : 2 - dy + H,
                        2 - dx : 2 - dx + W,
                        :,
                    ]
                    ga2acc += dot_w2(v, w2_ref[0, dz, dy, dx], True)
        g_a2 = ga2acc.astype(dt)  # (cs, H, W, Cb8)
        xc = read_x(z0 + 2, cs)  # owned xs rows
        a1c = _elu(xc + b1a) + b1b
        u1c = _dot_last(a1c, w1_ref[0], dt)  # recomputed (u1s scratch gone)
        g_u1 = g_a2 * _elu_grad(u1c + b2a)
        g_a1 = _dot_last_t(g_u1, w1_ref[0], dt)
        g_xc = g_a1 * _elu_grad(xc + b1a)
        rows = pl.ds(z0 + 1, cs)
        gv[rows] = gv[rows] + g_xc

        # owned g_u2c rows = gpad_s interior (gu2cs scratch gone)
        guc = gpad_s[pl.ds(z0 + 1, cs), 1 : H + 1, 1 : W + 1, :]
        taps = []
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    v = pad2_s[
                        pl.ds(1 + dz + z0, cs), dy : dy + H, dx : dx + W, :
                    ]
                    taps.append(_contract_voxels(v, guc))
        return (
            dw1a + _contract_voxels(a1c, g_u1),
            dw2a + jnp.stack(taps),
            d_b1a + jnp.sum(g_xc.astype(f32)),
            d_b1b + jnp.sum(g_a1.astype(f32)),
            d_b2a + jnp.sum(g_u1.astype(f32)),
            d_b2b + jnp.sum(g_a2.astype(f32)),
        )

    dw1a, dw2a, d_b1a, d_b1b, d_b2a, d_b2b = _chunked(
        D,
        chunk,
        phase_c,
        (
            jnp.zeros((c8, cb8), f32),
            jnp.zeros((27, cb8, cb8), f32),
            zero,
            zero,
            zero,
            zero,
        ),
    )

    dsc = jnp.stack([d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale])
    dw2a = dw2a.reshape(3, 3, 3, cb8, cb8)
    if accumulate_pred is None:
        dw1_ref[0, 0] = dw1a
        dw3_ref[0, 0] = dw3a
        dw2_ref[0, 0] = dw2a
        dsc_ref[0, 0, 0] = dsc
    else:
        # tiled: the dw output blocks are revisited across the tile sweep —
        # initialize on the first tile, accumulate on the rest
        @pl.when(accumulate_pred)
        def _():
            dw1_ref[0, 0] = dw1a
            dw3_ref[0, 0] = dw3a
            dw2_ref[0, 0] = dw2a
            dsc_ref[0, 0, 0] = dsc

        @pl.when(jnp.logical_not(accumulate_pred))
        def _():
            dw1_ref[0, 0] = dw1_ref[0, 0] + dw1a
            dw3_ref[0, 0] = dw3_ref[0, 0] + dw3a
            dw2_ref[0, 0] = dw2_ref[0, 0] + dw2a
            dsc_ref[0, 0, 0] = dsc_ref[0, 0, 0] + dsc


def _bwd_kernel(
    x_ref,  # (1, 1, D, H, W, C8): saved input of block j = nb-1-i
    gy_ref,  # (1, D, H, W, C8): incoming cotangent (fetched once per batch)
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    dx_ref,  # (1, D, H, W, C8)
    dw1_ref,
    dw2_ref,
    dw3_ref,
    dsc_ref,
    xs,  # VMEM scratch (D+4, H, W, C8): block input + 2-row D-halo
    gv,
    pad2_s,
    gpad_s,
    *,
    wrap,
    nb,
    chunk=_CHUNK,
):
    i = pl.program_id(1)
    D = gv.shape[0] - 2

    @pl.when(i == 0)
    def _():
        gv[1 : D + 1] = gy_ref[0]

    xs[2 : D + 2] = x_ref[0, 0]
    if wrap:
        xs[0] = xs[D]
        xs[1] = xs[D + 1]
        xs[D + 2] = xs[2]
        xs[D + 3] = xs[3]
    else:
        for r in (0, 1, D + 2, D + 3):
            xs[r] = jnp.zeros_like(xs[r])

    _bwd_body(
        w1_ref, w2_ref, w3_ref, sc_ref,
        dw1_ref, dw2_ref, dw3_ref, dsc_ref,
        lambda z0, cs: xs[pl.ds(z0, cs)], gv, pad2_s, gpad_s,
        wrap=wrap, dt=gy_ref.dtype, chunk=chunk,
    )

    @pl.when(i == nb - 1)
    def _():
        dx_ref[0] = gv[1 : D + 1]


def _bwd_kernel_streaming(
    save_hbm,  # (NB, B, D, H, W, C8) in HBM (memory_space=ANY)
    gy_hbm,  # (B, D, H, W, C8) in HBM
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    dx_hbm,  # (B, D, H, W, C8p) in HBM
    dw1_ref,
    dw2_ref,
    dw3_ref,
    dsc_ref,
    gv,
    pad2_s,
    gpad_s,
    xw,  # VMEM scratch (_CHUNK, H, W, C8p): streamed saved-input window
    gy_sem,
    save_sem,
    dx_sem,
    *,
    wrap,
    nb,
    chunk=_CHUNK,
):
    """Streaming-io backward (see _fwd_kernel_streaming): the cotangent and
    conv-recompute scratches stay VMEM-resident; the volume-sized operands
    stream from/to HBM by explicit DMA. The saved block input is NOT kept
    resident — phases A and C pull it one depth-chunk window at a time
    (``read_x``) from the haloed (D+4-row) save record, each window a
    single contiguous static-size DMA."""
    i = pl.program_id(1)
    bi = pl.program_id(0)
    D = gv.shape[0] - 2

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(gy_hbm.at[bi], gv.at[pl.ds(1, D)], gy_sem)
        cp.start()
        cp.wait()

    def read_x(z0, cs):
        cp = pltpu.make_async_copy(
            save_hbm.at[nb - 1 - i, bi, pl.ds(z0, cs)],
            xw.at[pl.ds(0, cs)],
            save_sem,
        )
        cp.start()
        cp.wait()
        return xw[pl.ds(0, cs)]

    _bwd_body(
        w1_ref, w2_ref, w3_ref, sc_ref,
        dw1_ref, dw2_ref, dw3_ref, dsc_ref,
        read_x, gv, pad2_s, gpad_s,
        wrap=wrap, dt=gy_hbm.dtype, chunk=chunk,
    )

    @pl.when(i == nb - 1)
    def _():
        cp = pltpu.make_async_copy(gv.at[pl.ds(1, D)], dx_hbm.at[bi], dx_sem)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# Depth-tiled kernels: volumes too large for VMEM residency
# ---------------------------------------------------------------------------
#
# The resident/streaming kernels keep the whole activation (or cotangent) in
# a VMEM scratch across the block sweep — capped near ~88 MB of scratch. The
# stem-level stacks of the 512-res config ((128,128,32)×64 lanes = 67 MB
# volumes) exceed that, and profiled as ~78 ms of XLA scan time per 512-res
# train step (PERF.md). The tiled kernels remove the cap entirely: grid =
# (batch, block, depth-tile); each step DMAs a (T+2)-row window (with real
# neighbor halo rows) from HBM, applies ONE block to the T owned rows, and
# writes them back to an HBM ping-pong work buffer (block i reads the buffer
# block i−1 wrote — the sequential Pallas grid makes every neighbor row of
# the previous block available). Per-block HBM traffic is 3 volumes
# (in + save + out) instead of the streaming kernel's 1 (save only), so the
# resident/streaming variants stay preferred when they fit — tiled targets
# SHALLOW stacks on huge volumes, where the XLA alternative pays far more in
# lane-padded pad/slice/copy fusions.


def _dma(src, dst, sem):
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    cp.wait()


def _load_window(src, xv, t, nt, tile, halo, sem, wrap):
    """DMA rows [t·tile − halo, t·tile + tile + halo) of ``src`` (D rows,
    wrap/zeros boundary) into the (tile + 2·halo)-row window ``xv``."""
    D = nt * tile
    row0 = t * tile

    @pl.when((t > 0) & (t < nt - 1))
    def _():
        _dma(src.at[pl.ds(row0 - halo, tile + 2 * halo)], xv, sem)

    @pl.when((t == 0) & (nt > 1))
    def _():
        _dma(src.at[pl.ds(0, tile + halo)], xv.at[pl.ds(halo, tile + halo)], sem)
        if wrap:
            _dma(src.at[pl.ds(D - halo, halo)], xv.at[pl.ds(0, halo)], sem)
        else:
            xv[pl.ds(0, halo)] = jnp.zeros_like(xv[pl.ds(0, halo)])

    @pl.when((t == nt - 1) & (nt > 1))
    def _():
        _dma(
            src.at[pl.ds(row0 - halo, tile + halo)],
            xv.at[pl.ds(0, tile + halo)],
            sem,
        )
        if wrap:
            _dma(src.at[pl.ds(0, halo)], xv.at[pl.ds(tile + halo, halo)], sem)
        else:
            xv[pl.ds(tile + halo, halo)] = jnp.zeros_like(
                xv[pl.ds(tile + halo, halo)]
            )


def _fwd_kernel_tiled(
    x_hbm,  # (B, D, H, W, C8p) in HBM
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    save_hbm,  # (NB, B, D+4, H, W, C8p) in HBM — or None (primal)
    y_hbm,  # (B, D, H, W, C8p) in HBM
    wka_hbm,  # (D, H, W, C8p) ping buffer (written by even blocks)
    wkb_hbm,  # (D, H, W, C8p) pong buffer (written by odd blocks)
    xv,  # VMEM scratch (T+2, H, W, C8p)
    pad_s,  # VMEM scratch (T+2, H+2, W+2, Cb8p)
    in_sem,
    save_sem,
    out_sem,
    *,
    wrap,
    nb,
    nt,
    tile,
    chunk,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    T = tile
    D = nt * tile
    row0 = t * T

    @pl.when(i == 0)
    def _():
        _load_window(x_hbm.at[bi], xv, t, nt, T, 1, in_sem, wrap)

    @pl.when((i > 0) & (i % 2 == 1))
    def _():
        _load_window(wka_hbm, xv, t, nt, T, 1, in_sem, wrap)

    @pl.when((i > 0) & (i % 2 == 0))
    def _():
        _load_window(wkb_hbm, xv, t, nt, T, 1, in_sem, wrap)

    if save_hbm is not None:
        # owned rows into the (D+4)-row haloed record; the edge tiles also
        # materialize the wrap halo rows (zeros mode leaves them unwritten —
        # the backward's phase A masks them to zero by global row index)
        _dma(
            xv.at[pl.ds(1, T)],
            save_hbm.at[i, bi, pl.ds(row0 + 2, T)],
            save_sem,
        )
        if wrap:

            @pl.when(t == 0)
            def _():
                _dma(xv.at[pl.ds(1, 2)], save_hbm.at[i, bi, pl.ds(D + 2, 2)], save_sem)

            @pl.when(t == nt - 1)
            def _():
                _dma(xv.at[pl.ds(T - 1, 2)], save_hbm.at[i, bi, pl.ds(0, 2)], save_sem)

    _fwd_body(
        xv, pad_s, w1_ref, w2_ref, w3_ref, sc_ref,
        wrap=wrap, dt=x_hbm.dtype, chunk=chunk,
        fill_halos=False, row0=row0, total_d=D,
        first_step_pred=(bi == 0) & (i == 0) & (t == 0),
    )

    # owned rows out: ping-pong buffer, or y on the last block
    @pl.when(i == nb - 1)
    def _():
        _dma(xv.at[pl.ds(1, T)], y_hbm.at[bi, pl.ds(row0, T)], out_sem)

    @pl.when((i < nb - 1) & (i % 2 == 0))
    def _():
        _dma(xv.at[pl.ds(1, T)], wka_hbm.at[pl.ds(row0, T)], out_sem)

    @pl.when((i < nb - 1) & (i % 2 == 1))
    def _():
        _dma(xv.at[pl.ds(1, T)], wkb_hbm.at[pl.ds(row0, T)], out_sem)


def _fwd_kernel_tiled_nosave(
    x_hbm, w1_ref, w2_ref, w3_ref, sc_ref, y_hbm, wka_hbm, wkb_hbm,
    xv, pad_s, in_sem, save_sem, out_sem, *, wrap, nb, nt, tile, chunk,
):
    _fwd_kernel_tiled(
        x_hbm, w1_ref, w2_ref, w3_ref, sc_ref, None, y_hbm, wka_hbm, wkb_hbm,
        xv, pad_s, in_sem, save_sem, out_sem,
        wrap=wrap, nb=nb, nt=nt, tile=tile, chunk=chunk,
    )


def _bwd_kernel_tiled(
    save_hbm,  # (NB, B, D+4, H, W, C8p) in HBM
    gy_hbm,  # (B, D, H, W, C8p) in HBM
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    dx_hbm,  # (B, D, H, W, C8p) in HBM
    dw1_ref,
    dw2_ref,
    dw3_ref,
    dsc_ref,
    wka_hbm,  # (D, H, W, C8p) ping buffer
    wkb_hbm,  # (D, H, W, C8p) pong buffer
    gv,  # VMEM scratch (T+2, H, W, C8p)
    pad2_s,  # VMEM scratch (T+4, H+2, W+2, Cb8p)
    gpad_s,  # VMEM scratch (T+2, H+2, W+2, Cb8p)
    xs,  # VMEM scratch (T+4, H, W, C8p): the saved-input window
    gy_sem,
    save_sem,
    dx_sem,
    *,
    wrap,
    nb,
    nt,
    tile,
    chunk,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)  # reverse block sweep: block j = nb - 1 - i
    t = pl.program_id(2)
    T = tile
    D = nt * tile
    row0 = t * T

    @pl.when(i == 0)
    def _():
        _load_window(gy_hbm.at[bi], gv, t, nt, T, 1, gy_sem, wrap)

    @pl.when((i > 0) & (i % 2 == 1))
    def _():
        _load_window(wka_hbm, gv, t, nt, T, 1, gy_sem, wrap)

    @pl.when((i > 0) & (i % 2 == 0))
    def _():
        _load_window(wkb_hbm, gv, t, nt, T, 1, gy_sem, wrap)

    # the saved-input window: xs rows [0, T+4) = record rows [row0, row0+T+4)
    # (the record carries 2-row halos, so this is one contiguous DMA; in
    # zeros mode out-of-range rows hold garbage that phase A masks away)
    _dma(save_hbm.at[nb - 1 - i, bi, pl.ds(row0, T + 4)], xs, save_sem)

    _bwd_body(
        w1_ref, w2_ref, w3_ref, sc_ref,
        dw1_ref, dw2_ref, dw3_ref, dsc_ref,
        lambda z0, cs: xs[pl.ds(z0, cs)], gv, pad2_s, gpad_s,
        wrap=wrap, dt=gy_hbm.dtype, chunk=chunk,
        fill_halos=False, row0=row0, total_d=D,
        first_step_pred=(bi == 0) & (i == 0) & (t == 0),
        accumulate_pred=t == 0,
    )

    @pl.when(i == nb - 1)
    def _():
        _dma(gv.at[pl.ds(1, T)], dx_hbm.at[bi, pl.ds(row0, T)], dx_sem)

    @pl.when((i < nb - 1) & (i % 2 == 0))
    def _():
        _dma(gv.at[pl.ds(1, T)], wka_hbm.at[pl.ds(row0, T)], dx_sem)

    @pl.when((i < nb - 1) & (i % 2 == 1))
    def _():
        _dma(gv.at[pl.ds(1, T)], wkb_hbm.at[pl.ds(row0, T)], dx_sem)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _rup(n: int, m: int = 128) -> int:
    return -(-n // m) * m


def _pad_axis(a, axis: int, target: int):
    if a.shape[axis] == target:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, target - a.shape[axis])
    return jnp.pad(a, pads)


def _pad_lanes_fwd(x, w1e, w2e, w3e):
    """Zero-weight lane padding for the streaming kernels: a DMA'd HBM
    slice's minor dim must be a 128 multiple (verified on v5e: 144- and
    16-lane copies are rejected by Mosaic, 128/256 succeed). Padding is
    physically free — the tiled layout already rounds lanes up to 128 —
    and exactly correct: padded weight rows/cols are zero, so garbage in
    padded activation lanes (the residual's +b4 accumulates there) never
    reaches a real lane, and every cotangent is zero in padded lanes."""
    c8, cb8 = w1e.shape[1], w1e.shape[2]
    c8p, cb8p = _rup(c8), _rup(cb8)
    if (c8p, cb8p) == (c8, cb8):
        return x, w1e, w2e, w3e
    x = _pad_axis(x, -1, c8p)
    w1e = _pad_axis(_pad_axis(w1e, 1, c8p), 2, cb8p)
    w2e = _pad_axis(_pad_axis(w2e, 4, cb8p), 5, cb8p)
    w3e = _pad_axis(_pad_axis(w3e, 1, cb8p), 2, c8p)
    return x, w1e, w2e, w3e


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def preact_stack_fused(x, w1e, w2e, w3e, sc8, pad_mode: str, interpret: bool):
    """Run a whole stack of fused 'same' PreActFixup blocks on a block-space
    activation with the volume resident in VMEM.

    x: (B, D, H, W, C8); w1e: (NB, C8, Cb8); w2e: (NB, 3, 3, 3, Cb8, Cb8);
    w3e: (NB, Cb8, C8) — block-space-embedded weight stacks (ops/s2d_conv.py),
    cast to x.dtype; sc8: (NB, 8) f32 scalars per block. Equals scanning
    ops/s2d_conv.py::preact_fixup_same_block over the stacks.

    The primal call runs a no-saves kernel (no residuals written); only
    the VJP forward rule pays the per-block save traffic.
    """
    return _fwd_impl(x, w1e, w2e, w3e, sc8, pad_mode, interpret, saves=False)[0]


def _fwd_impl(x, w1e, w2e, w3e, sc8, pad_mode, interpret, saves):
    wrap = pad_mode == "wrap"
    mode = _kernel_mode(x.shape, x.dtype, w1e.shape[-1])
    assert mode is not None, (x.shape, x.dtype)
    c8_out = x.shape[-1]
    if mode != "resident":
        x, w1e, w2e, w3e = _pad_lanes_fwd(x, w1e, w2e, w3e)
    b, d, h, w, c8 = x.shape
    nb, _, cb8 = w1e.shape
    chunk = _CHUNK if mode == "resident" else _STREAM_CHUNK
    weight_specs_nd = {
        2: lambda: [
            pl.BlockSpec((1, c8, cb8), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((1, 3, 3, 3, cb8, cb8), lambda bi, i: (i, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, cb8, c8), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 8), lambda bi, i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        3: lambda: [
            pl.BlockSpec((1, c8, cb8), lambda bi, i, t: (i, 0, 0)),
            pl.BlockSpec((1, 3, 3, 3, cb8, cb8), lambda bi, i, t: (i, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, cb8, c8), lambda bi, i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, 8), lambda bi, i, t: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
    }
    if mode == "tiled":
        tile = _tile_rows(d, h, w, c8, cb8, jnp.dtype(x.dtype).itemsize)
        nt = d // tile
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        kern = functools.partial(
            _fwd_kernel_tiled if saves else _fwd_kernel_tiled_nosave,
            wrap=wrap, nb=nb, nt=nt, tile=tile, chunk=chunk,
        )
        grid = (b, nb, nt)
        in_specs = [any_spec] + weight_specs_nd[3]()
        out_specs = ([any_spec] if saves else []) + [any_spec] * 3
        out_shape = (
            [jax.ShapeDtypeStruct((nb, b, d + 4, h, w, c8), x.dtype)]
            if saves
            else []
        ) + [
            jax.ShapeDtypeStruct((b, d, h, w, c8), x.dtype),  # y
            jax.ShapeDtypeStruct((d, h, w, c8), x.dtype),  # ping
            jax.ShapeDtypeStruct((d, h, w, c8), x.dtype),  # pong
        ]
        scratch = [
            pltpu.VMEM((tile + 2, h, w, c8), x.dtype),
            pltpu.VMEM((tile + 2, h + 2, w + 2, cb8), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(x, w1e, w2e, w3e, sc8.astype(jnp.float32).reshape(nb, 1, 8))
        y = out[1] if saves else out[0]
        y = y[..., :c8_out] if c8_out != c8 else y
        return (y, out[0] if saves else None)

    weight_specs = weight_specs_nd[2]()
    scratch = [
        pltpu.VMEM((d + 2, h, w, c8), x.dtype),
        pltpu.VMEM((d + 2, h + 2, w + 2, cb8), x.dtype),
    ]
    if mode == "streaming":
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        kern = functools.partial(
            _fwd_kernel_streaming if saves else _fwd_kernel_streaming_nosave,
            wrap=wrap,
            nb=nb,
            chunk=chunk,
        )
        # saves carry their 2-row depth halos (D+4 rows) so the backward's
        # per-chunk windows are single contiguous DMAs
        out_specs = ([any_spec] if saves else []) + [any_spec]
        out_shape = (
            [jax.ShapeDtypeStruct((nb, b, d + 4, h, w, c8), x.dtype)]
            if saves
            else []
        ) + [jax.ShapeDtypeStruct((b, d, h, w, c8), x.dtype)]
        scratch = scratch + [pltpu.SemaphoreType.DMA] * 3
        in_specs = [any_spec] + weight_specs
    else:
        if saves:
            kern = functools.partial(_fwd_kernel, wrap=wrap, nb=nb, chunk=chunk)
            out_specs = [
                pl.BlockSpec((1, 1, d, h, w, c8), lambda bi, i: (i, bi, 0, 0, 0, 0)),
                pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0)),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((nb, b, d, h, w, c8), x.dtype),
                jax.ShapeDtypeStruct((b, d, h, w, c8), x.dtype),
            ]
        else:
            kern = functools.partial(
                _fwd_kernel_nosave, wrap=wrap, nb=nb, chunk=chunk
            )
            out_specs = [
                pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0))
            ]
            out_shape = [jax.ShapeDtypeStruct((b, d, h, w, c8), x.dtype)]
        in_specs = [
            pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0))
        ] + weight_specs
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, w1e, w2e, w3e, sc8.astype(jnp.float32).reshape(nb, 1, 8))
    y = out[-1][..., :c8_out] if c8_out != c8 else out[-1]
    return (y, out[0] if saves else None)


def _fwd_rule(x, w1e, w2e, w3e, sc8, pad_mode, interpret):
    y, saves = _fwd_impl(x, w1e, w2e, w3e, sc8, pad_mode, interpret, saves=True)
    return y, (saves, w1e, w2e, w3e, sc8)


def _bwd_rule(pad_mode, interpret, res, gy):
    saves, w1e, w2e, w3e, sc8 = res
    d = gy.shape[1]
    c8_out, cb8_out = gy.shape[-1], w1e.shape[-1]
    wrap = pad_mode == "wrap"
    # recompute the forward's mode decision (pure function of the shapes)
    mode = _kernel_mode(gy.shape, gy.dtype, w1e.shape[-1])
    if mode != "resident":
        gy, w1e, w2e, w3e = _pad_lanes_fwd(gy, w1e, w2e, w3e)
    nb, b, _, h, w, c8 = saves.shape
    cb8 = w1e.shape[-1]
    chunk = _CHUNK if mode == "resident" else _STREAM_CHUNK
    if mode == "tiled":
        weight_specs = [
            pl.BlockSpec((1, c8, cb8), lambda bi, i, t: (nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 3, 3, 3, cb8, cb8),
                lambda bi, i, t: (nb - 1 - i, 0, 0, 0, 0, 0),
            ),
            pl.BlockSpec((1, cb8, c8), lambda bi, i, t: (nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 8),
                lambda bi, i, t: (nb - 1 - i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ]
        dw_out_specs = [
            pl.BlockSpec((1, 1, c8, cb8), lambda bi, i, t: (bi, nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 3, 3, 3, cb8, cb8),
                lambda bi, i, t: (bi, nb - 1 - i, 0, 0, 0, 0, 0),
            ),
            pl.BlockSpec((1, 1, cb8, c8), lambda bi, i, t: (bi, nb - 1 - i, 0, 0)),
            pl.BlockSpec((1, 1, 1, 8), lambda bi, i, t: (bi, nb - 1 - i, 0, 0)),
        ]
    else:
        weight_specs = [
            pl.BlockSpec((1, c8, cb8), lambda bi, i: (nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 3, 3, 3, cb8, cb8), lambda bi, i: (nb - 1 - i, 0, 0, 0, 0, 0)
            ),
            pl.BlockSpec((1, cb8, c8), lambda bi, i: (nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 8), lambda bi, i: (nb - 1 - i, 0, 0), memory_space=pltpu.SMEM
            ),
        ]
        dw_out_specs = [
            pl.BlockSpec((1, 1, c8, cb8), lambda bi, i: (bi, nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 3, 3, 3, cb8, cb8),
                lambda bi, i: (bi, nb - 1 - i, 0, 0, 0, 0, 0),
            ),
            pl.BlockSpec((1, 1, cb8, c8), lambda bi, i: (bi, nb - 1 - i, 0, 0)),
            pl.BlockSpec((1, 1, 1, 8), lambda bi, i: (bi, nb - 1 - i, 0, 0)),
        ]
    dw_out_shape = [
        jax.ShapeDtypeStruct((b, nb, c8, cb8), jnp.float32),
        jax.ShapeDtypeStruct((b, nb, 3, 3, 3, cb8, cb8), jnp.float32),
        jax.ShapeDtypeStruct((b, nb, cb8, c8), jnp.float32),
        jax.ShapeDtypeStruct((b, nb, 1, 8), jnp.float32),
    ]
    grid = (b, nb)
    extra_out_shape = []
    if mode == "tiled":
        tile = _tile_rows(d, h, w, c8, cb8, jnp.dtype(gy.dtype).itemsize)
        nt = d // tile
        grid = (b, nb, nt)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        kern = functools.partial(
            _bwd_kernel_tiled, wrap=wrap, nb=nb, nt=nt, tile=tile, chunk=chunk
        )
        in_specs = [any_spec, any_spec] + weight_specs
        out_specs = [any_spec] + dw_out_specs + [any_spec, any_spec]
        extra_out_shape = [
            jax.ShapeDtypeStruct((d, h, w, c8), gy.dtype),  # ping
            jax.ShapeDtypeStruct((d, h, w, c8), gy.dtype),  # pong
        ]
        scratch = [
            pltpu.VMEM((tile + 2, h, w, c8), gy.dtype),  # gv
            pltpu.VMEM((tile + 4, h + 2, w + 2, cb8), gy.dtype),  # pad2_s
            pltpu.VMEM((tile + 2, h + 2, w + 2, cb8), gy.dtype),  # gpad_s
            pltpu.VMEM((tile + 4, h, w, c8), gy.dtype),  # xs
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        body_scratch = [
            pltpu.VMEM((d + 2, h, w, c8), gy.dtype),  # gv
            pltpu.VMEM((d + 4, h + 2, w + 2, cb8), gy.dtype),  # pad2_s
            pltpu.VMEM((d + 2, h + 2, w + 2, cb8), gy.dtype),  # gpad_s
        ]
        if mode == "streaming":
            any_spec = pl.BlockSpec(memory_space=pl.ANY)
            kern = functools.partial(
                _bwd_kernel_streaming, wrap=wrap, nb=nb, chunk=chunk
            )
            in_specs = [any_spec, any_spec] + weight_specs
            out_specs = [any_spec] + dw_out_specs
            scratch = body_scratch + [
                pltpu.VMEM((chunk, h, w, c8), gy.dtype),  # xw
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]
        else:
            kern = functools.partial(_bwd_kernel, wrap=wrap, nb=nb, chunk=chunk)
            in_specs = [
                pl.BlockSpec(
                    (1, 1, d, h, w, c8), lambda bi, i: (nb - 1 - i, bi, 0, 0, 0, 0)
                ),
                pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0)),
            ] + weight_specs
            out_specs = [
                pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0))
            ] + dw_out_specs
            scratch = [
                pltpu.VMEM((d + 4, h, w, c8), gy.dtype)  # xs
            ] + body_scratch
    dx, dw1, dw2, dw3, dsc, *_work = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((b, d, h, w, c8), gy.dtype)]
        + dw_out_shape
        + extra_out_shape,
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(saves, gy, w1e, w2e, w3e, sc8.astype(jnp.float32).reshape(nb, 1, 8))
    return (
        dx[..., :c8_out],
        dw1.sum(axis=0)[:, :c8_out, :cb8_out].astype(w1e.dtype),
        dw2.sum(axis=0)[..., :cb8_out, :cb8_out].astype(w2e.dtype),
        dw3.sum(axis=0)[:, :cb8_out, :c8_out].astype(w3e.dtype),
        dsc.sum(axis=0).reshape(nb, 8).astype(sc8.dtype),
    )


preact_stack_fused.defvjp(_fwd_rule, _bwd_rule)


# Volume caps. Resident io (blocked full-volume operands, auto
# double-buffered by the pipeline): every full-volume VMEM buffer must fit
# comfortably — 8 MB bf16 volumes peak around ~90 MB in the backward
# kernel. Above that, the STREAMING kernels drop the io double-buffers
# (HBM ANY refs + explicit DMA) so only the resident activation and the
# recompute scratches count; the gate estimates the backward high-water
# (gv + pad2_s + gpad_s + chunk temps) from the PHYSICAL (lane-padded)
# sizes and admits stacks that fit the scoped limit — in particular the
# 512-res level-0 stacks ((64,64,16)×144→256 lanes ⇒ gv 34.6 MB +
# pads 2×20.7 MB ≈ 92 MB with temps, PERF.md). Beyond that the stacks
# stay on the XLA paths.
_MAX_VOLUME_BYTES = 8 * 1024 * 1024
_STREAM_SCRATCH_CAP = 88 * 1024 * 1024  # 128 MB − chunk-2 spill/io allowance
_TILED_BUDGET = 90 * 1024 * 1024  # scratches + 12-row temp allowance
_SPILL_ROWS = 12  # fp32 temp rows Mosaic spills per chunk row (measured)


def _stream_fits(d, h, w, c8, cb8, itemsize) -> bool:
    """Gate for the streaming kernels: the resident backward scratches (at
    physical sizes — lanes round to 128, sublanes to 8) must leave room for
    the measured chunk-2 spill/io allowance (_STREAM_SCRATCH_CAP; scratches
    of 85-87 MB are proven to fit on v5e, see _STREAM_CHUNK)."""
    c8p, cb8p = _rup(c8), _rup(cb8)
    scratch = (
        (d + 2) * h * _rup(w, 8) * c8p * itemsize
        + (d + 4) * (h + 2) * _rup(w + 2, 8) * cb8p * itemsize
        + (d + 2) * (h + 2) * _rup(w + 2, 8) * cb8p * itemsize
    )
    return scratch <= _STREAM_SCRATCH_CAP


def _tile_rows(d, h, w, c8, cb8, itemsize) -> int:
    """Depth-tile size for the tiled kernels: the largest T (with ≥2 tiles,
    T | D, T ≥ 2) whose backward window scratches (gv + xs + pad2 + gpad at
    physical sizes) plus the chunk-2 fp32 temp/spill allowance fit the
    budget (measured on v5e at the 512-res stem shape, h·w=4096·128 lanes:
    T=16 ⇒ 90 MB scratch OOMs; T=8 fits). 0 = no valid tiling."""
    c8p, cb8p = _rup(c8), _rup(cb8)
    row_x = h * _rup(w, 8) * c8p * itemsize
    row_p = (h + 2) * _rup(w + 2, 8) * cb8p * itemsize
    row_t = h * w * max(c8p, cb8p) * 4  # fp32 chunk temp, per depth row
    for t in (16, 8, 4, 2):
        if d % t or d // t < 2:
            continue
        scratch = (2 * t + 6) * (row_x + row_p)
        if scratch + _SPILL_ROWS * row_t <= _TILED_BUDGET:
            return t
    return 0


_FORCE_MODE: str | None = None  # test hook: 'resident'|'streaming'|'tiled'


def _kernel_mode(shape, dtype, cb8: int) -> str | None:
    """Which io variant runs a (B, D, H, W, C8) block-space stack:
    'resident' (whole volume VMEM-resident, blocked io), 'streaming'
    (volume resident, HBM io via explicit DMA), 'tiled' (depth-tiled
    windows with HBM ping-pong — no volume-size cap), or None."""
    if _FORCE_MODE is not None:
        return _FORCE_MODE
    b, d, h, w, c8 = shape
    itemsize = jnp.dtype(dtype).itemsize
    if d * h * w * c8 * itemsize <= _MAX_VOLUME_BYTES:
        return "resident"
    if _stream_fits(d, h, w, c8, cb8, itemsize):
        return "streaming"
    if _tile_rows(d, h, w, c8, cb8, itemsize) and (
        os.environ.get("VQVAE3D_TILED_STACK", "0") == "1"
    ):
        # Opt-in: measured in isolation the tiled kernels beat the XLA scan
        # ~2× on the 512-res stem stacks (23 ms vs ~48 ms fwd+bwd at the
        # 2-fold shape), but in the full train step they LOSE the
        # DMA/compute overlap the XLA scans provide (546 vs 533 ms step —
        # the same in-situ effect as ops/fused_block.py, PERF.md).
        return "tiled"
    return None


def stack_fold(
    shape, n_blocks: int, dtype, cb: int | None = None
) -> int | None:
    """How many space-to-depth folds to apply before running the stack
    megakernel on an NDHWC activation — ``None`` = unsupported (stay on
    the XLA paths); 0 = run the kernel UNFOLDED (see the 0-fold tier
    below). ``cb`` is the blocks' bottleneck width (defaults to the
    architecture's C/2), used to size the VMEM estimate.

    Fold choice targets dense MXU lanes: 2 folds map C ≤ 4 stacks to
    64·C ∈ {64, 128, 256} lanes (the 256-res C=2 stack: 16 padded lanes
    → 128 dense), 1 fold maps C ≤ 32 to 8·C. Each fold is an exact
    weight-space rewrite (ops/s2d_conv.py) costing 8× w2 FLOPs — noise at
    these widths. Gating is VMEM capacity (resident-io up to 8 MB volumes,
    streaming-io up to the _stream_fits estimate), even dims, and ≥2
    blocks (single blocks don't amortize the volume load/store).

    Default-on for real single-device TPU (VQVAE3D_STACK_KERNEL=0 opts
    out). Measured v5e, 150-block 256-res C=18 stack: 17.9 ms forward,
    70.2 ms forward+backward — vs ~500 ms fwd+bwd for the XLA block-space
    scan it replaces; on-device train step 416 → 272 ms (PERF.md)."""
    if os.environ.get("VQVAE3D_STACK_KERNEL", "1") == "0":
        return None
    if len(shape) != 5 or n_blocks < 2:
        return None
    _, d, h, w, c = shape
    itemsize = jnp.dtype(dtype).itemsize
    # MXU-executed cost per original voxel of the k3 conv at fold k is
    # ~27·⌈cb·8ᵏ/128⌉²·128²/8ᵏ, which says c ≤ 8 stacks are cheapest at
    # 2 folds — and the isolated kernel confirms it (2-fold tiled 23 ms vs
    # 48 ms XLA at the 512-res stem stack). But in the FULL train step the
    # extra fold/unfold relayout copies (~20 ms at 256-res) and the lost
    # DMA overlap make it a net loss (256-res step 223 → 269 ms measured),
    # so the 2-fold tier stays at c ≤ 4 where 1 fold can't reach dense
    # lanes at all.
    folds = 2 if c <= 4 else (1 if c <= 32 else 0)
    for k in range(folds, 0, -1):
        s = 2**k
        if d % s or h % s or w % s or min(d, h, w) <= s:
            continue
        df, hf, wf = d // s, h // s, w // s
        c8 = c * s**3
        cb8 = max(cb if cb is not None else c // 2, 1) * s**3
        if _kernel_mode((shape[0], df, hf, wf, c8), dtype, cb8) is not None:
            return k
    # 0-fold tier (r5, VERDICT-r4 #7): stacks the fold tiers can't reach —
    # C > 32 (already ≥56%-dense 128-lane tiles, e.g. the 512-res decoder
    # level-1 C=72 stack) or spatial dims that can't halve (the level-2
    # 8×8×2 grids) — still collapse a ~n_blocks-op sequential XLA scan
    # (plus its per-iteration slice/relayout traffic, 91 ms of `while`
    # op-time in the r4 512-res trace, PERF.md) into ONE resident
    # pallas_call. Kernel math at 0 folds is the plain NDHWC block (the
    # weight embedding is applied zero times). Resident-io only: the
    # streaming/tiled variants displace XLA's copy/compute overlap when
    # run in-situ (measured, see VQVAE3D_TILED_STACK above), while these
    # sub-2 MB volumes load once and stay in VMEM. Depth ≥ 8 keeps the
    # short post-up/down-scale stacks (2-5 blocks) on the XLA paths.
    cbv = max(cb if cb is not None else c // 2, 1)
    if (
        os.environ.get("VQVAE3D_ZERO_FOLD_STACK", "1") == "1"
        and n_blocks >= 8
        and _kernel_mode(shape, dtype, cbv) == "resident"
    ):
        return 0
    return None


def stack_fused_supported(shape, dtype, cb8: int | None = None) -> bool:
    """Gate for an ALREADY-FOLDED (B, D, H, W, C8) block-space activation:
    fits one of the kernel io variants (resident / streaming / tiled).
    See stack_fold for the NDHWC-level policy."""
    if os.environ.get("VQVAE3D_STACK_KERNEL", "1") == "0":
        return False
    _, d, h, w, c8 = shape
    return (
        _kernel_mode(shape, dtype, cb8 if cb8 is not None else c8) is not None
    )


__all__ = ["preact_stack_fused", "stack_fused_supported", "stack_fold"]
