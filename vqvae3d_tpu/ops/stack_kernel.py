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
# lax.fori_loop chunks of _CHUNK depth rows with the cross-phase values in
# persistent VMEM scratch. A straight-line whole-volume formulation (or even
# a python-unrolled chunking) lets Mosaic's scheduler interleave everything
# and the register allocator spills ~100 MB of live volume-sized values to
# scoped VMEM — past the 128 MB physical limit at the real 256-res shapes.
# fori_loop bodies are hard scheduling barriers: live set = one chunk.
_CHUNK = 8


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


def _fwd_kernel(
    x_ref,  # (1, D, H, W, C8) input volume (fetched once per batch item)
    w1_ref,  # (1, C8, Cb8)
    w2_ref,  # (1, 3, 3, 3, Cb8, Cb8)
    w3_ref,  # (1, Cb8, C8)
    sc_ref,  # (1, 1, 8) SMEM
    save_ref,  # (1, 1, D, H, W, C8) block input, for backward — or None
    y_ref,  # (1, D, H, W, C8) final output
    xv,  # VMEM scratch (D+2, H, W, C8): resident activation + D-halo rows
    pad_s,  # VMEM scratch (D+2, H+2, W+2, Cb8)
    *,
    wrap,
    nb,
):
    i = pl.program_id(1)
    D = xv.shape[0] - 2
    H, W = xv.shape[1], xv.shape[2]
    dt = x_ref.dtype
    cb8 = pad_s.shape[-1]
    f32 = jnp.float32

    @pl.when(i == 0)
    def _():
        xv[1 : D + 1] = x_ref[0]

    if save_ref is not None:
        save_ref[0, 0] = xv[1 : D + 1]

    # depth halo rows (recomputed per block from the resident volume)
    if wrap:
        xv[0] = xv[D]
        xv[D + 1] = xv[1]
    else:
        xv[0] = jnp.zeros_like(xv[0])
        xv[D + 1] = jnp.zeros_like(xv[D + 1])

        # only interiors are rewritten per step; borders must start zero
        @pl.when(jnp.logical_and(i == 0, pl.program_id(0) == 0))
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
            a2 = jnp.where((row == 0) | (row == D + 1), jnp.zeros_like(a2), a2)
        _fill_hw_pad_rows(pad_s, a2, z0, wrap)
        return acc

    _chunked(D + 2, _CHUNK, f1, 0)

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

    _chunked(D, _CHUNK, f2, 0)

    @pl.when(i == nb - 1)
    def _():
        y_ref[0] = xv[1 : D + 1]


def _fwd_kernel_nosave(x_ref, w1_ref, w2_ref, w3_ref, sc_ref, y_ref, xv, pad_s, *, wrap, nb):
    """Primal-only forward: identical math, no per-block save outputs.

    The saves exist solely for the backward kernel; the primal path (eval,
    embedding extraction, any un-differentiated forward) would otherwise
    write nb × volume of dead HBM traffic — 1.26 GB for the 150-block
    256-res stack."""
    _fwd_kernel(
        x_ref, w1_ref, w2_ref, w3_ref, sc_ref, None, y_ref, xv, pad_s,
        wrap=wrap, nb=nb,
    )


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    x_ref,  # (1, 1, D, H, W, C8): saved input of block j = nb-1-i
    gy_ref,  # (1, D, H, W, C8): incoming cotangent (fetched once per batch)
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    dx_ref,  # (1, D, H, W, C8)
    dw1_ref,  # (1, 1, C8, Cb8) f32, per-block
    dw2_ref,  # (1, 1, 3, 3, 3, Cb8, Cb8) f32, per-block
    dw3_ref,  # (1, 1, Cb8, C8) f32, per-block
    dsc_ref,  # (1, 1, 1, 8) f32, per-block
    xs,  # VMEM scratch (D+4, H, W, C8): block input + 2-row D-halo
    gv,  # VMEM scratch (D+2, H, W, C8): resident cotangent + D-halo rows
    u1s,  # VMEM scratch (D+4, H, W, Cb8): recomputed conv1 output
    pad2_s,  # VMEM scratch (D+4, H+2, W+2, Cb8): HW-padded a2
    gu2cs,  # VMEM scratch (D+2, H, W, Cb8): cotangent of the k3 conv output
    gpad_s,  # VMEM scratch (D+2, H+2, W+2, Cb8): HW-padded g_u2c
    *,
    wrap,
    nb,
):
    i = pl.program_id(1)
    D = gv.shape[0] - 2
    H, W = gv.shape[1], gv.shape[2]
    dt = gy_ref.dtype
    c8 = xs.shape[-1]
    cb8 = u1s.shape[-1]
    f32 = jnp.float32

    @pl.when(i == 0)
    def _():
        gv[1 : D + 1] = gy_ref[0]

    xs[2 : D + 2] = x_ref[0, 0]
    if wrap:
        xs[0] = xs[D]
        xs[1] = xs[D + 1]
        xs[D + 2] = xs[2]
        xs[D + 3] = xs[3]
        gv[0] = gv[D]
        gv[D + 1] = gv[1]
    else:
        for r in (0, 1, D + 2, D + 3):
            xs[r] = jnp.zeros_like(xs[r])
        gv[0] = jnp.zeros_like(gv[0])
        gv[D + 1] = jnp.zeros_like(gv[D + 1])

        # only the interiors are rewritten per step; borders must start zero
        @pl.when(jnp.logical_and(i == 0, pl.program_id(0) == 0))
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

    # --- Phase A (xs rows [0, D+4)): recompute a1 -> u1s, a2 -> pad2_s
    def phase_a(z0, cs, acc):
        xc = xs[pl.ds(z0, cs)]
        a1 = _elu(xc + b1a) + b1b
        u1 = _dot_last(a1, w1_ref[0], dt)
        u1s[pl.ds(z0, cs)] = u1
        a2 = _elu(u1 + b2a) + b2b
        if not wrap:
            # 'zeros' pads a2 (the conv input), not x — mask the halo rows
            # the pointwise prelude mapped away from zero.
            row = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0) + z0
            a2 = jnp.where((row <= 1) | (row >= D + 2), jnp.zeros_like(a2), a2)
        _fill_hw_pad_rows(pad2_s, a2, z0, wrap)
        return acc

    _chunked(D + 4, _CHUNK, phase_a, 0)

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
        gu2cs[pl.ds(z0, cs)] = g_u2c
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
        _CHUNK,
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
        xc = xs[pl.ds(z0 + 2, cs)]  # owned xs rows
        u1c = u1s[pl.ds(z0 + 2, cs)]
        g_u1 = g_a2 * _elu_grad(u1c + b2a)
        g_a1 = _dot_last_t(g_u1, w1_ref[0], dt)
        a1c = _elu(xc + b1a) + b1b
        g_xc = g_a1 * _elu_grad(xc + b1a)
        rows = pl.ds(z0 + 1, cs)
        gv[rows] = gv[rows] + g_xc

        guc = gu2cs[pl.ds(z0 + 1, cs)]  # owned g_u2c rows
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
        _CHUNK,
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

    dw1_ref[0, 0] = dw1a
    dw3_ref[0, 0] = dw3a
    dw2_ref[0, 0] = dw2a.reshape(3, 3, 3, cb8, cb8)
    dsc_ref[0, 0, 0] = jnp.stack(
        [d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale]
    )

    @pl.when(i == nb - 1)
    def _():
        dx_ref[0] = gv[1 : D + 1]


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


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
    b, d, h, w, c8 = x.shape
    nb, _, cb8 = w1e.shape
    wrap = pad_mode == "wrap"
    if saves:
        kern = functools.partial(_fwd_kernel, wrap=wrap, nb=nb)
        out_specs = [
            pl.BlockSpec((1, 1, d, h, w, c8), lambda bi, i: (i, bi, 0, 0, 0, 0)),
            pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, b, d, h, w, c8), x.dtype),
            jax.ShapeDtypeStruct((b, d, h, w, c8), x.dtype),
        ]
    else:
        kern = functools.partial(_fwd_kernel_nosave, wrap=wrap, nb=nb)
        out_specs = [pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((b, d, h, w, c8), x.dtype)]
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((1, c8, cb8), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((1, 3, 3, 3, cb8, cb8), lambda bi, i: (i, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, cb8, c8), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 8), lambda bi, i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((d + 2, h, w, c8), x.dtype),
            pltpu.VMEM((d + 2, h + 2, w + 2, cb8), x.dtype),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, w1e, w2e, w3e, sc8.astype(jnp.float32).reshape(nb, 1, 8))
    return (out[-1], out[0] if saves else None)


def _fwd_rule(x, w1e, w2e, w3e, sc8, pad_mode, interpret):
    y, saves = _fwd_impl(x, w1e, w2e, w3e, sc8, pad_mode, interpret, saves=True)
    return y, (saves, w1e, w2e, w3e, sc8)


def _bwd_rule(pad_mode, interpret, res, gy):
    saves, w1e, w2e, w3e, sc8 = res
    nb, b, d, h, w, c8 = saves.shape
    cb8 = w1e.shape[-1]
    wrap = pad_mode == "wrap"
    dx, dw1, dw2, dw3, dsc = pl.pallas_call(
        functools.partial(_bwd_kernel, wrap=wrap, nb=nb),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, d, h, w, c8), lambda bi, i: (nb - 1 - i, bi, 0, 0, 0, 0)
            ),
            pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((1, c8, cb8), lambda bi, i: (nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 3, 3, 3, cb8, cb8), lambda bi, i: (nb - 1 - i, 0, 0, 0, 0, 0)
            ),
            pl.BlockSpec((1, cb8, c8), lambda bi, i: (nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 8),
                lambda bi, i: (nb - 1 - i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, d, h, w, c8), lambda bi, i: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, c8, cb8), lambda bi, i: (bi, nb - 1 - i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 3, 3, 3, cb8, cb8),
                lambda bi, i: (bi, nb - 1 - i, 0, 0, 0, 0, 0),
            ),
            pl.BlockSpec((1, 1, cb8, c8), lambda bi, i: (bi, nb - 1 - i, 0, 0)),
            pl.BlockSpec((1, 1, 1, 8), lambda bi, i: (bi, nb - 1 - i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, h, w, c8), gy.dtype),
            jax.ShapeDtypeStruct((b, nb, c8, cb8), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 3, 3, 3, cb8, cb8), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, cb8, c8), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d + 4, h, w, c8), gy.dtype),  # xs
            pltpu.VMEM((d + 2, h, w, c8), gy.dtype),  # gv
            pltpu.VMEM((d + 4, h, w, cb8), gy.dtype),  # u1s
            pltpu.VMEM((d + 4, h + 2, w + 2, cb8), gy.dtype),  # pad2_s
            pltpu.VMEM((d + 2, h, w, cb8), gy.dtype),  # gu2cs
            pltpu.VMEM((d + 2, h + 2, w + 2, cb8), gy.dtype),  # gpad_s
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(saves, gy, w1e, w2e, w3e, sc8.astype(jnp.float32).reshape(nb, 1, 8))
    return (
        dx,
        dw1.sum(axis=0).astype(w1e.dtype),
        dw2.sum(axis=0).astype(w2e.dtype),
        dw3.sum(axis=0).astype(w3e.dtype),
        dsc.sum(axis=0).reshape(nb, 8).astype(sc8.dtype),
    )


preact_stack_fused.defvjp(_fwd_rule, _bwd_rule)


# Volume cap: every full-volume VMEM buffer (resident activation + recompute
# intermediates + io blocks) must fit comfortably. 8 MB bf16 volumes peak
# around ~90 MB of VMEM in the backward kernel — inside the scoped limit
# (_COMPILER_PARAMS). The 512-res level-0 stack (18.9 MB) would need
# D-chunked io; it stays on the per-block paths.
_MAX_VOLUME_BYTES = 8 * 1024 * 1024


def stack_fold(shape, n_blocks: int, dtype) -> int:
    """How many space-to-depth folds to apply before running the stack
    megakernel on an NDHWC activation — 0 = unsupported (stay on the
    XLA paths).

    Fold choice targets dense MXU lanes: 2 folds map C ≤ 4 stacks to
    64·C ∈ {64, 128, 256} lanes (the 256-res C=2 stack: 16 padded lanes
    → 128 dense), 1 fold maps C ≤ 32 to 8·C. Each fold is an exact
    weight-space rewrite (ops/s2d_conv.py) costing 8× w2 FLOPs — noise at
    these widths. Gating is VMEM capacity, even dims, and ≥2 blocks
    (single blocks don't amortize the volume load/store).

    Default-on for real single-device TPU (VQVAE3D_STACK_KERNEL=0 opts
    out). Measured v5e, 150-block 256-res C=18 stack: 17.9 ms forward,
    70.2 ms forward+backward — vs ~500 ms fwd+bwd for the XLA block-space
    scan it replaces; on-device train step 416 → 272 ms (PERF.md)."""
    if os.environ.get("VQVAE3D_STACK_KERNEL", "1") == "0":
        return 0
    if len(shape) != 5 or n_blocks < 2:
        return 0
    _, d, h, w, c = shape
    if d * h * w * c * jnp.dtype(dtype).itemsize > _MAX_VOLUME_BYTES:
        return 0
    folds = 2 if c <= 4 else (1 if c <= 32 else 0)
    for k in range(folds, 0, -1):
        s = 2**k
        if d % s == 0 and h % s == 0 and w % s == 0 and min(d, h, w) > s:
            return k
    return 0


def stack_fused_supported(shape, dtype) -> bool:
    """Gate for an ALREADY-FOLDED (B, D, H, W, C8) block-space activation:
    small enough for the whole volume (plus halos and fp32 accumulators)
    to stay VMEM-resident. See stack_fold for the NDHWC-level policy."""
    if os.environ.get("VQVAE3D_STACK_KERNEL", "1") == "0":
        return False
    _, d, h, w, c8 = shape
    itemsize = jnp.dtype(dtype).itemsize
    return d * h * w * c8 * itemsize <= _MAX_VOLUME_BYTES


__all__ = ["preact_stack_fused", "stack_fused_supported", "stack_fold"]
