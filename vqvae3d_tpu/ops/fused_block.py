"""Fused PreActFixup 'same'-block Pallas kernel in 2× block space.

One pallas_call runs an ENTIRE pre-activation Fixup resblock (reference
vqvae/layers.py:102-216): elu → 1×1×1 → elu → k3 'same' (wrap/zeros) →
elu → 1×1×1 → scale/bias/residual, on the space-to-depth activation
(ops/s2d_conv.py). XLA's lowering of this block inside the scanned stacks
runs at ~0.5-1 TFLOP/s useful — the profiled fusions interleave the conv
with pad/slice/copy ops on lane-padded layouts and round-trip every
intermediate through HBM (PERF.md). This kernel keeps all intermediates in
VMEM: per step, HBM traffic is one read of the input slab + one write of
the output tile + the (double-buffered) weight slabs.

Mosaic constraints shaped the design (probed on v5e, see PERF.md):
  * HBM→VMEM DMAs of tensors whose lane (minor) dim is not a 128-multiple
    are rejected for MANUAL `make_async_copy` — but BlockSpec-driven
    auto-copies handle them fine. So halo windows are built as OVERLAPPED
    SLABS in XLA (a stack of (TD+2h)-row slices — one cheap gather per
    block) and tiled with ordinary non-overlapping BlockSpecs.
  * Dynamic sublane slices need 8-aligned sizes; static slices (the 27 conv
    taps, python-unrolled) are unrestricted.
  * 4-D `dot_general` contracting the lane dim and leading-dim flattens
    both lower cleanly.

The conv itself is 27 tap `dot_general`s accumulating in fp32 — MXU-shaped
(contraction = 8·Cb lanes), no im2col buffer.

Gradients: a custom VJP with a mirrored backward kernel (transposed conv =
27 reversed taps of the same weights; dW = 27 voxel-contraction dots; all
per-block weight/scalar grads accumulate across grid steps in VMEM).
Forward recomputation happens inside the backward kernel from the saved
block input — composes with the lax.scan + jax.checkpoint stack runner
exactly like the XLA body.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(z):
    # jax.nn.elu lowers through expm1 (unimplemented in Mosaic) and bf16
    # comparisons are rejected on v5e — compute the select in f32.
    zf = z.astype(jnp.float32)
    return jnp.where(zf > 0, zf, jnp.exp(jnp.minimum(zf, 0.0)) - 1.0).astype(
        z.dtype
    )


def _elu_grad(z):
    zf = z.astype(jnp.float32)
    return jnp.where(zf > 0, 1.0, jnp.exp(jnp.minimum(zf, 0.0))).astype(z.dtype)


def _dot_last(a, w, out_dtype):
    """(..., K) @ (K, N) -> (..., N), fp32 accumulation."""
    return jax.lax.dot_general(
        a,
        w,
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _dot_last_t(a, w, out_dtype):
    """(..., N) @ (K, N)ᵀ -> (..., K), fp32 accumulation."""
    return jax.lax.dot_general(
        a,
        w,
        dimension_numbers=(((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _contract_voxels(a, g):
    """(T,H,W,K), (T,H,W,N) -> (K,N) fp32: flatten leading dims + one dot."""
    k = a.shape[-1]
    n = g.shape[-1]
    af = a.reshape(-1, k)
    gf = g.reshape(-1, n)
    return jax.lax.dot_general(
        af,
        gf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fill_hw_pad(pad_ref, a, wrap: bool):
    """Write a (T, H, W, C) array into pad_ref (T, H+2, W+2, C) with circular
    or zero padding on the H/W axes. Corners come from the second (H) pass
    reading the already-W-padded rows."""
    T, H, W, _ = a.shape
    if not wrap:
        pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1 : H + 1, 1 : W + 1, :] = a
    if wrap:
        pad_ref[:, 1 : H + 1, 0, :] = a[:, :, W - 1]
        pad_ref[:, 1 : H + 1, W + 1, :] = a[:, :, 0]
        pad_ref[:, 0, :, :] = pad_ref[:, H, :, :]
        pad_ref[:, H + 1, :, :] = pad_ref[:, 1, :, :]


def _read_scalars(sc_ref, dt):
    return [sc_ref[0, i].astype(dt) for i in range(8)]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xs_ref, w1_ref, w2_ref, w3_ref, sc_ref, y_ref, pad_s, *, wrap, nt):
    x = xs_ref[0]  # (TD+2, H, W, C8)
    td2, H, W, c8 = x.shape
    td = td2 - 2
    dt = x.dtype
    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)

    a1 = _elu(x + b1a) + b1b
    u1 = _dot_last(a1, w1_ref[:], dt)  # (TD+2, H, W, Cb8)
    a2 = _elu(u1 + b2a) + b2b
    if not wrap:
        # 'zeros' pads a2 (the conv input), not x: the pointwise prelude
        # maps the x-pad's zero rows to a nonzero value — mask them out.
        t = jax.lax.rem(pl.program_id(0), nt)
        row = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0)
        bad = ((row == 0) & (t == 0)) | ((row == td + 1) & (t == nt - 1))
        a2 = jnp.where(bad, jnp.zeros_like(a2), a2)
    _fill_hw_pad(pad_s, a2, wrap)

    cb8 = u1.shape[-1]
    acc = jnp.zeros((td, H, W, cb8), jnp.float32)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                v = pad_s[dz : dz + td, dy : dy + H, dx : dx + W, :]
                acc += jax.lax.dot_general(
                    v,
                    w2_ref[dz, dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    a3 = _elu(acc.astype(dt) + b3a) + b3b
    u3 = _dot_last(a3, w3_ref[:], dt)
    y_ref[0] = u3 * scale + b4 + x[1 : td + 1]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    xs_ref,  # (1, TD+4, H, W, C8) input slab, 2-row halo each side
    gs_ref,  # (1, TD+2, H, W, C8) cotangent slab, 1-row halo
    w1_ref,
    w2_ref,
    w3_ref,
    sc_ref,
    dx_ref,  # (1, TD, H, W, C8)
    dw1_ref,  # (C8, Cb8) f32, accumulated
    dw2_ref,  # (3, 3, 3, Cb8, Cb8) f32, accumulated
    dw3_ref,  # (Cb8, C8) f32, accumulated
    dsc_ref,  # (1, 8) f32, accumulated
    pad2_s,  # (TD+4, H+2, W+2, Cb8)
    gpad_s,  # (TD+2, H+2, W+2, Cb8)
    *,
    wrap,
    nt,
):
    x = xs_ref[0]  # (TD+4, H, W, C8)
    g = gs_ref[0]  # (TD+2, H, W, C8)
    td4, H, W, c8 = x.shape
    td = td4 - 4
    dt = x.dtype
    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = _read_scalars(sc_ref, dt)

    # --- forward recompute on the slab
    a1 = _elu(x + b1a) + b1b
    u1 = _dot_last(a1, w1_ref[:], dt)
    a2 = _elu(u1 + b2a) + b2b
    if not wrap:
        # see _fwd_kernel: 'zeros' pads a2, not x (2-row halo here)
        t = jax.lax.rem(pl.program_id(0), nt)
        row = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0)
        bad = ((row <= 1) & (t == 0)) | ((row >= td + 2) & (t == nt - 1))
        a2 = jnp.where(bad, jnp.zeros_like(a2), a2)
    _fill_hw_pad(pad2_s, a2, wrap)
    cb8 = u1.shape[-1]
    # u2c local row r covers global row t0-1+r (the g-slab's coords):
    # u2c[r] = sum_dz pad2[r+dz] . w2[dz]  for r in [0, TD+2)
    u2acc = jnp.zeros((td + 2, H, W, cb8), jnp.float32)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                v = pad2_s[dz : dz + td + 2, dy : dy + H, dx : dx + W, :]
                u2acc += jax.lax.dot_general(
                    v,
                    w2_ref[dz, dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    u2c = u2acc.astype(dt)
    a3 = _elu(u2c + b3a) + b3b  # (TD+2, H, W, Cb8)

    # --- backward
    g_u3 = g * scale  # (TD+2, H, W, C8)
    g_a3 = _dot_last_t(g_u3, w3_ref[:], dt)  # (TD+2, H, W, Cb8)
    g_u2c = g_a3 * _elu_grad(u2c + b3a)  # (TD+2, H, W, Cb8)

    own = slice(1, td + 1)  # owned rows in g-slab/u2c coords
    u3_own = _dot_last(a3[own], w3_ref[:], dt)
    g_own = g[own]
    d_scale = jnp.sum((g_own * u3_own).astype(jnp.float32))
    d_b4 = jnp.sum(g_own.astype(jnp.float32))
    d_b3b = jnp.sum(g_a3[own].astype(jnp.float32))
    d_b3a = jnp.sum(g_u2c[own].astype(jnp.float32))

    dw3 = _contract_voxels(a3[own], g_u3[own])

    # dW2: tap (dz,dy,dx) pairs pad2 rows [1+dz, 1+dz+TD) with owned g_u2c
    # (owned u2c rows r in [1, TD+1) use pad2 rows r+dz)
    g_u2c_own = g_u2c[own]
    dw2_taps = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                v = pad2_s[1 + dz : 1 + dz + td, dy : dy + H, dx : dx + W, :]
                dw2_taps.append(_contract_voxels(v, g_u2c_own))

    # transposed conv: g_a2 on owned x-slab rows [2, TD+2)
    _fill_hw_pad(gpad_s, g_u2c, wrap)
    ga2acc = jnp.zeros((td, H, W, cb8), jnp.float32)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                v = gpad_s[2 - dz : 2 - dz + td, 2 - dy : 2 - dy + H, 2 - dx : 2 - dx + W, :]
                ga2acc += jax.lax.dot_general(
                    v,
                    w2_ref[dz, dy, dx],
                    dimension_numbers=(((3,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    g_a2 = ga2acc.astype(dt)  # (TD, H, W, Cb8)

    xo = slice(2, td + 2)  # owned rows in x-slab coords
    g_u1 = g_a2 * _elu_grad(u1[xo] + b2a)
    d_b2b = jnp.sum(g_a2.astype(jnp.float32))
    d_b2a = jnp.sum(g_u1.astype(jnp.float32))
    g_a1 = _dot_last_t(g_u1, w1_ref[:], dt)
    dw1 = _contract_voxels(a1[xo], g_u1)
    g_xc = g_a1 * _elu_grad(x[xo] + b1a)
    d_b1b = jnp.sum(g_a1.astype(jnp.float32))
    d_b1a = jnp.sum(g_xc.astype(jnp.float32))

    dx_ref[0] = g_own + g_xc

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        dsc_ref[:] = jnp.zeros_like(dsc_ref)

    dw1_ref[:] += dw1
    dw3_ref[:] += dw3
    i = 0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                dw2_ref[dz, dy, dx] += dw2_taps[i]
                i += 1
    dsc_ref[:] += jnp.stack(
        [d_b1a, d_b1b, d_b2a, d_b2b, d_b3a, d_b3b, d_b4, d_scale]
    ).reshape(1, 8)


# ---------------------------------------------------------------------------
# Wrappers: slab construction + pallas_call + custom VJP
# ---------------------------------------------------------------------------


# The default scoped-vmem limit is 16 MB; v5e has far more physical VMEM.
# The backward kernel's live set (slab + recompute intermediates + fp32
# accumulators) peaks around 24 MB at TD=4 — raise the cap instead of
# shrinking TD to 1 (which would quintuple halo recompute).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _pad_d(x, halo: int, wrap: bool):
    """Pad the D axis of (B, D, H, W, C) by `halo` rows each side."""
    if wrap:
        return jnp.concatenate([x[:, -halo:], x, x[:, :halo]], axis=1)
    z = jnp.zeros((x.shape[0], halo, *x.shape[2:]), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _make_slabs(xp, td: int, width: int):
    """(B, D+2h, H, W, C) -> (B·NT, width, H, W, C), slab t at row t·td."""
    b = xp.shape[0]
    d = xp.shape[1] - (width - td)
    nt = d // td
    s = jnp.stack([xp[:, t * td : t * td + width] for t in range(nt)], axis=1)
    return s.reshape(b * nt, width, *xp.shape[2:])


def _pick_td(d: int, h: int, w: int, c8: int, cb8: int, itemsize: int) -> int:
    """Largest TD with a comfortable VMEM footprint (slabs double-buffered)."""
    override = os.environ.get("VQVAE3D_FUSED_TD")
    if override:
        return int(override)
    for td in (16, 8, 4, 2, 1):
        if d % td:
            continue
        slab = 2 * (td + 4) * h * w * c8 * itemsize
        interm = 3 * (td + 4) * (h + 2) * (w + 2) * cb8 * itemsize
        acc = (td + 2) * h * w * cb8 * 4 * 2
        out = 2 * td * h * w * c8 * itemsize
        if slab + interm + acc + out < 11 * 1024 * 1024:
            return td
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def preact_block_fused(x, w1e, w2e, w3e, scalars8, pad_mode: str, interpret: bool):
    """Fused 'same' PreActFixupResBlock on a block-space activation.

    x: (B, D, H, W, C8); w1e (C8, Cb8), w2e (3,3,3,Cb8,Cb8), w3e (Cb8, C8)
    are the block-space-embedded weights (ops/s2d_conv.py), already cast to
    x.dtype; scalars8: (8,) f32 = (b1a,b1b,b2a,b2b,b3a,b3b,b4,scale).
    Matches ops/s2d_conv.py::preact_fixup_same_block exactly.
    """
    return _fwd_impl(x, w1e, w2e, w3e, scalars8, pad_mode, interpret)


def _fwd_impl(x, w1e, w2e, w3e, scalars8, pad_mode, interpret):
    b, d, h, w, c8 = x.shape
    cb8 = w1e.shape[-1]
    wrap = pad_mode == "wrap"
    td = _pick_td(d, h, w, c8, cb8, x.dtype.itemsize)
    nt = d // td
    xs = _make_slabs(_pad_d(x, 1, wrap), td, td + 2)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, wrap=wrap, nt=nt),
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec((1, td + 2, h, w, c8), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((c8, cb8), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, 3, cb8, cb8), lambda i: (0, 0, 0, 0, 0)),
            pl.BlockSpec((cb8, c8), lambda i: (0, 0)),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, td, h, w, c8), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nt, td, h, w, c8), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((td + 2, h + 2, w + 2, cb8), x.dtype),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xs, w1e, w2e, w3e, scalars8.astype(jnp.float32).reshape(1, 8))
    return y.reshape(b, d, h, w, c8)


def _fwd_rule(x, w1e, w2e, w3e, scalars8, pad_mode, interpret):
    y = _fwd_impl(x, w1e, w2e, w3e, scalars8, pad_mode, interpret)
    return y, (x, w1e, w2e, w3e, scalars8)


def _bwd_rule(pad_mode, interpret, res, gy):
    x, w1e, w2e, w3e, scalars8 = res
    b, d, h, w, c8 = x.shape
    cb8 = w1e.shape[-1]
    wrap = pad_mode == "wrap"
    td = _pick_td(d, h, w, c8, cb8, x.dtype.itemsize)
    nt = d // td
    xs = _make_slabs(_pad_d(x, 2, wrap), td, td + 4)
    gs = _make_slabs(_pad_d(gy, 1, wrap), td, td + 2)
    dx, dw1, dw2, dw3, dsc = pl.pallas_call(
        functools.partial(_bwd_kernel, wrap=wrap, nt=nt),
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec((1, td + 4, h, w, c8), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, td + 2, h, w, c8), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((c8, cb8), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, 3, cb8, cb8), lambda i: (0, 0, 0, 0, 0)),
            pl.BlockSpec((cb8, c8), lambda i: (0, 0)),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, td, h, w, c8), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((c8, cb8), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, 3, cb8, cb8), lambda i: (0, 0, 0, 0, 0)),
            pl.BlockSpec((cb8, c8), lambda i: (0, 0)),
            pl.BlockSpec((1, 8), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * nt, td, h, w, c8), x.dtype),
            jax.ShapeDtypeStruct((c8, cb8), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, 3, cb8, cb8), jnp.float32),
            jax.ShapeDtypeStruct((cb8, c8), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((td + 4, h + 2, w + 2, cb8), x.dtype),
            pltpu.VMEM((td + 2, h + 2, w + 2, cb8), x.dtype),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xs, gs, w1e, w2e, w3e, scalars8.astype(jnp.float32).reshape(1, 8))
    return (
        dx.reshape(b, d, h, w, c8),
        dw1.astype(w1e.dtype),
        dw2.astype(w2e.dtype),
        dw3.astype(w3e.dtype),
        dsc.reshape(8).astype(scalars8.dtype),
    )


preact_block_fused.defvjp(_fwd_rule, _bwd_rule)


def fused_stack_supported(c8: int, spatial: Tuple[int, int, int]) -> bool:
    """Gate for using the fused kernel inside apply_same_stack's block-space
    scan. Currently OPT-IN (VQVAE3D_FUSED_STACK=1), real TPU, single device.

    Measured v5e (256-res published config): the fused stack wins in
    ISOLATION — 300 ms vs 500 ms fwd+bwd for the 150-block C=18 stack,
    33 vs 36 ms for the 5-block C=8 stack — but LOSES in the full train
    step (671 vs 456 ms wall). The profiled step is DMA-bound and ~2.9×
    op-overlapped end-to-end; XLA hides the stack's copies under other
    ops' compute, while an opaque Mosaic kernel owns the core and its
    slab DMAs serialize against the surrounding schedule, so the kernel's
    time adds to the critical path ~1:1. Until the kernel itself is fast
    enough to win without overlap (see PERF.md roadmap), it stays opt-in.
    Single-device only — under GSPMD the pallas_call would force gathers
    of the sharded volume (multi-chip stays on the XLA body)."""
    mode = os.environ.get("VQVAE3D_FUSED_STACK", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True  # hard force (single-device runs only — caller's call)
    return False


__all__ = ["preact_block_fused", "fused_stack_supported"]
