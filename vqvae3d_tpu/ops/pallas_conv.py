"""Pallas TPU kernels for small-channel 3D-conv gradients.

Why this exists (PERF.md §4-5, VERDICT r1 #1): XLA lowers the weight
gradient of C≤32 convs either to loop fusions that crawl the volume at
~2/128 lane utilization, or — with the shifted-dot custom VJP — to k³
HBM-materialized shifted slices whose C-minor layouts get padded to
128-lane tiles (up to 32× memory amplification). Both are far off the
memory-bandwidth speed of light for what is a bandwidth-bound op.

``dw_conv3d_pallas`` computes dW for a stride-1 VALID NDHWC conv in ONE
pass over x and g:

  * x stays in HBM; the kernel manually DMAs an (kd, TH+kh-1, Wp, Cin)
    halo slab per grid step, double-buffered so the copy of step i+1
    overlaps the compute of step i (BlockSpec tiling can't express
    overlapping halo windows — hence the hand-rolled pipeline).
  * per step, the (kd·kh) depth/height-shifted views of the slab are
    concatenated along channels into A (M, kd·kh·Cin) and the kw
    width-shifted zero-padded views of the g tile into B (M, kw·Cout),
    where M = TH·Wp. One MXU dot contracting M yields the complete
    (kd·kh·Cin, kw·Cout) = dW tile with ZERO wasted FLOPs — the
    width-shift lives on the g side so kd·kh·Cin × kw·Cout = k³·Cin·Cout
    exactly.
  * the dW output block maps to the same block every grid step and is
    accumulated in fp32 in VMEM (TPU grids are sequential), written back
    to HBM once.

HBM traffic: g once, x ≈ kd·(TH+kh-1)/TH times (~3.4× for k=3, TH=16) —
vs the shifted-dot path's 27 lane-padded volume reads.

Reference hot path this accelerates: the pre/post-quantization 'same'
resblock stacks of /root/reference/vqvae/layers.py:102-216 (50-150 blocks
per level at the published configs).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(ho: int) -> int:
    """Largest H-tile ≤ 16 dividing Ho (grid shapes here are powers of 2)."""
    for th in (16, 8, 4, 2, 1):
        if ho % th == 0:
            return th
    return 1


def dw_conv3d_supported(x_shape, w_shape, stride) -> bool:
    """Eligibility for the Pallas dW kernel (else caller falls back).

    KNOWN ISSUE (r2): the compiled kernel crashes the Mosaic compiler on
    real TPU (remote tpu_compile_helper exits 1; at small shapes the error
    is a memref_slice lane-alignment reject on the halo slab — the
    hand-rolled DMA + in-kernel (th, wp, cin)→(th·wp, cin) reshapes cross
    tiled dims). Until restructured, the kernel is interpret-mode only
    (tests) and real-TPU training uses the shifted-dot fallback in
    ops/conv3d.py. Set VQVAE3D_PALLAS_DW=1 to force-enable on TPU.
    """
    import os

    import jax

    kd, kh, kw, cin, cout = w_shape
    b, dp, hp, wp, _ = x_shape
    if jax.default_backend() == "tpu" and os.environ.get("VQVAE3D_PALLAS_DW") != "1":
        return False
    if tuple(stride) != (1, 1, 1):
        return False
    if kd < 1 or (kd, kh, kw) == (1, 1, 1):
        return False  # 1x1x1 convs are plain dots already
    ho = hp - kh + 1
    th = _pick_th(ho)
    m = th * wp
    # VMEM budget: double-buffered x slab + A/B concats (fp32 worst case)
    slab = 2 * kd * (th + kh - 1) * wp * cin * 4
    a_b = m * (kd * kh * cin + kw * cout) * 4
    return slab + a_b < 24 * 1024 * 1024 // 4  # ≤ ~6 MB of ~16 MB VMEM


def _dw_kernel(x_hbm, g_ref, out_ref, xbuf, sem, *, kd, kh, kw, th, do, ht_n):
    """One grid step: dW partial for output-depth slice ``od``, H-tile ``ht``
    of batch ``b`` (grid collapsed 1-D: step = (b·Do + od)·HT + ht)."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    thp = th + kh - 1
    wp = x_hbm.shape[3]
    cin = x_hbm.shape[4]
    cout = g_ref.shape[4]
    wo = wp - kw + 1

    def make_dma(i, slot):
        ht = jax.lax.rem(i, ht_n)
        r = jax.lax.div(i, ht_n)
        od = jax.lax.rem(r, do)
        b = jax.lax.div(r, do)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(od, kd), pl.ds(ht * th, thp)],
            xbuf.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        make_dma(step, slot).start()

    @pl.when(step + 1 < nsteps)
    def _():
        make_dma(step + 1, jax.lax.rem(step + 1, 2)).start()

    make_dma(step, slot).wait()
    xs = xbuf[slot]  # (kd, THP, Wp, Cin)

    # A: (M, kd·kh·Cin) — depth/height-shifted views of the slab
    a_parts = []
    for i in range(kd):
        for j in range(kh):
            a_parts.append(xs[i, j : j + th].reshape(th * wp, cin))
    a = jnp.concatenate(a_parts, axis=-1) if len(a_parts) > 1 else a_parts[0]

    # B: (M, kw·Cout) — width-shifted zero-padded views of the g tile
    g = g_ref[0, 0]  # (TH, Wo, Cout)
    gext = jnp.pad(g, ((0, 0), (kw - 1, kw - 1), (0, 0)))
    b_parts = []
    for k in range(kw):
        b_parts.append(gext[:, kw - 1 - k : kw - 1 - k + wp].reshape(th * wp, cout))
    bmat = jnp.concatenate(b_parts, axis=-1) if len(b_parts) > 1 else b_parts[0]

    partial = jax.lax.dot_general(
        a,
        bmat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (kd·kh·Cin, kw·Cout)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial


@functools.partial(jax.jit, static_argnames=("kernel_shape", "interpret"))
def dw_conv3d_pallas(
    xp: jax.Array,
    g: jax.Array,
    kernel_shape: Tuple[int, int, int],
    interpret: bool | None = None,
) -> jax.Array:
    """Weight gradient of a stride-1 VALID NDHWC conv3d.

    xp: (B, Dp, Hp, Wp, Cin) pre-padded input; g: (B, Do, Ho, Wo, Cout)
    output cotangent with Do=Dp-kd+1 etc. Returns (kd, kh, kw, Cin, Cout)
    fp32 — dW[κ, ci, co] = Σ_pos xp[pos+κ, ci] · g[pos, co].
    """
    kd, kh, kw = kernel_shape
    b, dp, hp, wp, cin = xp.shape
    _, do, ho, wo, cout = g.shape
    assert (do, ho, wo) == (dp - kd + 1, hp - kh + 1, wp - kw + 1), (
        xp.shape,
        g.shape,
        kernel_shape,
    )
    th = _pick_th(ho)
    ht_n = ho // th
    nsteps = b * do * ht_n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(
            _dw_kernel, kd=kd, kh=kh, kw=kw, th=th, do=do, ht_n=ht_n
        ),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (1, 1, th, wo, cout),
                lambda i: (
                    jax.lax.div(jax.lax.div(i, ht_n), do),
                    jax.lax.rem(jax.lax.div(i, ht_n), do),
                    jax.lax.rem(i, ht_n),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (kd * kh * cin, kw * cout), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kd * kh * cin, kw * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, kd, th + kh - 1, wp, cin), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, g)

    # (kd·kh·Cin, kw·Cout) → (kd, kh, kw, Cin, Cout)
    return (
        out.reshape(kd, kh, cin, kw, cout).transpose(0, 1, 3, 2, 4)
    )
