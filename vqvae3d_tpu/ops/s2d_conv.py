"""Space-to-depth-domain convolutions: exact weight-space rewrites that keep
mid-width (C = 8..32) activations lane-dense on TPU.

Why (profiled, see PERF.md): XLA materializes NDHWC tensors with the channel
minor dim padded to 128 lanes. The packed (B, C, D, H·W) path
(ops/packed_blocks.py) fixes this for C ≤ 4 via scalar expansion, but the
down/up-scale stages and the post-down/up 'same' stacks run at C = 8..64 over
large grids — scalar expansion there blows up compile time, while the stock
conv pays an 8-16× HBM padding tax.

The fix: run those convs in the space-to-depth domain. ``s2d(x, 2)`` packs
2×2×2 voxel blocks into channels (8C ≥ 64 lanes — dense), and every conv in
the reference architecture has an EXACT equivalent on the packed tensor via a
pure rearrangement (or sparse embedding) of its own weights:

  * k4-stride2 conv  ==  k2-stride1 conv on s2d(x) with the (4,4,4,C,Co)
    kernel rearranged to (2,2,2,8C,Co).  Zero extra FLOPs; the weight
    gradient becomes a stride-1 one-dot (ops/conv3d.py) instead of the
    27-slice strided fallback.
  * k3-stride1 'same' conv  ==  k3-stride1 'same' conv in block space with
    the (3,3,3,C,Co) kernel embedded into (3,3,3,8C,8Co).  The block kernel
    is ~8× denser in storage (each output phase only reaches a 2³ sub-window
    of the 3³ block taps), i.e. 8× the FLOPs — irrelevant at the <1% MFU
    these stages run at, while HBM traffic drops up to 16×.
  * 1×1×1 conv  ==  1×1×1 conv with the (C,Co) matrix embedded block-
    diagonally into (8C,8Co).

'wrap' (circular) and 'zeros' padding both map exactly to the same padding in
block space whenever the spatial dims are even — true for every grid in the
reference configs (/root/reference/vqvae/layers.py:102-216 same-blocks,
:124-151 k4s2 down convs at 512/256-res).

All transforms here are traced (jit-time) functions of the weights, so the
parameter tree is IDENTICAL to the stock path — checkpoints interconvert
freely and the torch converter is unaffected.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.ops.conv3d import conv3d, k4s2_block_kernel
from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth


def k4s2p1_fold_kernel(w: jax.Array) -> jax.Array:
    """(4,4,4,C,Co) -> (3,3,3,8C,Co): k4-stride2-PAD1 conv as a pad-1
    stride-1 conv taking an ALREADY-FOLDED s2d(x,2) input.

    Unlike ``k4s2_block_kernel`` (which handles the pre-padded VALID form
    and needs the pad applied at full resolution first), this kernel folds
    the pad too: out[q] = Σ_k w[k]·x[2q+k−1]; writing 2q+k−1 = 2(q+δ)+s
    places tap k at folded offset δ = (k−1)//2 ∈ {−1,0,1}, input phase
    s = (k−1) mod 2 — a 3-tap folded conv with 'same' pad 1. Padding the
    FOLDED tensor by 1 is exact for both modes: tap δ=−1 reads only
    phase 1 of block −1 (= x[−1], the wrapped/zero full-res pad) and
    δ=+1 only phase 0 of block N/2 (= x[N]). Output lands on the folded
    grid with UNfolded channels — the stride-2 halving and the fold
    cancel. Used by the literal-stem (stem=1) folded serving path
    (reference down convs: vqvae/layers.py:124-151).
    """
    assert w.shape[:3] == (4, 4, 4), w.shape
    sel = np.zeros((3, 2), np.int64)  # [j, s] -> k+1 (0 = no tap)
    for j in range(3):
        for s in range(2):
            k = 2 * (j - 1) + s + 1
            if 0 <= k <= 3:
                sel[j, s] = k + 1
    wp = jnp.pad(w, ((1, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    s0 = jnp.asarray(sel)
    wb = wp[
        s0[:, :, None, None, None, None],
        s0[None, None, :, :, None, None],
        s0[None, None, None, None, :, :],
    ]
    # (j0,s0,j1,s1,j2,s2,C,Co) -> (j0,j1,j2,s0,s1,s2,C,Co)
    wb = wb.transpose(0, 2, 4, 1, 3, 5, 6, 7)
    c, co = w.shape[3:]
    return wb.reshape(3, 3, 3, 8 * c, co)


def k2s2_fold_kernel(w: jax.Array) -> jax.Array:
    """(2,2,2,C,Co) -> (1,1,1,8C,Co): k2-stride2 conv on an already-folded
    s2d(x,2) input is a plain channel contraction (pure reshape — the taps
    ARE the phases). Output on the folded grid with unfolded channels."""
    assert w.shape[:3] == (2, 2, 2), w.shape
    return w.reshape(1, 1, 1, 8 * w.shape[3], w.shape[4])


def conv_k4s2_via_s2d(xp: jax.Array, w: jax.Array) -> jax.Array:
    """k4-stride2 VALID conv on pre-padded NDHWC ``xp`` via block space.

    Requires every padded spatial dim to be even (k4s2p1 on even input dims
    always is: D+2). Output is identical to the direct conv.
    """
    assert all(s % 2 == 0 for s in xp.shape[1:4]), xp.shape
    return conv3d(space_to_depth(xp, 2), k4s2_block_kernel(w), stride=1)


def k3s1_block_kernel(w: jax.Array) -> jax.Array:
    """(3,3,3,C,Co) -> (3,3,3,8C,8Co): 'same' k3 conv in 2× block space.

    out[2q+r] = Σ_k w[k]·x[2q+r+k-1]; writing r+k-1 = 2δ+s places tap k of
    output phase r at block offset δ = floor((r+k-1)/2) ∈ {-1,0,1}, input
    phase s = (r+k-1) mod 2. Block conv runs 'same' with pad 1, so block
    kernel index is δ+1. Each (r, k) hits a unique (δ, s): the embedding is
    an assignment, never a sum.
    """
    assert w.shape[:3] == (3, 3, 3), w.shape
    wb, pad_b = stride1_block_kernel(w, ((1, 1),) * 3)
    assert pad_b == ((1, 1),) * 3
    return wb


def conv_k3s1_same_via_s2d(x: jax.Array, w: jax.Array, pad_mode: str) -> jax.Array:
    """'same' k3 conv on NDHWC ``x`` (even spatial dims) via 2× block space."""
    assert all(s % 2 == 0 for s in x.shape[1:4]), x.shape
    out = conv3d(
        space_to_depth(x, 2),
        k3s1_block_kernel(w),
        padding=[(1, 1)] * 3,
        pad_mode=pad_mode,
    )
    return depth_to_space(out, 2)


def conv1x1_block_kernel(w: jax.Array) -> jax.Array:
    """(1,1,1,C,Co) -> (1,1,1,8C,8Co): phase-block-diagonal embedding."""
    c, co = w.shape[-2:]
    eye = jnp.eye(8, dtype=w.dtype)
    wb = jnp.einsum("pq,co->pcqo", eye, w[0, 0, 0]).reshape(8 * c, 8 * co)
    return wb[None, None, None]


def stride1_block_kernel(
    w: jax.Array, pad: Tuple[Tuple[int, int], ...]
) -> Tuple[jax.Array, Tuple[Tuple[int, int], ...]]:
    """Embed ANY stride-1 explicitly-padded conv into 2× block space.

    (K0,K1,K2,C,Co), pad ((lo,hi)×3)  →  (J0,J1,J2,8C,8Co), block pad, s.t.

      conv(x, w, padding=pad) ==
          d2s(conv(s2d(x,2), wb, padding=pad_b), 2)

    exactly, for zeros AND wrap padding, whenever x's spatial dims and the
    output dims are even. Derivation: out[2q+r] = Σ_k w[k]·x[2q+r+k−lo];
    writing r+k−lo = 2δ+s places tap k of output phase r at block offset
    δ = floor((r+k−lo)/2), input phase s — each (r,k) hits a unique (δ,s).
    Block tap range [δ_min, δ_max] gives J = δ_max−δ_min+1, lo_b = −δ_min =
    ceil(lo/2), and hi_b completes the output block count. Generalizes
    k3s1_block_kernel (K=3, pad 1 → J=3, pad_b 1) and covers the causal
    convs' asymmetric front padding (reference pixel_model/layers.py:193-215).
    """
    K = w.shape[:3]
    axes = []
    for a in range(3):
        lo, hi = pad[a]
        lo_b = (lo + 1) // 2
        d_min, d_max = -lo_b, (K[a] - lo) // 2
        J = d_max - d_min + 1
        # output blocks per input block: M = N+lo+hi-K+1 (even); Mb = M/2;
        # Nb + lo_b + hi_b - J + 1 = Mb = (N+lo+hi-K+1)/2
        # hi_b independent of N: (lo+hi-K+1)/2 - lo_b + J - 1
        m_extra = lo + hi - K[a] + 1
        assert m_extra % 2 == 0, (
            f"axis {a}: output parity changes (K={K[a]}, pad={pad[a]}); "
            "block space needs even output dims"
        )
        hi_b = m_extra // 2 - lo_b + J - 1
        assert hi_b >= 0, (a, K[a], pad[a])
        sel = np.zeros((J, 2, 2), np.int64)  # [j, s, r] -> k+1 (0 = no tap)
        for r in range(2):
            for k in range(K[a]):
                t = r + k - lo
                d, s = t // 2, t % 2
                sel[d - d_min, s, r] = k + 1
        axes.append((sel, (lo_b, hi_b)))

    wp = jnp.pad(w, ((1, 0), (1, 0), (1, 0), (0, 0), (0, 0)))  # 0-slot at k=-1
    s0, s1, s2 = (jnp.asarray(a[0]) for a in axes)
    wb = wp[
        s0[:, :, :, None, None, None, None, None, None],
        s1[None, None, None, :, :, :, None, None, None],
        s2[None, None, None, None, None, None, :, :, :],
    ]
    # (J0,2,2, J1,2,2, J2,2,2, C, Co) -> (j0,j1,j2, s0,s1,s2,c, r0,r1,r2,co)
    wb = wb.transpose(0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10)
    c, co = w.shape[3:]
    wb = wb.reshape(
        axes[0][0].shape[0], axes[1][0].shape[0], axes[2][0].shape[0],
        8 * c, 8 * co,
    )
    return wb, tuple(a[1] for a in axes)


# Shared with ops/packed_blocks.py: grids below this are op-overhead-bound
# and the stock NDHWC path is fine.
_MIN_VOXELS = 32 * 64 * 64


def block_rewrite_enabled() -> bool:
    """Trace-time kill switch for every block-space (s2d) conv rewrite.

    VQVAE3D_BLOCK_REWRITE=0 disables them all: at full-res C=4 (the
    literal reference stem) XLA can materialize the rewrite's fold input
    at a 32x-padded layout (8 GB per copy at 512-res -> HBM OOM); the
    literal serving bench runs with rewrites off (bench.py)."""
    import os

    return os.environ.get("VQVAE3D_BLOCK_REWRITE", "1") != "0"


def block_stack_ok(channels: int, spatial: Tuple[int, int, int], n_blocks: int) -> bool:
    """Should a stack of 'same' PreActFixup blocks run in 2× block space?

    Complements packed_stack_ok (which owns C ≤ 4 via scalar expansion):
    block space pays off for mid widths where 8C fills the 128 lanes XLA
    would otherwise pad to. Above C=32 the stock NDHWC layout is already
    ≥ 1/4 dense and block space's 8× w2 FLOPs start to matter.
    """
    if not block_rewrite_enabled():
        return False
    d, h, w = spatial
    if not (channels <= 32):
        return False
    if d % 2 or h % 2 or w % 2:
        return False  # can't space-to-depth odd dims
    if d * h * w < _MIN_VOXELS:
        return False  # tiny grids are op-overhead-bound
    return n_blocks >= 1


def preact_fixup_same_block(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    scalars,
    *,
    pad_mode: str,
) -> jax.Array:
    """One 'same'-mode PreActFixupResBlock on a space-to-depth activation.

    x: (B, D/2, H/2, W/2, 8C); weights are the stock NDHWC parameters
    (1,1,1,C,Cb), (3,3,3,Cb,Cb), (1,1,1,Cb,C) — embedded into block space at
    trace time. Mirrors models/blocks.py::preact_fixup_same_ndhwc exactly
    (which mirrors reference vqvae/layers.py:102-216); scalar biases and elu
    are elementwise and phase-invariant, so they commute with s2d verbatim.
    """
    dt = x.dtype
    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = (s.astype(dt) for s in scalars)
    act = jax.nn.elu
    out = act(x + b1a) + b1b
    out = conv3d(out, conv1x1_block_kernel(w1))
    out = act(out + b2a) + b2b
    out = conv3d(
        out, k3s1_block_kernel(w2), padding=[(1, 1)] * 3, pad_mode=pad_mode
    )
    out = act(out + b3a) + b3b
    out = conv3d(out, conv1x1_block_kernel(w3))
    return out * scale + b4 + x


__all__ = [
    "k4s2_block_kernel",
    "k3s1_block_kernel",
    "conv1x1_block_kernel",
    "conv_k4s2_via_s2d",
    "conv_k3s1_same_via_s2d",
    "block_stack_ok",
    "preact_fixup_same_block",
]


# ---------------------------------------------------------------------------
# Composite ResizeConv: trilinear ×2 upsample ∘ conv as ONE coarse-grid conv
# ---------------------------------------------------------------------------

# Per-axis transfer tables for the ×2 trilinear upsample (align_corners
# =False: fine 2j = 0.75·x[j] + 0.25·x[j-1], fine 2j+1 = 0.75·x[j] +
# 0.25·x[j+1], borders CLAMPED) composed with a stride-1 fine-grid conv.
# For output coarse row i, phase p, fine tap t, the fine sample 2i+p+t is a
# linear combination of coarse rows; m = p+t selects the entry. Rows are
# keyed by relative offset ('rel', s) in the interior and by absolute index
# ('abs', 0|1|'first'|'last'|'last-1') at the borders; the conv's own
# padding of the upsampled tensor supplies fine −1 / 2D (zero under
# 'zeros', the wrapped clamped value under 'wrap').
def _resize_axis_rows(mode: str, m: int, pad_mode: str):
    if mode == "int":
        return {
            -1: [(("rel", -1), 0.75), (("rel", 0), 0.25)],
            0: [(("rel", 0), 0.75), (("rel", -1), 0.25)],
            1: [(("rel", 0), 0.75), (("rel", 1), 0.25)],
            2: [(("rel", 1), 0.75), (("rel", 0), 0.25)],
        }[m]
    if mode == "lo":
        return {
            -1: [(("abs", "last"), 1.0)] if pad_mode == "wrap" else [],
            0: [(("abs", 0), 1.0)],  # clamped: 0.75·x[0] + 0.25·x[-1→0]
            1: [(("abs", 0), 0.75), (("abs", 1), 0.25)],
            2: [(("abs", 1), 0.75), (("abs", 0), 0.25)],
        }[m]
    assert mode == "hi"
    return {
        -1: [(("abs", "last-1"), 0.75), (("abs", "last"), 0.25)],
        0: [(("abs", "last"), 0.75), (("abs", "last-1"), 0.25)],
        1: [(("abs", "last"), 1.0)],  # clamped
        2: [(("abs", "first"), 1.0)] if pad_mode == "wrap" else [],
    }[m]


def _resize_combo_kernel(w, modes, pad_mode: str):
    """Tap-indexed composite kernel for one border combo.

    Returns {(row_key1, row_key2, row_key3): (Cin, 8·Cout) matrix} where the
    composite output at phase (p1,p2,p3) sums x[row1,row2,row3] @ M over the
    keys. ``w`` is the fine-grid (K,K,K,Cin,Cout) kernel (K ∈ {1,3})."""
    K = w.shape[0]
    cin, cout = w.shape[-2:]
    taps = list(range(-1, 2)) if K == 3 else [0]
    acc = {}  # (row_key1, row_key2, row_key3) -> {phase: coef·w sum}
    for p1 in range(2):
        for p2 in range(2):
            for p3 in range(2):
                ph = (p1 * 2 + p2) * 2 + p3
                for i1, t1 in enumerate(taps):
                    r1s = _resize_axis_rows(modes[0], p1 + t1, pad_mode)
                    for i2, t2 in enumerate(taps):
                        r2s = _resize_axis_rows(modes[1], p2 + t2, pad_mode)
                        for i3, t3 in enumerate(taps):
                            r3s = _resize_axis_rows(modes[2], p3 + t3, pad_mode)
                            wt = w[i1, i2, i3]  # (Cin, Cout)
                            for k1, c1 in r1s:
                                for k2, c2 in r2s:
                                    for k3, c3 in r3s:
                                        phs = acc.setdefault((k1, k2, k3), {})
                                        phs[ph] = (
                                            phs.get(ph, 0.0) + (c1 * c2 * c3) * wt
                                        )
    zero = jnp.zeros((cin, cout), w.dtype)
    return {
        key: jnp.concatenate(
            [phs.get(ph, zero) for ph in range(8)], axis=-1
        )  # (Cin, 8·Cout), phase-major channel order == space_to_depth
        for key, phs in acc.items()
    }


def resize_conv_s2d(x: jax.Array, w: jax.Array, pad_mode: str) -> jax.Array:
    """Trilinear-×2-upsample-then-conv as ONE conv on the coarse grid.

    (B, D1, D2, D3, Cin) → (B, D1, D2, D3, 8·Cout) in space-to-depth layout:
    exactly ``conv3d(upsample2x_to_s2d(x), stride1_block_kernel-of-w)`` —
    i.e. the reference ResizeConv3D (vqvae/layers.py:591-597) in block space
    — but with the fixed trilinear weights COMPOSED into the learned kernel.
    The upsampled 8·Cin-lane tensor never exists and the conv contracts Cin
    instead of 8·Cin lanes: 8× fewer FLOPs and ~8× less input traffic than
    the fine-grid block conv (profiled: the decoder's 512-res UpBlock paid
    ~12 ms/step just materializing the upsample — PERF.md).

    Border exactness: the upsample CLAMPS at volume borders while the fine
    conv pads with zeros ('zeros') or circularly ('wrap'), so border output
    planes obey different effective kernels. The interior runs as one VALID
    conv; the 26 face/edge/corner regions are overwritten with their own
    composed kernels (plane/line/point-sized dots — negligible).

    Supports K ∈ {1, 3} (the only sizes the reference uses). Exactness is
    tested against the two-step path in tests/test_s2d_conv.py.
    """
    assert w.shape[0] == w.shape[1] == w.shape[2] and w.shape[0] in (1, 3), (
        w.shape
    )
    assert x.ndim == 5, x.shape
    dims = x.shape[1:4]
    cin, cout = w.shape[-2:]
    if any(d < 2 for d in dims):
        # single-row axes make lo/hi border modes coincide; these grids are
        # tiny (deepest-level code grids) — take the two-step path
        from vqvae3d_tpu.ops.resize import upsample2x_to_s2d

        xs = upsample2x_to_s2d(x)
        if w.shape[0] == 3:
            return conv3d(
                xs,
                k3s1_block_kernel(w.astype(xs.dtype)),
                padding=[(1, 1)] * 3,
                pad_mode=pad_mode,
            )
        return conv3d(xs, conv1x1_block_kernel(w.astype(xs.dtype)))
    dt = x.dtype
    w = w.astype(dt)

    # interior: ONE valid conv covering output rows [1, D-2] per axis
    w_int_taps = _resize_combo_kernel(w, ("int", "int", "int"), pad_mode)
    # assemble the (3,3,3,Cin,8Cout) kernel from the rel-keyed taps
    w_int = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [
                            w_int_taps.get(
                                (("rel", s1), ("rel", s2), ("rel", s3)),
                                jnp.zeros((cin, 8 * cout), dt),
                            )
                            for s3 in (-1, 0, 1)
                        ]
                    )
                    for s2 in (-1, 0, 1)
                ]
            )
            for s1 in (-1, 0, 1)
        ]
    )
    interior = conv3d(x, w_int, padding=[(0, 0)] * 3)  # VALID
    out = jnp.pad(interior, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])

    def row_index(key, n):
        if key == "first":
            return 0
        if key == "last":
            return n - 1
        if key == "last-1":
            return n - 2
        return key  # 0 or 1

    # border regions: every (mode1, mode2, mode3) ≠ all-interior
    for m1 in ("lo", "int", "hi"):
        for m2 in ("lo", "int", "hi"):
            for m3 in ("lo", "int", "hi"):
                modes = (m1, m2, m3)
                if modes == ("int", "int", "int"):
                    continue
                # int axes need ≥1 interior row
                if any(
                    m == "int" and dims[a] < 3 for a, m in enumerate(modes)
                ):
                    continue
                # lo/hi coincide at D=2 only if... they never coincide for
                # D≥2 (rows 0 and D-1 differ); D<2 is asserted above.
                kern = _resize_combo_kernel(w, modes, pad_mode)
                region = None
                for keys, mat in kern.items():
                    idx = [slice(None)]  # batch
                    src = x
                    for a, (m, key) in enumerate(zip(modes, keys)):
                        n = dims[a]
                        if m == "int":
                            s = key[1]
                            idx.append(slice(1 + s, n - 1 + s))
                        else:
                            idx.append(
                                slice(
                                    row_index(key[1], n),
                                    row_index(key[1], n) + 1,
                                )
                            )
                    patch = src[tuple(idx) + (slice(None),)]
                    term = jax.lax.dot_general(
                        patch,
                        mat,
                        dimension_numbers=(((4,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    region = term if region is None else region + term
                region = region.astype(dt)
                oidx = [slice(None)]
                for a, m in enumerate(modes):
                    n = dims[a]
                    if m == "int":
                        oidx.append(slice(1, n - 1))
                    elif m == "lo":
                        oidx.append(slice(0, 1))
                    else:
                        oidx.append(slice(n - 1, n))
                out = out.at[tuple(oidx) + (slice(None),)].set(region)
    return out
