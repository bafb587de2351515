"""Channel-packed compute path for small-channel 'same' resblock stacks.

Why this exists (profiled on TPU v5e, see PERF.md): XLA materializes every
HBM tensor with the minor (channel) dimension padded to full 128-lane tiles.
The reference architecture's deep pre-/post-quantization stacks run at 1-18
channels over large code grids (vqvae/layers.py:544-555: embedding width is
channels//8, e.g. TWO channels at the 128x128x32 level-0 grid of the full
512-res model), so the stock NDHWC path pays a 7-64x memory-traffic tax on
every op — a profiled ~1.7 ms per conv fusion that touches only ~0.5 MB.

The packed path stores activations as (B, C, D, H*W): the tiled (minor two)
dims are (D, H*W), which are multiples of (8, 128) for every real code grid,
so NOTHING is padded. Channel mixing (the 1x1x1 convs and the 3^3 conv's
channel contraction) is scalar-expanded into per-channel-pair plane FMAs —
pure VPU work that XLA fuses into a handful of full-bandwidth kernels; the
3^3 spatial taps become lane/sublane rolls. Measured on one v5e chip at the
512-res level-0 pre-q block (C=2, grid 128x128x32, bf16):

    stock NDHWC:  1315 us fwd, 3165 us fwd+bwd   per block
    packed:        204 us fwd,  288 us fwd+bwd   per block   (~11x)

Semantics are exactly the reference PreActFixupResBlock in 'same' mode
(/root/reference/vqvae/layers.py:102-216), for both 'wrap' (circular,
layers.py:109) and 'zeros' padding; equivalence is tested against the NDHWC
path in tests/test_packed_blocks.py.

Autodiff: everything here is rolls/multiplies/adds, so jax.grad derives an
equally unpadded backward for free (the dominant win: the NDHWC backward's
padded-layout copies were ~2/3 of train-step time).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, C, D, H*W)."""
    b, d, h, w, c = x.shape
    return jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(b, c, d, h * w)


def unpack(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """(B, C, D, H*W) -> (B, D, H, W, C)."""
    b, c, d, _ = x.shape
    h, w = hw
    return jnp.transpose(x.reshape(b, c, d, h, w), (0, 2, 3, 4, 1))


def _lane_mask(hw: int, w: int, which: str) -> np.ndarray:
    """(1, 1, HW) bool mask of lanes at an h- or w-boundary."""
    lanes = np.arange(hw)
    if which == "w_first":
        m = lanes % w == 0
    elif which == "w_last":
        m = lanes % w == w - 1
    elif which == "h_first":
        m = lanes // w == 0
    else:  # h_last
        m = lanes // w == (hw // w) - 1
    return m[None, None, :]


def _shift_d(x: jax.Array, kd: int, pad_mode: str) -> jax.Array:
    """Shift along D (axis -2) by kd ∈ {-1, 0, 1}; out[d] = x[d - kd]."""
    if kd == 0:
        return x
    r = jnp.roll(x, kd, axis=-2)
    if pad_mode == "wrap":
        return r
    d = x.shape[-2]
    idx = jnp.arange(d)[:, None]
    bad = idx == (0 if kd > 0 else d - 1)
    return jnp.where(bad, jnp.zeros((), x.dtype), r)


def _shift_h(x: jax.Array, kh: int, w: int, pad_mode: str) -> jax.Array:
    """Shift along H (lane roll by kh*W); wrap is exactly circular-in-h."""
    if kh == 0:
        return x
    r = jnp.roll(x, kh * w, axis=-1)
    if pad_mode == "wrap":
        return r
    hw = x.shape[-1]
    bad = jnp.asarray(_lane_mask(hw, w, "h_first" if kh > 0 else "h_last"))
    return jnp.where(bad, jnp.zeros((), x.dtype), r)


def _shift_w(x: jax.Array, kw: int, w: int, pad_mode: str) -> jax.Array:
    """Shift along W by kw; a plain lane roll wraps across the h boundary,
    so the w-edge lanes are patched (wrap: from the same h row's far edge;
    zeros: zeroed)."""
    if kw == 0:
        return x
    hw = x.shape[-1]
    r = jnp.roll(x, kw, axis=-1)
    bad = jnp.asarray(_lane_mask(hw, w, "w_first" if kw > 0 else "w_last"))
    if pad_mode == "wrap":
        fix = jnp.roll(x, kw - int(np.sign(kw)) * w, axis=-1)
        return jnp.where(bad, fix, r)
    return jnp.where(bad, jnp.zeros((), x.dtype), r)


def mix_channels(x: jax.Array, w: jax.Array) -> jax.Array:
    """1x1x1 conv on packed activations: x (B, C, D, HW), w (C, O) -> (B, O, D, HW).

    Scalar-expanded per channel pair — for the tiny C this path is gated to,
    XLA fuses the whole thing into one full-bandwidth elementwise kernel
    (no 128-lane channel padding anywhere).
    """
    c_in, c_out = w.shape
    dt = x.dtype
    outs = []
    for o in range(c_out):
        acc = None
        for c in range(c_in):
            term = x[:, c] * w[c, o].astype(dt)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=1)


def conv3x3x3_packed(
    x: jax.Array, w: jax.Array, width: int, pad_mode: str
) -> jax.Array:
    """3x3x3 'same' conv on packed activations.

    x: (B, C, D, HW); w: (3, 3, 3, C, O). out[p] = Σ_k w[k] · x[p + k - 1],
    expressed as 27 shifted plane-FMAs per channel pair. Shifts are hoisted
    per axis so each distinct (c, kd, kh, kw) shift is computed once.
    """
    _, c_in, _, hw = x.shape
    c_out = w.shape[-1]
    dt = x.dtype
    acc = [None] * c_out
    for c in range(c_in):
        xc = x[:, c]
        for kd in (-1, 0, 1):
            xd = _shift_d(xc, kd, pad_mode)
            for kh in (-1, 0, 1):
                xh = _shift_h(xd, kh, width, pad_mode)
                for kw in (-1, 0, 1):
                    xw = _shift_w(xh, kw, width, pad_mode)
                    # shift by s selects tap k = 1 - s on each axis
                    for o in range(c_out):
                        wgt = w[1 - kd, 1 - kh, 1 - kw, c, o].astype(dt)
                        term = xw * wgt
                        acc[o] = term if acc[o] is None else acc[o] + term
    return jnp.stack(acc, axis=1)


def preact_fixup_same_packed(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    scalars: Sequence[jax.Array],
    *,
    width: int,
    pad_mode: str,
) -> jax.Array:
    """One PreActFixupResBlock in 'same' mode (in_channels == out_channels,
    identity skip) on packed (B, C, D, HW) activations.

    w1: (1,1,1,C,Cb), w2: (3,3,3,Cb,Cb), w3: (1,1,1,Cb,C);
    scalars: (b1a, b1b, b2a, b2b, b3a, b3b, b4, scale), each shape (1,).
    Mirrors models/blocks.py::PreActFixupResBlock (which mirrors the
    reference vqvae/layers.py:102-216). The pre-conv scalar biases are added
    to the tensor BEFORE shifting, so zero padding semantics match torch's
    pad-after-bias exactly.
    """
    dt = x.dtype
    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = (s.astype(dt) for s in scalars)
    act = jax.nn.elu

    out = act(x + b1a) + b1b
    out = mix_channels(out, w1[0, 0, 0])
    out = act(out + b2a) + b2b
    out = conv3x3x3_packed(out, w2, width, pad_mode)
    out = act(out + b3a) + b3b
    out = mix_channels(out, w3[0, 0, 0])
    return out * scale + b4 + x


# Measured v5e crossover: grids below this are op-overhead-bound and the
# stock NDHWC path is fine. Tests lower it to exercise packing on tiny grids.
_MIN_VOXELS = 32 * 64 * 64


def packed_stack_ok(
    channels: int,
    spatial: Tuple[int, int, int],
    n_blocks: int,
    bottleneck_divisor: int = 2,
) -> bool:
    """Should a stack of 'same' PreActFixup blocks use the packed path?

    Measured crossover on v5e (see module docstring / PERF.md): the packed
    path wins when channels are tiny (the 128-lane padding tax dominates)
    and the grid is large enough that per-op overhead isn't the bottleneck.
    The scalar expansion generates ~27·Cb² + 2·C·Cb plane ops per block, so
    it must stay small; D and H*W must tile (8, 128) exactly to be unpadded.
    """
    d, h, w = spatial
    cb = max(channels // bottleneck_divisor, 1)
    if channels > 4 or cb > 2:
        # scalar expansion beyond ~100 conv2 terms blows up XLA compile time
        # (observed: a single Cb=4 block took >10 min to compile on the
        # remote TPU toolchain) and NDHWC convs get competitive as C grows
        return False
    if (h * w) % 128 != 0 or d % 8 != 0:
        return False  # packed layout itself would be padded
    if d * h * w < _MIN_VOXELS:
        return False  # tiny grids are op-overhead-bound; NDHWC is fine
    return n_blocks >= 1
