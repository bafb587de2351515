"""3D convolution primitives, channels-last, with explicit padding control.

TPU-first notes:
  * Layout is NDHWC / DHWIO / NDHWC — XLA's native TPU conv layout; channels
    ride the 128-wide lane dimension so the MXU tiles convs as implicit
    matmuls over the channel contraction.
  * Padding is applied explicitly (``pad3d``) and convs always run VALID.
    This reproduces the reference's exact padding semantics (torch pads
    symmetrically, e.g. k4s2 pads (1,1); XLA 'SAME' would pad (1,2)) —
    critical for loading converted reference checkpoints.
    Reference: /root/reference/vqvae/layers.py:124-151 (k4s2p1 'down',
    k3s1p1 'same', circular padding mode at layers.py:109).
  * Weights are kept fp32 and cast to the compute dtype at call time
    (bf16 by default in the surrounding model); accumulation is fp32 via
    ``preferred_element_type``.
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IntOr3 = Union[int, Tuple[int, int, int]]


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def pad3d(
    x: jax.Array,
    pad: Sequence[Tuple[int, int]],
    mode: str = "zeros",
) -> jax.Array:
    """Pad the three spatial dims of an NDHWC tensor.

    pad: ((lo0, hi0), (lo1, hi1), (lo2, hi2)) for spatial dims.
    mode: 'zeros' (constant 0) or 'wrap' (circular, the reference's
    padding_mode='circular', vqvae/layers.py:109).
    """
    full_pad = [(0, 0)] + [tuple(p) for p in pad] + [(0, 0)]
    if all(p == (0, 0) for p in full_pad):
        return x
    if mode == "zeros":
        return jnp.pad(x, full_pad)
    if mode == "wrap":
        return jnp.pad(x, full_pad, mode="wrap")
    raise ValueError(f"unknown pad mode {mode!r}")


def conv3d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: IntOr3 = 1,
    padding: Union[str, Sequence[Tuple[int, int]]] = "VALID",
    pad_mode: str = "zeros",
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """x: (N, D, H, W, Cin); w: (kD, kH, kW, Cin/groups, Cout)."""
    if not isinstance(padding, str):
        x = pad3d(x, padding, mode=pad_mode)
        padding = "VALID"
    # 1×1×1 stride-1 convs lower far better as a plain contraction over the
    # channel axis (dot_general) than as lax.conv — XLA's TPU conv path can
    # materialize halo-split fp32 buffers with degenerate (C=1) trailing dims
    # padded to full 128-lane tiles (observed: an 18 GB buffer for the C=1
    # parse_input conv at 512×512×128).
    # NOTE: no explicit preferred_element_type — TPU MXU convs/dots with bf16
    # operands accumulate in fp32 internally regardless, and forcing an fp32
    # output dtype breaks the conv transpose rule under autodiff (fp32
    # cotangents meet bf16 kernels: "requires arguments to have the same
    # dtypes"). Output dtype == input dtype.
    if (
        w.shape[:3] == (1, 1, 1)
        and _triple(stride) == (1, 1, 1)
        and groups == 1
    ):
        out = jax.lax.dot_general(
            x,
            w[0, 0, 0].astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        )
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
    if (
        groups == 1
        and precision is None
        and padding == "VALID"
        and max(x.shape[-1], w.shape[-1]) <= _SMALLC_MAX
    ):
        out = _conv3d_valid_smallc(x, w.astype(x.dtype), _triple(stride))
    else:
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=_triple(stride),
            padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=groups,
            precision=precision,
        )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Small-channel conv with MXU-friendly custom backward
# ---------------------------------------------------------------------------
#
# XLA lowers the weight-gradient of convs with few channels to loop fusions
# that crawl the whole volume at ~2/128 lane utilization (profiled: 86 ms for
# ONE (3,3,3,4,4) dW over a (256,256,128,4) activation — the dominant cost of
# the entire train step). dW is really a batch of k³ tiny matmuls with a huge
# contraction dim: dW[κ] = Σ_pos x[pos·s+κ]ᵀ · g[pos]. Computing it as k³
# shifted (N, Cin)ᵀ(N, Cout) dots streams the operands through the MXU at
# memory bandwidth instead.

_SMALLC_MAX = 32  # use the custom backward when max(Cin, Cout) <= this


def dw_conv3d_onedot(xp: jax.Array, g: jax.Array, kshape) -> jax.Array:
    """Weight gradient of a stride-1 VALID NDHWC conv as ONE MXU dot.

    xp: (B, Dp, Hp, Wp, Cin) pre-padded input; g: (B, Do, Ho, Wo, Cout).
    The kd·kh depth/height-shifted x views concat on channels into
    A (·, Wp, kd·kh·Cin) and the kw width-shifted zero-padded g views into
    B (·, Wp, kw·Cout); contracting all position dims yields the complete
    (kd·kh·Cin, kw·Cout) → (kd, kh, kw, Cin, Cout) dW with zero wasted
    FLOPs. Returns fp32.
    """
    kd, kh, kw = kshape
    b, dp, hp, wp, cin = xp.shape
    _, od, oh, ow, cout = g.shape
    assert (od, oh, ow) == (dp - kd + 1, hp - kh + 1, wp - kw + 1)
    a = jnp.concatenate(
        [xp[:, i : i + od, j : j + oh] for i in range(kd) for j in range(kh)],
        axis=-1,
    )  # (B, Do, Ho, Wp, kd·kh·Cin)
    gext = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (kw - 1, kw - 1), (0, 0)))
    bm = jnp.concatenate(
        [gext[:, :, :, kw - 1 - k : kw - 1 - k + wp] for k in range(kw)],
        axis=-1,
    )  # (B, Do, Ho, Wp, kw·Cout)
    dw_flat = jax.lax.dot_general(
        a,
        bm,
        dimension_numbers=(((0, 1, 2, 3), (0, 1, 2, 3)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (kd·kh·Cin, kw·Cout)
    return dw_flat.reshape(kd, kh, cin, kw, cout).transpose(0, 1, 3, 2, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3d_valid_smallc(xp: jax.Array, w: jax.Array, stride: Tuple[int, int, int]):
    return jax.lax.conv_general_dilated(
        xp, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _conv3d_valid_smallc_fwd(xp, w, stride):
    return _conv3d_valid_smallc(xp, w, stride), (xp, w)


def _conv3d_valid_smallc_bwd(stride, res, g):
    from vqvae3d_tpu.ops.pallas_conv import dw_conv3d_pallas, dw_conv3d_supported

    xp, w = res
    kd, kh, kw, cin, cout = w.shape
    b, od, oh, ow, _ = g.shape

    # dx: transposed conv — spatially-flipped kernel with IO swapped, the
    # cotangent dilated by the stride. XLA lowers this as a convolution
    # (its dx path was never the bottleneck).
    w_rot = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = jax.lax.conv_general_dilated(
        g,
        w_rot,
        window_strides=(1, 1, 1),
        padding=[(kd - 1, kd - 1), (kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=stride,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )

    # dW, stride-1: single-pass Pallas kernel (no HBM shifted slices at all;
    # see ops/pallas_conv.py). Interpret-mode only for now — on real TPU the
    # DMA engine requires 128-multiple minor dims (PERF.md).
    if dw_conv3d_supported(xp.shape, w.shape, stride):
        dw = dw_conv3d_pallas(xp, g, (kd, kh, kw)).astype(w.dtype)
        return dx.astype(xp.dtype), dw

    # dW, stride-1 XLA path: ONE MXU dot instead of k³ shifted dots. The
    # kd·kh depth/height-shifted x views concat on channels into
    # A (N, kd·kh·Cin) and the kw width-shifted zero-padded g views into
    # B (N, kw·Cout); contracting N yields the complete
    # (kd·kh·Cin, kw·Cout) = dW with zero wasted FLOPs. Profiled at 256-res:
    # the 27-slice form spent ~60% of step time in slice/copy HBM
    # materializations; this form materializes A once (~kd·kh/k³ the
    # traffic) and lets one big dot stream it.
    if tuple(stride) == (1, 1, 1) and (kd, kh, kw) != (1, 1, 1):
        dw = dw_conv3d_onedot(xp, g, (kd, kh, kw)).astype(w.dtype)
        return dx.astype(xp.dtype), dw

    # dW fallback (strided convs): k³ shifted dots on the MXU (one
    # (N, Cin)ᵀ·(N, Cout) per kernel offset; no im2col buffer — each
    # shifted view streams once).
    gf = g.reshape(-1, cout)
    sd, sh, sw = stride
    dots = []
    for dz in range(kd):
        for dy in range(kh):
            for dx_ in range(kw):
                xs = jax.lax.slice(
                    xp,
                    (0, dz, dy, dx_, 0),
                    (
                        b,
                        dz + (od - 1) * sd + 1,
                        dy + (oh - 1) * sh + 1,
                        dx_ + (ow - 1) * sw + 1,
                        cin,
                    ),
                    (1, sd, sh, sw, 1),
                )
                dots.append(
                    jax.lax.dot_general(
                        xs.reshape(-1, cin),
                        gf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
    dw = jnp.stack(dots).reshape(kd, kh, kw, cin, cout).astype(w.dtype)
    return dx.astype(xp.dtype), dw


_conv3d_valid_smallc.defvjp(_conv3d_valid_smallc_fwd, _conv3d_valid_smallc_bwd)


# ---------------------------------------------------------------------------
# Initializers mirroring the reference's Fixup scheme
# ---------------------------------------------------------------------------

def fixup_branch_init(num_layers: int) -> Callable:
    """N(0, sqrt(2 / (C_out * prod(kernel))) * num_layers**-0.5).

    Mirrors /root/reference/vqvae/layers.py:200-206 (torch weight shape[0] is
    C_out; shape[2:] is the kernel).
    """

    def init(key, shape, dtype=jnp.float32):
        # shape: (kD, kH, kW, Cin, Cout)
        fan = shape[-1] * int(np.prod(shape[:3]))
        std = np.sqrt(2.0 / fan) * num_layers ** (-0.5)
        return jax.random.normal(key, shape, dtype) * std

    return init


def kaiming_normal_init() -> Callable:
    """torch.nn.init.kaiming_normal_ default: std = sqrt(2 / fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2] * int(np.prod(shape[:3]))
        std = np.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std

    return init


def xavier_normal_init() -> Callable:
    """torch.nn.init.xavier_normal_: std = sqrt(2 / (fan_in + fan_out))."""

    def init(key, shape, dtype=jnp.float32):
        rf = int(np.prod(shape[:3]))
        fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
        std = np.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std

    return init


def torch_conv_default_init() -> Callable:
    """torch Conv3d default (kaiming_uniform a=sqrt(5)): U(-1/sqrt(fan_in), +)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2] * int(np.prod(shape[:3]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv3D(nn.Module):
    """Channels-last 3D conv with torch-compatible explicit padding.

    ``pad`` is either an int (symmetric on all three spatial dims) or a
    3-tuple of (lo, hi) pairs. Padding mode 'wrap' gives circular padding.
    """

    features: int
    kernel_size: IntOr3 = 1
    stride: IntOr3 = 1
    pad: Union[int, Sequence[Tuple[int, int]]] = 0
    pad_mode: str = "zeros"
    use_bias: bool = True
    groups: int = 1
    kernel_init: Callable = None  # default: torch conv default
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: jnp.dtype | None = None  # compute dtype; None = input dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _triple(self.kernel_size)
        cin = x.shape[-1]
        assert cin % self.groups == 0, (cin, self.groups)
        kernel_init = self.kernel_init or torch_conv_default_init()
        w = self.param(
            "kernel", kernel_init, (*k, cin // self.groups, self.features)
        )
        b = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        if isinstance(self.pad, int):
            padding = [(self.pad, self.pad)] * 3
        else:
            padding = self.pad
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return conv3d(
            x,
            w,
            b,
            stride=self.stride,
            padding=padding,
            pad_mode=self.pad_mode,
            groups=self.groups,
        )
