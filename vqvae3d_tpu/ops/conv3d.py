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

from vqvae3d_tpu.ops.resize import space_to_depth

IntOr3 = Union[int, Tuple[int, int, int]]


def k4s2_block_kernel(w: jax.Array) -> jax.Array:
    """(4,4,4,C,Co) -> (2,2,2,8C,Co): k4-stride2 == k2-stride1 on s2d(x,2).

    Input channel packing follows ops.resize.space_to_depth ((f0,f1,f2,c),
    c fastest): w[2δ+r] multiplies phase r of block δ, so block tap δ's
    input channel (r0,r1,r2,c) carries w[2δ0+r0, 2δ1+r1, 2δ2+r2, c]. A pure
    weight rearrangement — zero extra FLOPs, and the conv becomes stride-1
    (so the one-dot dW path applies) with 8× the input lanes.
    """
    k0, k1, k2, c, co = w.shape
    assert (k0, k1, k2) == (4, 4, 4), w.shape
    wb = w.reshape(2, 2, 2, 2, 2, 2, c, co).transpose(0, 2, 4, 1, 3, 5, 6, 7)
    return wb.reshape(2, 2, 2, 8 * c, co)


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


def _can_block_rewrite(x_shape, w_shape, pads) -> bool:
    """Gate for the generic stride-1 2×-block-space rewrite: small channels
    on a large all-even grid whose conv output dims are also even.

    Channel cap 16 (not 32) at the base grid-size threshold: the
    block-space k≥3 kernel embedding costs 8× the FLOPs, so it only
    clearly pays while the lane-density gain is ≥ 8× — i.e. 8C ≤ 128.
    C = 17..32 is allowed only on 4×-larger grids, where XLA's direct
    small-C lowering degrades enough that the denser layout wins anyway.
    Measured (PERF.md): the C=32 bottleneck conv of the NDHWC-scanned
    C=64 stacks costs ~280 ms/step rewritten at 256-res (131k voxels)
    but saves ~185 ms/step at 512-res (524k voxels).
    """
    cin, cout = x_shape[-1], w_shape[-1]
    c = max(cin, cout)
    if c > 32 or w_shape[:3] == (1, 1, 1):
        return False
    spatial = x_shape[1:4]
    if any(s % 2 for s in spatial):
        return False
    out = [
        s + lo + hi - k + 1
        for s, (lo, hi), k in zip(spatial, pads, w_shape[:3])
    ]
    if any(o % 2 or o <= 0 for o in out):
        return False
    from vqvae3d_tpu.ops import s2d_conv

    min_voxels = s2d_conv._MIN_VOXELS * (1 if c <= 16 else 4)
    return int(np.prod(out)) >= min_voxels


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
    block_rewrite: bool = True,
) -> jax.Array:
    """x: (N, D, H, W, Cin); w: (kD, kH, kW, Cin/groups, Cout)."""
    # Generic stride-1 rewrite into 2× block space (ops/s2d_conv.py): any
    # explicitly-padded stride-1 conv with ≤32 channels over a large even
    # grid runs as an 8C-lane-dense conv on the space-to-depth tensor — an
    # exact weight-space embedding. Covers the priors' causal convs
    # (reference pixel_model/layers.py:193-215) and the VQ-VAE's stray
    # 'same'/'out' convs outside the stack runners.
    if block_rewrite:
        from vqvae3d_tpu.ops.s2d_conv import block_rewrite_enabled

        block_rewrite = block_rewrite_enabled()
    if (
        block_rewrite
        and groups == 1
        and precision is None
        and not isinstance(padding, str)
        and _triple(stride) == (1, 1, 1)
        and _can_block_rewrite(x.shape, w.shape, tuple(padding))
    ):
        from vqvae3d_tpu.ops.resize import depth_to_space
        from vqvae3d_tpu.ops.s2d_conv import stride1_block_kernel

        wb, pad_b = stride1_block_kernel(w, tuple(padding))
        out = conv3d(
            space_to_depth(x, 2),
            wb,
            padding=pad_b,
            pad_mode=pad_mode,
            block_rewrite=False,
        )
        out = depth_to_space(out, 2)
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
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
    # k4-stride2 down convs (the only strided convs in the architecture,
    # reference vqvae/layers.py:124-151) rewrite EXACTLY to k2-stride1 on the
    # space-to-depth tensor: 8× the input lanes (C=8..32 would otherwise pad
    # 16-4× to the 128-lane tile) and a stride-1 dW (one-dot instead of the
    # 27-slice strided fallback). Pure weight rearrangement; output identical.
    if (
        block_rewrite
        and groups == 1
        and padding == "VALID"
        and w.shape[:3] == (4, 4, 4)
        and _triple(stride) == (2, 2, 2)
        and x.shape[-1] <= 32
        and all(s % 2 == 0 for s in x.shape[1:4])
    ):
        x = space_to_depth(x, 2)
        w = k4s2_block_kernel(w)
        stride = 1
    # k2-stride2 (the 'down' skip convs, reference vqvae/layers.py:124-151)
    # is EXACTLY a 1×1×1 channel contraction on the space-to-depth tensor:
    # s2d channel (r0,r1,r2,c) pairs with w[r0,r1,r2,c,:] — a plain reshape.
    if (
        block_rewrite
        and groups == 1
        and padding == "VALID"
        and w.shape[:3] == (2, 2, 2)
        and _triple(stride) == (2, 2, 2)
        and x.shape[-1] <= 32
        and all(s % 2 == 0 for s in x.shape[1:4])
    ):
        x = space_to_depth(x, 2)
        w = w.reshape(1, 1, 1, 8 * w.shape[3], w.shape[4])
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

    ``fold=True``: the input arrives in the 2× space-to-depth layout
    (``s2d(x, 2)`` — 8·Cin channels on the half-res grid) and the conv runs
    as its exact folded-domain weight embedding (ops/s2d_conv.py). The
    PARAMETER TREE IS UNCHANGED (the embedding is a traced function of the
    stock weights), so converted reference checkpoints load verbatim.
    Foldedness of the OUTPUT depends on the kernel:
      * 1×1×1 s1          → block-diagonal contraction, output FOLDED
      * k3 s1 pad1        → k3s1_block_kernel, output FOLDED
      * k4 s2 pad1        → k4s2p1_fold_kernel, output UNFOLDED (the
                            stride-2 halving cancels the fold)
      * k2 s2 pad0        → k2s2_fold_kernel, output UNFOLDED
    This is the literal-stem (stem_space_to_depth=1) serving path: no
    full-resolution C≤4 tensor ever exists on device (the padded-layout
    copies XLA emits for such tensors OOM a 16 GB chip at 512-res; PERF.md).
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
    fold: bool = False  # input is s2d(x,2)-folded; see docstring

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _triple(self.kernel_size)
        cin = x.shape[-1] // 8 if self.fold else x.shape[-1]
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
        if self.fold:
            return self._fold_call(x, w, b, k, padding)
        return conv3d(
            x,
            w,
            b,
            stride=self.stride,
            padding=padding,
            pad_mode=self.pad_mode,
            groups=self.groups,
        )

    def _fold_call(self, x, w, b, k, padding):
        from vqvae3d_tpu.ops import s2d_conv

        assert self.groups == 1, "fold path: groups unsupported"
        stride = _triple(self.stride)
        pad_sym = tuple(padding)
        if k == (1, 1, 1) and stride == (1, 1, 1):
            out = conv3d(
                x, s2d_conv.conv1x1_block_kernel(w), block_rewrite=False
            )
            if b is not None:
                out = out + jnp.tile(b.astype(out.dtype), 8)
            return out
        if k == (3, 3, 3) and stride == (1, 1, 1) and pad_sym == ((1, 1),) * 3:
            out = conv3d(
                x,
                s2d_conv.k3s1_block_kernel(w),
                padding=[(1, 1)] * 3,
                pad_mode=self.pad_mode,
                block_rewrite=False,
            )
            if b is not None:
                out = out + jnp.tile(b.astype(out.dtype), 8)
            return out
        if k == (4, 4, 4) and stride == (2, 2, 2) and pad_sym == ((1, 1),) * 3:
            out = conv3d(
                x,
                s2d_conv.k4s2p1_fold_kernel(w),
                padding=[(1, 1)] * 3,
                pad_mode=self.pad_mode,
                block_rewrite=False,
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            return out
        if k == (2, 2, 2) and stride == (2, 2, 2) and pad_sym == ((0, 0),) * 3:
            out = conv3d(
                x, s2d_conv.k2s2_fold_kernel(w), block_rewrite=False
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            return out
        raise NotImplementedError(
            f"fold path: kernel {k} stride {stride} pad {pad_sym}"
        )
