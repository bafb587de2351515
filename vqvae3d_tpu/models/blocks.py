"""Residual block zoo for the hierarchical 3D VQ-VAE (channels-last, TPU-first).

Re-designs the reference layer zoo (/root/reference/vqvae/layers.py) in flax:

  * ``PreActFixupResBlock`` — pre-activation 3-conv bottleneck Fixup block
    (layers.py:102-216); the default block (vqvae/model.py:190 maps
    ``--block-type pre-activation``). Circular ('wrap') padding as in
    layers.py:109.
  * ``FixupResBlock`` — 2-conv Fixup block (layers.py:219-303).
  * ``EvonormResBlock`` + ``EvoNorm3DS0`` — EvoNorm-S0 variant
    (layers.py:14-98, vqvae/evonorm.py), with the SiLU-velocity custom VJP
    (evonorm.py:29-47) as ``silu_velocity``.
  * ``ResizeConv3D`` — trilinear ×2 upsample + conv (layers.py:591-597).
  * ``DownBlock`` / ``UpBlock`` / ``PreQuantizationConditioning`` —
    hierarchical plumbing (layers.py:306-387).

Fixup scalar biases/scales are stored as shape-(1,) fp32 params; compute runs
in the block's ``dtype`` (bf16 by default in the model) with fp32 conv
accumulation.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vqvae3d_tpu.ops import fused_block, s2d_conv, stack_kernel
from vqvae3d_tpu.ops.conv3d import (
    Conv3D,
    conv3d,
    fixup_branch_init,
    kaiming_normal_init,
    torch_conv_default_init,
    xavier_normal_init,
)
from vqvae3d_tpu.ops.resize import (
    depth_to_space,
    space_to_depth,
    trilinear_upsample2x,
    upsample2x_to_s2d,
)
from vqvae3d_tpu.ops.s2d_conv import (
    block_stack_ok,
    conv1x1_block_kernel,
    k3s1_block_kernel,
    preact_fixup_same_block,
)
from vqvae3d_tpu.ops.packed_blocks import (
    pack,
    packed_stack_ok,
    preact_fixup_same_packed,
    unpack,
)

Dtype = Any


def _scalar(module: nn.Module, name: str, value: float = 0.0):
    return module.param(name, nn.initializers.constant(value), (1,))


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder.

    Used by the packed resblock path to create a parameter at the exact same
    tree path ('<name>/kernel') and shape as the Conv3D module the NDHWC path
    instantiates — checkpoints and converters are layout-agnostic.
    """

    shape: Any
    init: Callable

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.init, self.shape)


class _ConvKernelBias(nn.Module):
    """Conv kernel + optional bias parameter holder at Conv3D's tree paths
    ('<name>/kernel', '<name>/bias') — for compute paths that consume the
    weights functionally (block-space ResizeConv3D)."""

    shape: Any
    init: Callable
    use_bias: bool = False
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self):
        w = self.param("kernel", self.init, self.shape)
        b = (
            self.param("bias", self.bias_init, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return w, b


class PreActParams(nn.Module):
    """Parameter-only twin of a 'same'-mode PreActFixupResBlock.

    Creates the exact same parameter tree (7 scalar biases + scale +
    branch_conv{1,2,3}/kernel) and returns the values, so stacks of
    structurally identical blocks can be stacked leaf-wise and run under ONE
    ``lax.scan`` body instead of N inlined block traces (compile time and
    per-op overhead scale O(1) in stack depth instead of O(N)).
    """

    channels: int
    num_layers: int = 1
    bottleneck_divisor: int = 2

    @nn.compact
    def __call__(self):
        c = self.channels
        cb = max(c // self.bottleneck_divisor, 1)
        scalars = tuple(
            _scalar(self, f"bias{n}")
            for n in ("1a", "1b", "2a", "2b", "3a", "3b", "4")
        ) + (self.param("scale", nn.initializers.ones_init(), (1,)),)
        w1 = _ConvKernel(
            (1, 1, 1, c, cb),
            fixup_branch_init(self.num_layers),
            name="branch_conv1",
        )()
        w2 = _ConvKernel(
            (3, 3, 3, cb, cb), kaiming_normal_init(), name="branch_conv2"
        )()
        w3 = _ConvKernel(
            (1, 1, 1, cb, c), nn.initializers.zeros_init(), name="branch_conv3"
        )()
        return w1, w2, w3, scalars


def preact_fixup_same_ndhwc(x, w1, w2, w3, scalars, *, pad_mode: str):
    """Functional 'same'-mode PreActFixupResBlock on NDHWC activations —
    the exact math of the module below, with explicit weights (scan body)."""
    dt = x.dtype
    b1a, b1b, b2a, b2b, b3a, b3b, b4, scale = (s.astype(dt) for s in scalars)
    act = jax.nn.elu
    out = act(x + b1a) + b1b
    out = conv3d(out, w1)
    out = act(out + b2a) + b2b
    out = conv3d(out, w2, padding=[(1, 1)] * 3, pad_mode=pad_mode)
    out = act(out + b3a) + b3b
    out = conv3d(out, w3)
    return out * scale + b4 + x


class ResizeConv3D(nn.Module):
    """Trilinear ×2 upsample followed by a conv — checkerboard-free upscale.

    TPU path: for mid-width inputs on big grids the upsample is emitted
    directly in space-to-depth form (ops/resize.py::upsample2x_to_s2d) and
    the conv runs in block space (ops/s2d_conv.py) — the fine-resolution
    tensor never materializes with a 128-lane-padded small channel dim.
    Parameter tree and outputs are identical to the stock path.
    """

    features: int
    kernel_size: int = 3
    pad: int = 1
    pad_mode: str = "zeros"
    use_bias: bool = True
    kernel_init: Callable = None
    dtype: Optional[Dtype] = None
    # fold_out: return the result in the 2× space-to-depth layout
    # (``s2d(out, 2)``) instead of full resolution — the literal-stem
    # folded serving path (the fine-res small-C tensor never exists).
    fold_out: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out_voxels = 8 * int(np.prod(x.shape[1:4]))
        use_block = self.fold_out or (
            x.ndim == 5
            and s2d_conv.block_rewrite_enabled()
            and self.kernel_size in (1, 3)
            and self.pad == (1 if self.kernel_size == 3 else 0)
            and max(cin, self.features) <= 32
            and out_voxels >= s2d_conv._MIN_VOXELS
        )
        if use_block:
            assert self.kernel_size in (1, 3) and self.pad == (
                1 if self.kernel_size == 3 else 0
            ), (self.kernel_size, self.pad)
            kernel_init = self.kernel_init or torch_conv_default_init()
            k = self.kernel_size
            w, b = _ConvKernelBias(
                (k, k, k, cin, self.features),
                kernel_init,
                use_bias=self.use_bias,
                name="conv",
            )()
            if self.dtype is not None:
                x = x.astype(self.dtype)
            # upsample COMPOSED into the conv (ops/s2d_conv.resize_conv_s2d):
            # one coarse-grid conv contracting Cin lanes — 8× fewer FLOPs and
            # no materialized upsample vs upsample2x_to_s2d + block conv
            out = s2d_conv.resize_conv_s2d(x, w.astype(x.dtype), self.pad_mode)
            if b is not None:
                out = out + jnp.tile(b.astype(out.dtype), 8)
            return out if self.fold_out else depth_to_space(out, 2)
        x = trilinear_upsample2x(x)
        return Conv3D(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=1,
            pad=self.pad,
            pad_mode=self.pad_mode,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)


def _mode_conv(
    mode: str,
    features: int,
    pad_mode: str,
    use_bias: bool,
    kernel_init,
    dtype,
    name: str,
    fold: bool = False,
):
    """The mode-dependent 'spatial' conv: down=k4s2p1, same/out=k3s1p1,
    up=ResizeConv3D(k3s1p1). ``fold``: folded-domain variant — 'down'/'same'
    take an s2d-folded input (Conv3D.fold), 'up' emits a folded output
    (ResizeConv3D.fold_out)."""
    if mode == "down":
        return Conv3D(
            features=features,
            kernel_size=4,
            stride=2,
            pad=1,
            pad_mode=pad_mode,
            use_bias=use_bias,
            kernel_init=kernel_init,
            dtype=dtype,
            fold=fold,
            name=name,
        )
    if mode in ("same", "out"):
        return Conv3D(
            features=features,
            kernel_size=3,
            stride=1,
            pad=1,
            pad_mode=pad_mode,
            use_bias=use_bias,
            kernel_init=kernel_init,
            dtype=dtype,
            fold=fold,
            name=name,
        )
    if mode == "up":
        return ResizeConv3D(
            features=features,
            kernel_size=3,
            pad=1,
            pad_mode=pad_mode,
            use_bias=use_bias,
            kernel_init=kernel_init,
            dtype=dtype,
            fold_out=fold,
            name=name,
        )
    raise ValueError(f"unknown mode {mode!r}")


def _mode_skip_conv(
    mode: str, features: int, use_bias: bool, kernel_init, dtype, name,
    fold: bool = False,
):
    """Skip path: identity-shaped 1x1x1 (or k2s2 for 'down'; upsampling 1x1x1
    for 'up')."""
    if mode == "down":
        return Conv3D(
            features=features,
            kernel_size=2,
            stride=2,
            pad=0,
            use_bias=use_bias,
            kernel_init=kernel_init,
            dtype=dtype,
            fold=fold,
            name=name,
        )
    if mode == "up":
        return ResizeConv3D(
            features=features,
            kernel_size=1,
            pad=0,
            use_bias=use_bias,
            kernel_init=kernel_init,
            dtype=dtype,
            fold_out=fold,
            name=name,
        )
    return Conv3D(
        features=features,
        kernel_size=1,
        stride=1,
        pad=0,
        use_bias=use_bias,
        kernel_init=kernel_init,
        dtype=dtype,
        fold=fold,
        name=name,
    )


class PreActFixupResBlock(nn.Module):
    """Pre-activation bottleneck Fixup block (the default).

    1x1x1 → k (mode conv, circular pad) → 1x1x1, bottleneck_divisor=2,
    7 scalar biases + 1 scale, optional skip conv when the shape changes.
    Mirrors /root/reference/vqvae/layers.py:102-216 (init at :197-216).
    """

    out_channels: int
    mode: str = "same"
    num_layers: int = 1  # longest path through the network, for Fixup init
    bottleneck_divisor: int = 2
    pad_mode: str = "wrap"  # reference uses circular padding (layers.py:109);
    # 'zeros' avoids materializing the wrapped tensor (XLA assigns small-C
    # pads catastrophic 128-lane layouts at 512-res under autodiff)
    dtype: Optional[Dtype] = None
    # W of the packed (B, C, D, H*W) input when called on a channel-packed
    # activation (ops/packed_blocks.py) — 'same' mode, identity skip only.
    packed_width: Optional[int] = None
    # Literal-stem folded serving (stem_space_to_depth=1, folded_io=True):
    # fold_in — the input arrives s2d(·,2)-folded ('down'/'same' modes);
    # fold_out — the output leaves folded ('up'/'same'). All convs run as
    # exact folded-domain weight embeddings (ops/s2d_conv.py), parameter
    # tree unchanged. 'down' consumes the fold (stride-2 cancels it);
    # 'up' produces it (the ×2 upsample).
    fold_in: bool = False
    fold_out: bool = False

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("down", "same", "up", "out")
        assert not (self.fold_in and self.mode not in ("down", "same"))
        assert not (self.fold_out and self.mode not in ("up", "same"))
        if self.mode == "same" and (self.fold_in or self.fold_out):
            assert self.fold_in and self.fold_out, "same-mode fold is in+out"
        if x.ndim == 4:
            assert not (self.fold_in or self.fold_out)
            # Packed (B, C, D, H*W) path: same math, no 128-lane channel
            # padding anywhere (see ops/packed_blocks.py). Parameter tree is
            # identical to the NDHWC path below.
            assert self.mode == "same" and self.packed_width is not None
            c = x.shape[1]
            assert c == self.out_channels, (c, self.out_channels)
            branch_channels = max(c // self.bottleneck_divisor, 1)
            scalars = [
                _scalar(self, f"bias{n}")
                for n in ("1a", "1b", "2a", "2b", "3a", "3b", "4")
            ] + [self.param("scale", nn.initializers.ones_init(), (1,))]
            w1 = _ConvKernel(
                (1, 1, 1, c, branch_channels),
                fixup_branch_init(self.num_layers),
                name="branch_conv1",
            )()
            w2 = _ConvKernel(
                (3, 3, 3, branch_channels, branch_channels),
                kaiming_normal_init(),
                name="branch_conv2",
            )()
            w3 = _ConvKernel(
                (1, 1, 1, branch_channels, self.out_channels),
                nn.initializers.zeros_init(),
                name="branch_conv3",
            )()
            if self.dtype is not None:
                x = x.astype(self.dtype)
            return preact_fixup_same_packed(
                x,
                w1,
                w2,
                w3,
                scalars,
                width=self.packed_width,
                pad_mode=self.pad_mode,
            )
        in_channels = x.shape[-1] // 8 if self.fold_in else x.shape[-1]
        branch_channels = max(
            max(in_channels, self.out_channels) // self.bottleneck_divisor, 1
        )
        act = nn.elu
        # foldedness after the mode conv: 'down' consumes the fold, 'up'
        # introduces it, 'same' preserves it
        mid_folded = (self.mode == "same" and self.fold_in) or (
            self.mode == "up" and self.fold_out
        )

        b1a, b1b, b2a, b2b, b3a, b3b, b4 = (
            _scalar(self, f"bias{n}")
            for n in ("1a", "1b", "2a", "2b", "3a", "3b", "4")
        )
        scale = self.param("scale", nn.initializers.ones_init(), (1,))

        if self.dtype is not None:
            x = x.astype(self.dtype)
        dt = x.dtype

        def s(p):  # scalar in compute dtype
            return p.astype(dt)

        out = act(x + s(b1a))
        out = Conv3D(
            features=branch_channels,
            kernel_size=1,
            use_bias=False,
            kernel_init=fixup_branch_init(self.num_layers),
            dtype=self.dtype,
            fold=self.fold_in,
            name="branch_conv1",
        )(out + s(b1b))

        out = act(out + s(b2a))
        out = _mode_conv(
            self.mode,
            branch_channels,
            pad_mode=self.pad_mode,
            use_bias=False,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            fold=self.fold_in if self.mode in ("down", "same") else self.fold_out,
            name="branch_conv2",
        )(out + s(b2b))

        out = act(out + s(b3a))
        out = Conv3D(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            fold=mid_folded,
            name="branch_conv3",
        )(out + s(b3b))

        out = out * s(scale) + s(b4)

        needs_skip = not (
            self.mode in ("same", "out") and in_channels == self.out_channels
        )
        if needs_skip:
            b1c = _scalar(self, "bias1c")
            b1d = _scalar(self, "bias1d")
            skip = _mode_skip_conv(
                self.mode,
                self.out_channels,
                use_bias=False,
                kernel_init=xavier_normal_init(),
                dtype=self.dtype,
                fold=self.fold_in if self.mode == "down" else self.fold_out,
                name="skip_conv",
            )(x + s(b1c))
            out = out + skip + s(b1d)
        else:
            out = out + x

        return out


class FixupResBlock(nn.Module):
    """2-conv Fixup residual block (reference vqvae/layers.py:219-303)."""

    out_channels: int
    mode: str = "same"
    num_layers: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("down", "same", "up", "out")
        branch_channels = self.out_channels
        act = nn.elu

        b1a, b1b, b2a, b2b = (
            _scalar(self, f"bias{n}") for n in ("1a", "1b", "2a", "2b")
        )
        scale = self.param("scale", nn.initializers.ones_init(), (1,))

        if self.dtype is not None:
            x = x.astype(self.dtype)
        dt = x.dtype

        def s(p):
            return p.astype(dt)

        out = _mode_conv(
            self.mode,
            branch_channels,
            pad_mode="zeros",
            use_bias=False,
            kernel_init=fixup_branch_init(self.num_layers),
            dtype=self.dtype,
            name="branch_conv1",
        )(x + s(b1a))
        out = act(out + s(b1b))

        out = Conv3D(
            features=self.out_channels,
            kernel_size=3,
            stride=1,
            pad=1,
            use_bias=False,
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="branch_conv2",
        )(out + s(b2a))
        out = out * s(scale) + s(b2b)

        out = out + _mode_skip_conv(
            self.mode,
            self.out_channels,
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="skip_conv",
        )(x)

        if self.mode != "out":
            out = act(out)
        return out


def group_std(x: jax.Array, groups: Optional[int] = None, eps: float = 1e-5):
    """Per-(batch, group) std over grouped channels + all spatial dims.

    Channels-last analog of /root/reference/vqvae/evonorm.py:8-26 (~8
    channels per group), with the batch dim handled correctly (the reference
    reshapes to batch-1 and only works for b==1).
    """
    b, *spatial, c = x.shape
    if groups is None:
        groups = max(c // 8, 1)
    assert c % groups == 0
    xg = x.reshape(b, *spatial, groups, c // groups)
    axes = tuple(range(1, 1 + len(spatial))) + (x.ndim,)
    var = jnp.var(xg, axis=axes, keepdims=True)
    std = jnp.sqrt(var + eps)
    std = jnp.broadcast_to(std, xg.shape).reshape(x.shape)
    return std


@jax.custom_vjp
def silu_velocity(x, v):
    """x · sigmoid(v·x) with a hand-written backward.

    Port of the reference's SiLUVelocityFunc (vqvae/evonorm.py:29-47): the
    custom VJP recomputes sigmoid from the saved primals instead of keeping
    the activation — on TPU this also spares XLA from materializing the
    sigmoid between forward and backward when the op sits inside a remat-free
    region. Gradcheck'd against autodiff in tests/test_blocks.py.
    """
    return x * jax.nn.sigmoid(x * v)


def _silu_velocity_fwd(x, v):
    return silu_velocity(x, v), (x, v)


def _silu_velocity_bwd(res, g):
    x, v = res
    xv = x * v
    s = jax.nn.sigmoid(xv)
    d_sig = s * (1.0 - s)
    d_x = g * (s + xv * d_sig)
    d_v = g * (x * x * d_sig)
    # v broadcasts over (batch, spatial); reduce its gradient back
    while d_v.ndim > v.ndim:
        d_v = d_v.sum(axis=0)
    for axis, (dv_s, v_s) in enumerate(zip(d_v.shape, v.shape)):
        if v_s == 1 and dv_s != 1:
            d_v = d_v.sum(axis=axis, keepdims=True)
    return d_x, d_v


silu_velocity.defvjp(_silu_velocity_fwd, _silu_velocity_bwd)


class EvoNorm3DS0(nn.Module):
    """EvoNorm-S0: x·sigmoid(v·x)·gamma / group_std(x) + beta.

    Parameter shapes/init mirror /root/reference/vqvae/evonorm.py:59-76
    (v=ones, gamma=zeros, beta=zeros).
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        v = self.param("v", nn.initializers.ones_init(), (c,))
        gamma = self.param("gamma", nn.initializers.zeros_init(), (c,))
        beta = self.param("beta", nn.initializers.zeros_init(), (c,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        xf = x.astype(jnp.float32)
        num = silu_velocity(xf, v.astype(jnp.float32))
        std = group_std(xf)
        out = num * gamma / std + beta
        return out.astype(x.dtype)


class EvonormResBlock(nn.Module):
    """EvoNorm-S0 bottleneck residual block (reference vqvae/layers.py:14-98)."""

    out_channels: int
    mode: str = "same"
    num_layers: int = 1  # unused; EvoNorm blocks self-init (layers.py:85-98)
    bottleneck_divisor: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("down", "same", "up", "out")
        mode = "same" if self.mode == "out" else self.mode
        in_channels = x.shape[-1]
        branch_channels = max(
            max(in_channels, self.out_channels) // self.bottleneck_divisor, 1
        )

        out = EvoNorm3DS0(dtype=self.dtype, name="evonorm_1")(x)
        out = Conv3D(
            features=branch_channels,
            kernel_size=1,
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="branch_conv1",
        )(out)

        out = EvoNorm3DS0(dtype=self.dtype, name="evonorm_2")(out)
        out = _mode_conv(
            mode,
            branch_channels,
            pad_mode="zeros",
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="branch_conv2",
        )(out)

        out = EvoNorm3DS0(dtype=self.dtype, name="evonorm_3")(out)
        out = Conv3D(
            features=self.out_channels,
            kernel_size=1,
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="branch_conv3",
        )(out)

        needs_skip = not (mode == "same" and in_channels == self.out_channels)
        if needs_skip:
            skip = _mode_skip_conv(
                mode,
                self.out_channels,
                use_bias=True,
                kernel_init=xavier_normal_init(),
                dtype=self.dtype,
                name="skip_conv",
            )(x)
        else:
            skip = x
        return out + skip


RESBLOCKS = {
    "regular": FixupResBlock,
    "pre-activation": PreActFixupResBlock,
    "evonorm": EvonormResBlock,
}


def apply_same_stack(
    x,
    n_blocks: int,
    make_block,
    make_params=None,
    *,
    enabled: bool = True,
    remat: bool = False,
    pad_mode: str = "wrap",
    dtype: Optional[Dtype] = None,
    x_folded: bool = False,
):
    """Run ``n_blocks`` shape-preserving 'same' resblocks over x (NDHWC).

    Two orthogonal TPU optimizations, both leaving the parameter tree
    byte-identical to the naive module loop:

      * **channel packing** (ops/packed_blocks.py): when
        ``packed_stack_ok`` says the stack's tiny channel count would pay
        XLA's 128-lane padding tax, the whole stack runs on (B, C, D, H·W)
        activations — pack/unpack once per stack.
      * **scan**: when ``make_params`` is given (pre-activation blocks), the
        N structurally-identical blocks run as ONE ``lax.scan`` body over
        leaf-stacked per-block parameters — compile time and op count are
        O(1) instead of O(N) in stack depth. ``remat=True`` checkpoints each
        iteration (the analog of wrapping each block in nn.remat).

    ``make_block(j, packed_width)`` returns the j-th block module (fallback
    path, used for non-pre-activation block types); ``make_params(j)``
    returns the j-th block's (w1, w2, w3, scalars) via ``PreActParams``.
    """
    if n_blocks == 0:
        return x
    if x_folded:
        # literal-stem folded serving: x is ALREADY s2d(·,2)-folded and must
        # stay folded — run the stack as the block-space scan body directly
        # (no fold/unfold, no packed/megakernel variants; weights are the
        # stock parameters, embedded at trace time).
        assert make_params is not None, (
            "folded stacks need pre-activation scan params"
        )
        per_block = [make_params(j) for j in range(n_blocks)]
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *per_block
        )
        if dtype is not None:
            x = x.astype(dtype)

        def fold_body(h, p):
            w1, w2, w3, scalars = p
            return (
                preact_fixup_same_block(
                    h, w1, w2, w3, scalars, pad_mode=pad_mode
                ),
                None,
            )

        if remat and n_blocks >= 8:
            fold_body = jax.checkpoint(fold_body)
        x, _ = jax.lax.scan(fold_body, x, stacked)
        return x
    # Per-iteration checkpointing only pays off for DEEP stacks: it caps the
    # live set at ~1 block but its backward re-runs every block forward. For
    # the short post-down/up-scale stacks (2-5 blocks) the saved memory is a
    # few volumes while the recompute is ~half the stack's backward cost
    # (profiled: the 512-res decoder up_0 3-block scan spent 44.7 ms in
    # backward, ~60% of it recompute — PERF.md). 8 is well below any
    # pre/post-quantization depth (50-150) and above every up/down stack.
    if remat and n_blocks < 8:
        remat = False
    use_packed = (
        enabled
        and x.ndim == 5
        and packed_stack_ok(x.shape[-1], tuple(x.shape[1:4]), n_blocks)
    )
    # mid-width (C=5..32) big-grid stacks: run in 2× block space (s2d) so the
    # channel lane dim is 8C-dense instead of 128-lane-padded (ops/s2d_conv)
    use_block = (
        enabled
        and not use_packed
        and make_params is not None
        and x.ndim == 5
        and block_stack_ok(x.shape[-1], tuple(x.shape[1:4]), n_blocks)
    )

    if make_params is not None:
        per_block = [make_params(j) for j in range(n_blocks)]
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *per_block
        )
        if dtype is not None:
            x = x.astype(dtype)

        # Stack-resident megakernel (ops/stack_kernel.py): the ENTIRE stack
        # runs as ONE pallas_call with the volume resident in VMEM — one
        # grid step per block, weights streamed, per-block inputs saved for
        # the mirrored backward kernel. The activation is space-to-depth
        # folded (1 or 2 times — C=2 stacks fold twice to 128 dense lanes)
        # with the weights exactly embedded into the folded space, so the
        # parameter tree is untouched. Default-on on real TPU
        # (VQVAE3D_STACK_KERNEL=0 opts out); single-device only: under
        # GSPMD an opaque pallas_call would force gathers of the sharded
        # volume (multi-chip stays on the XLA paths below, whose
        # collectives ride the mesh for free).
        on_tpu = jax.default_backend() == "tpu" and jax.device_count() == 1
        folds = (
            stack_kernel.stack_fold(
                x.shape, n_blocks, x.dtype, cb=stacked[0].shape[-1]
            )
            if (enabled and on_tpu)
            else None
        )
        if folds is not None:  # 0 = run the kernel unfolded
            w1s, w2s, w3s, scs = stacked
            w1e, w2e, w3e = w1s, w2s, w3s
            for _ in range(folds):
                x = space_to_depth(x, 2)
                w1e = jax.vmap(conv1x1_block_kernel)(w1e)
                w2e = jax.vmap(k3s1_block_kernel)(w2e)
                w3e = jax.vmap(conv1x1_block_kernel)(w3e)
            sc8 = jnp.concatenate(
                [s.astype(jnp.float32) for s in scs], axis=-1
            )  # (NB, 8)
            x = stack_kernel.preact_stack_fused(
                x,
                w1e[:, 0, 0, 0].astype(x.dtype),
                w2e.astype(x.dtype),
                w3e[:, 0, 0, 0].astype(x.dtype),
                sc8,
                pad_mode,
                False,
            )
            for _ in range(folds):
                x = depth_to_space(x, 2)
            return x

        if use_packed:
            hw = (x.shape[2], x.shape[3])
            x = pack(x)

            def body(h, p):
                w1, w2, w3, scalars = p
                return (
                    preact_fixup_same_packed(
                        h, w1, w2, w3, scalars, width=hw[1], pad_mode=pad_mode
                    ),
                    None,
                )

        elif use_block:
            x = space_to_depth(x, 2)
            # Opt-in (VQVAE3D_FUSED_STACK=1) single-device path: the whole
            # block runs as ONE fused Pallas kernel (ops/fused_block.py) —
            # all intermediates stay in VMEM instead of round-tripping HBM
            # through XLA's pad/slice/copy fusions. custom_vjp supplies
            # exact gradients, so the scan body is NOT rematerialized in
            # this mode (the kernel's residuals are just its inputs).
            # Why opt-in: see fused_block.fused_stack_supported — wins in
            # isolation, loses DMA/compute overlap in the full train step.
            use_fused = fused_block.fused_stack_supported(
                x.shape[-1], tuple(x.shape[1:4])
            )
            if use_fused:
                interp = jax.default_backend() != "tpu"

                def body(h, p):
                    w1, w2, w3, scalars = p
                    w1e = conv1x1_block_kernel(w1)[0, 0, 0].astype(h.dtype)
                    w2e = k3s1_block_kernel(w2).astype(h.dtype)
                    w3e = conv1x1_block_kernel(w3)[0, 0, 0].astype(h.dtype)
                    sc8 = jnp.concatenate(
                        [s.astype(jnp.float32) for s in scalars]
                    )
                    return (
                        fused_block.preact_block_fused(
                            h, w1e, w2e, w3e, sc8, pad_mode, interp
                        ),
                        None,
                    )

                remat = False
            else:

                def body(h, p):
                    w1, w2, w3, scalars = p
                    return (
                        preact_fixup_same_block(
                            h, w1, w2, w3, scalars, pad_mode=pad_mode
                        ),
                        None,
                    )

        else:

            def body(h, p):
                w1, w2, w3, scalars = p
                return (
                    preact_fixup_same_ndhwc(
                        h, w1, w2, w3, scalars, pad_mode=pad_mode
                    ),
                    None,
                )

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, stacked)
        if use_packed:
            return unpack(x, hw)
        if use_block:
            return depth_to_space(x, 2)
        return x

    if use_packed:
        hw = (x.shape[2], x.shape[3])
        x = pack(x)
        for j in range(n_blocks):
            x = make_block(j, hw[1])(x)
        return unpack(x, hw)
    for j in range(n_blocks):
        x = make_block(j, None)(x)
    return x


class DownBlock(nn.Module):
    """n_down × (stride-2 'down' resblock doubling channels, then
    ``n_post_downscale_blocks`` 'same' blocks). Reference layers.py:306-324."""

    in_channels: int
    n_down: int = 2
    resblock: str = "pre-activation"
    n_post_downscale_blocks: int = 0
    num_layers: int = 1
    pad_mode: str = "wrap"
    dtype: Optional[Dtype] = None
    packed: bool = False  # channel-pack the 'same' stacks when profitable
    scan: bool = True  # lax.scan the 'same' stacks (pre-activation only)
    remat_scan: bool = False  # checkpoint each scan iteration
    # literal-stem folded serving: the input arrives s2d(·,2)-folded and the
    # FIRST stride-2 resblock consumes the fold (pre-activation blocks only)
    fold_in: bool = False

    @nn.compact
    def __call__(self, x):
        block = RESBLOCKS[self.resblock]
        pre_act = self.resblock == "pre-activation"
        assert not self.fold_in or pre_act, "fold_in needs pre-activation"
        kw = {"pad_mode": self.pad_mode} if pre_act else {}
        for i in range(self.n_down):
            ch = self.in_channels * 2 ** (i + 1)
            x = block(
                out_channels=ch,
                mode="down",
                num_layers=self.num_layers,
                dtype=self.dtype,
                name=f"down_{i}",
                **({**kw, "fold_in": True} if self.fold_in and i == 0 else kw),
            )(x)
            x = apply_same_stack(
                x,
                self.n_post_downscale_blocks,
                lambda j, pw, ch=ch, i=i: block(
                    out_channels=ch,
                    mode="same",
                    num_layers=self.num_layers,
                    dtype=self.dtype,
                    name=f"down_{i}_post_{j}",
                    **({**kw, "packed_width": pw} if pw else kw),
                ),
                make_params=(
                    (
                        lambda j, ch=ch, i=i: PreActParams(
                            channels=ch,
                            num_layers=self.num_layers,
                            name=f"down_{i}_post_{j}",
                        )()
                    )
                    if pre_act and self.scan
                    else None
                ),
                enabled=self.packed and pre_act,
                remat=self.remat_scan,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
            )
        return x


class UpBlock(nn.Module):
    """Mirror of DownBlock with ResizeConv upsampling.

    Channel schedule (reference layers.py:327-354): layer i (from n_up-1 down
    to 0) maps ``in_channels if i==n_up-1 else out*2**(i+1)`` →
    ``out*2**i``.
    """

    in_channels: int
    out_channels: int
    n_up: int = 2
    resblock: str = "pre-activation"
    n_post_upscale_blocks: int = 0
    num_layers: int = 1
    pad_mode: str = "wrap"
    dtype: Optional[Dtype] = None
    packed: bool = False  # channel-pack the 'same' stacks when profitable
    scan: bool = True  # lax.scan the 'same' stacks (pre-activation only)
    remat_scan: bool = False  # checkpoint each scan iteration
    # literal-stem folded serving: the LAST 'up' resblock emits its output
    # s2d(·,2)-folded and the post-upscale stack after it runs folded
    # (pre-activation + scan only)
    fold_out: bool = False

    @nn.compact
    def __call__(self, x):
        block = RESBLOCKS[self.resblock]
        pre_act = self.resblock == "pre-activation"
        assert not self.fold_out or (pre_act and self.scan), (
            "fold_out needs pre-activation scan stacks"
        )
        kw = {"pad_mode": self.pad_mode} if pre_act else {}
        for i in range(self.n_up - 1, -1, -1):
            ch = self.out_channels * 2**i
            folded = self.fold_out and i == 0
            x = block(
                out_channels=ch,
                mode="up",
                num_layers=self.num_layers,
                dtype=self.dtype,
                name=f"up_{i}",
                **({**kw, "fold_out": True} if folded else kw),
            )(x)
            x = apply_same_stack(
                x,
                self.n_post_upscale_blocks,
                lambda j, pw, ch=ch, i=i: block(
                    out_channels=ch,
                    mode="same",
                    num_layers=self.num_layers,
                    dtype=self.dtype,
                    name=f"up_{i}_post_{j}",
                    **({**kw, "packed_width": pw} if pw else kw),
                ),
                make_params=(
                    (
                        lambda j, ch=ch, i=i: PreActParams(
                            channels=ch,
                            num_layers=self.num_layers,
                            name=f"up_{i}_post_{j}",
                        )()
                    )
                    if pre_act and self.scan
                    else None
                ),
                enabled=self.packed and pre_act,
                remat=self.remat_scan,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                x_folded=folded,
            )
        return x


class PreQuantizationConditioning(nn.Module):
    """Top-down conditioning in the encoder: upsample the coarser level's
    quantization, concat, 1x1x1 proj, then a 'same' resblock down to
    embedding width. Reference layers.py:357-387.

    ``has_aux`` is static: True for every level except the deepest.
    """

    in_channels: int  # after concat (== feature channels + aux emb dim)
    out_channels: int  # embedding dim
    n_up: int = 2
    resblock: str = "pre-activation"
    n_post_upscale_blocks: int = 0
    num_layers: int = 1
    pad_mode: str = "wrap"
    dtype: Optional[Dtype] = None
    packed: bool = False
    scan: bool = True
    remat_scan: bool = False

    @nn.compact
    def __call__(self, x, aux=None):
        # ``aux`` (the coarser level's quantization) is None only for the
        # deepest level; its presence is static at trace time, so the param
        # structure is deterministic per level.
        if aux is not None:
            up = UpBlock(
                in_channels=self.out_channels * 2**self.n_up,
                out_channels=self.out_channels,
                n_up=self.n_up,
                resblock=self.resblock,
                n_post_upscale_blocks=self.n_post_upscale_blocks,
                num_layers=self.num_layers,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                packed=self.packed,
                scan=self.scan,
                remat_scan=self.remat_scan,
                name="upsample",
            )(aux)
            x = jnp.concatenate([x.astype(up.dtype), up], axis=-1)
            x = Conv3D(
                features=self.in_channels,
                kernel_size=1,
                dtype=self.dtype,
                name="proj",
            )(x)
        block = RESBLOCKS[self.resblock]
        kw = (
            {"pad_mode": self.pad_mode}
            if self.resblock == "pre-activation"
            else {}
        )
        return block(
            out_channels=self.out_channels,
            mode="same",
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="pre_q",
            **kw,
        )(x)
