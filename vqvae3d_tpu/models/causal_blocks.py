"""Causal 3D convolution stack for autoregressive priors (channels-last).

Re-designs /root/reference/pixel_model/layers.py. The raster order is
(s0, s1, s2) — 'depth', 'height', 'width' in the reference's naming. The
blind-spot-free receptive field is built from three parallel streams
(PixelCNN++-style decomposition, reference layers.py:122-222):

  * depth stream  — all voxels in strictly-previous s0-slices,
  * height stream — previous s1-rows of the current slice,
  * width stream  — previous s2-positions of the current row.

A stack is a 3-tuple of (B, s0, s1, s2, C) arrays (kept as a tuple rather
than a stacked 6-D tensor: XLA fuses the three small convs fine and tuples
avoid degenerate leading dims in TPU layouts).

Causality invariants (reference layers.py:136-139 warns that a violation
sends validation loss to ~0 instantly) are enforced by numeric
impulse-response tests in tests/test_causal.py.

Mask semantics: mask 'A' (first layer) additionally shifts every stream one
step so the current voxel never sees itself; mask 'B' may look at the
current voxel's already-computed streams.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae3d_tpu.ops.conv3d import (
    Conv3D,
    fixup_branch_init,
    kaiming_normal_init,
    torch_conv_default_init,
    xavier_normal_init,
)

Stack = Tuple[jax.Array, jax.Array, jax.Array]
Dtype = Any


# ---------------------------------------------------------------------------
# Stack plumbing (reference layers.py:13-110)
# ---------------------------------------------------------------------------

def _shift_one(x: jax.Array, axis: int) -> jax.Array:
    """Front-pad by one and drop the last element along a spatial axis —
    the mask-'A' 'don't see yourself' shift."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


def shift_backwards_3d(x: jax.Array) -> jax.Array:  # s0 (depth)
    return _shift_one(x, 1)


def shift_down_3d(x: jax.Array) -> jax.Array:  # s1 (height)
    return _shift_one(x, 2)


def shift_right_3d(x: jax.Array) -> jax.Array:  # s2 (width)
    return _shift_one(x, 3)


def input_to_stack(x: jax.Array) -> Stack:
    return (x, x, x)


def stack_to_output(stack: Stack) -> jax.Array:
    d, h, w = stack
    return d + h + w


def map_stack(fn: Callable, stack: Stack) -> Stack:
    return tuple(fn(s) for s in stack)


class CausalConv3dAdd(nn.Module):
    """Three parallel convs growing the blind-spot-free receptive field.

    For kernel size k (odd), kernel shapes are (reference layers.py:193-201):
      depth  (k−1, k, k)   front-padded k−2+? → sees s0-slices < current
                            (after the one-time 'A' shift) and a full (k,k)
                            neighborhood in s1/s2,
      height (1, k−1, k)   sees previous s1-rows of the current slice,
      width  (1, 1, k//2 + (mask=='B'))  sees previous s2-positions
                            (+ the current voxel for 'B').
    """

    features: int
    kernel_size: int = 3
    mask: str = "B"
    use_bias: bool = True
    groups: int = 1
    kernel_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, stack: Stack) -> Stack:
        assert self.mask in ("A", "B")
        k = self.kernel_size
        assert k > 0 and k % 2 == 1, "even kernel sizes are not supported"
        half = k // 2

        d_size = max(k - 1, 1)
        h_size = max(k - 1, 1)
        w_size = max(half + (1 if self.mask == "B" else 0), 1)

        depth, height, width = stack
        if self.mask == "A":
            depth = shift_backwards_3d(depth)
            height = shift_down_3d(height)
            width = shift_right_3d(width)

        kinit = self.kernel_init or torch_conv_default_init()
        common = dict(
            features=self.features,
            use_bias=self.use_bias,
            groups=self.groups,
            kernel_init=kinit,
            dtype=self.dtype,
        )
        depth = Conv3D(
            kernel_size=(d_size, k, k),
            pad=((d_size - 1, 0), (half, half), (half, half)),
            name="depth_conv",
            **common,
        )(depth)
        height = Conv3D(
            kernel_size=(1, h_size, k),
            pad=((0, 0), (h_size - 1, 0), (half, half)),
            name="height_conv",
            **common,
        )(height)
        width = Conv3D(
            kernel_size=(1, 1, w_size),
            pad=((0, 0), (0, 0), (w_size - 1, 0)),
            name="width_conv",
            **common,
        )(width)
        return (depth, height, width)


class ExpandRFConv(nn.Module):
    """Cross-stream mixing: depth feeds height & width, height feeds width
    (reference layers.py:225-248). Causally safe: information only flows
    from strictly-earlier streams to later ones."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, stack: Stack) -> Stack:
        depth, height, width = stack
        c = depth.shape[-1]
        dc = Conv3D(features=2 * c, kernel_size=1, dtype=self.dtype, name="depth_conv")(
            depth
        )
        d2h, d2w = jnp.split(dc, 2, axis=-1)
        h2w = Conv3D(features=c, kernel_size=1, dtype=self.dtype, name="height_conv")(
            height
        )
        width = width + h2w + d2w
        height = height + d2h
        return (depth, height, width)


def _channel_dropout(x: jax.Array, rate: float, rng) -> jax.Array:
    """torch Dropout3d semantics: zero entire channels per sample."""
    b, *_, c = x.shape
    keep = jax.random.bernoulli(rng, 1.0 - rate, (b, 1, 1, 1, c))
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


class ConcatActivation(nn.Module):
    """cat[act(x), −act(−x)] on channels (reference layers.py:112-119)."""

    @nn.compact
    def __call__(self, x):
        return jnp.concatenate([nn.elu(x), -nn.elu(-x)], axis=-1)


class PreActFixupCausalResBlock(nn.Module):
    """Pre-activation bottleneck Fixup causal block (the default for both
    priors — reference layers.py:338-497).

    1x1x1 → ExpandRF (+aux) → k ('B') → (+condition) → 1x1x1, divisor 4,
    7 scalar biases + scale, skip 1x1x1 when shape changes or mask=='A'.
    """

    out_channels: int
    kernel_size: int = 3
    mask: str = "B"
    condition_dim: int = 0
    condition_kernel_size: int = 1
    dropout_prob: float = 0.5
    bottleneck_divisor: int = 4
    concat_activation: bool = False
    use_aux: bool = False
    num_layers: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        stack: Stack,
        aux: Optional[Stack] = None,
        condition: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Stack:
        in_channels = stack[0].shape[-1]
        groups = 2 if self.concat_activation else 1
        branch = max(
            max(in_channels, self.out_channels) // self.bottleneck_divisor, groups
        )

        scalars = {
            n: self.param(f"bias{n}", nn.initializers.zeros_init(), (1,))
            for n in ("1a", "1b", "2a", "2b", "3a", "3b", "4")
        }
        scale = self.param("scale", nn.initializers.ones_init(), (1,))

        if self.dtype is not None:
            stack = map_stack(lambda s: s.astype(self.dtype), stack)
        dt = stack[0].dtype

        def s(name):
            return scalars[name].astype(dt)

        act = (
            ConcatActivation(name="concat_act")
            if self.concat_activation
            else nn.elu
        )

        out = map_stack(lambda x: act(x + s("1a")), stack)
        out = CausalConv3dAdd(
            features=branch,
            kernel_size=1,
            mask=self.mask,
            use_bias=False,
            groups=groups,
            kernel_init=fixup_branch_init(self.num_layers),
            dtype=self.dtype,
            name="branch_conv1",
        )(map_stack(lambda x: x + s("1b"), out))

        out = ExpandRFConv(dtype=self.dtype, name="expand_rf")(out)

        if aux is not None:
            assert self.use_aux, "aux input requires use_aux=True"
            aux_proj = CausalConv3dAdd(
                features=branch,
                kernel_size=1,
                use_bias=True,
                dtype=self.dtype,
                name="aux",
            )(map_stack(nn.elu, aux))
            out = tuple(o + a for o, a in zip(out, aux_proj))

        out = map_stack(lambda x: act(x + s("2a")), out)
        out = CausalConv3dAdd(
            features=branch,
            kernel_size=self.kernel_size,
            mask="B",
            use_bias=False,
            groups=groups,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="branch_conv2",
        )(map_stack(lambda x: x + s("2b"), out))

        if self.dropout_prob > 0 and train:
            rng = self.make_rng("dropout")
            rngs = jax.random.split(rng, 3)
            out = tuple(
                _channel_dropout(o, self.dropout_prob, r) for o, r in zip(out, rngs)
            )

        if condition is not None:
            assert self.condition_dim > 0, "condition projection not initialised"
            cond = Conv3D(
                features=branch,
                kernel_size=self.condition_kernel_size,
                pad=self.condition_kernel_size // 2,
                use_bias=True,
                dtype=self.dtype,
                name="condition",
            )(condition)
            out = tuple(o + cond.astype(o.dtype) for o in out)

        out = map_stack(lambda x: act(x + s("3a")), out)
        out = CausalConv3dAdd(
            features=self.out_channels,
            kernel_size=1,
            mask="B",
            use_bias=False,
            groups=groups,
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="branch_conv3",
        )(map_stack(lambda x: x + s("3b"), out))

        out = map_stack(lambda x: x * scale.astype(dt) + s("4"), out)

        needs_skip = in_channels != self.out_channels or self.mask == "A"
        if needs_skip:
            skip = CausalConv3dAdd(
                features=self.out_channels,
                kernel_size=1,
                mask=self.mask,
                use_bias=True,
                kernel_init=xavier_normal_init(),
                dtype=self.dtype,
                name="skip_conv",
            )(stack)
        else:
            skip = stack
        return tuple(o + sk for o, sk in zip(out, skip))

class _Kernel(nn.Module):
    """Bare kernel parameter at a Conv3D-compatible path ('<name>/kernel')."""

    shape: Tuple[int, ...]
    init: Callable
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        w = self.param("kernel", self.init, self.shape)
        if not self.use_bias:
            return w
        b = self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],))
        return w, b


class _TripleKernel(nn.Module):
    """Param twin of a (bias-less) CausalConv3dAdd: three per-stream conv
    kernels at the same flax paths the module creates."""

    shapes: Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]]
    init: Callable

    @nn.compact
    def __call__(self):
        return tuple(
            _Kernel(shape, self.init, name=n)()
            for shape, n in zip(
                self.shapes, ("depth_conv", "height_conv", "width_conv")
            )
        )


class CausalPreActParams(nn.Module):
    """Parameter-only twin of a mask-'B' PreActFixupCausalResBlock
    (concat_activation off, no aux).

    Creates the exact same parameter tree as the module — scalars,
    branch_conv{1,2,3}/{depth,height,width}_conv/kernel,
    expand_rf/{depth,height}_conv/{kernel,bias}, condition/{kernel,bias} —
    and returns the values, so N structurally-identical blocks can be
    leaf-stacked and run under ONE lax.scan in block space
    (ops/causal_stack.py) with checkpoints fully interchangeable with the
    naive module loop.
    """

    channels: int
    kernel_size: int = 3
    condition_dim: int = 0  # embedded-condition channels (0 = unconditioned)
    bottleneck_divisor: int = 4
    num_layers: int = 1

    @nn.compact
    def __call__(self):
        return _declare_causal_preact_params(self)


def _declare_causal_preact_params(mod):
    """Declare the mask-'B' block's parameter tree inside ``mod``'s compact
    scope and return the values (shared by CausalPreActParams and the
    mask-'A' twin so both produce identical flax paths)."""
    from vqvae3d_tpu.ops.causal_stack import causal_conv_pads

    c = mod.channels
    cb = max(c // mod.bottleneck_divisor, 1)
    scalars = tuple(
        mod.param(f"bias{n}", nn.initializers.zeros_init(), (1,))
        for n in ("1a", "1b", "2a", "2b", "3a", "3b", "4")
    ) + (mod.param("scale", nn.initializers.ones_init(), (1,)),)

    one = ((1, 1, 1, c, cb),) * 3
    w1 = _TripleKernel(
        one, fixup_branch_init(mod.num_layers), name="branch_conv1",
        parent=mod,
    )()

    class _Expand(nn.Module):
        @nn.compact
        def __call__(self2):
            w_dc, b_dc = _Kernel(
                (1, 1, 1, cb, 2 * cb),
                torch_conv_default_init(),
                use_bias=True,
                name="depth_conv",
            )()
            w_h2w, b_h2w = _Kernel(
                (1, 1, 1, cb, cb),
                torch_conv_default_init(),
                use_bias=True,
                name="height_conv",
            )()
            return w_dc, b_dc, w_h2w, b_h2w

    expand = _Expand(name="expand_rf", parent=mod)()

    k2_shapes = tuple(
        (*shape, cb, cb) for shape, _ in causal_conv_pads(mod.kernel_size)
    )
    w2 = _TripleKernel(
        k2_shapes, kaiming_normal_init(), name="branch_conv2", parent=mod
    )()

    cond = None
    if mod.condition_dim > 0:
        cond = _Kernel(
            (1, 1, 1, mod.condition_dim, cb),
            torch_conv_default_init(),
            use_bias=True,
            name="condition",
            parent=mod,
        )()

    w3 = _TripleKernel(
        ((1, 1, 1, cb, c),) * 3, nn.initializers.zeros_init(),
        name="branch_conv3",
        parent=mod,
    )()
    return w1, expand, w2, cond, w3, scalars


class CausalPreActParamsA(nn.Module):
    """Parameter-only twin of the mask-'A' PreActFixupCausalResBlock: the
    mask-'B' tree (CausalPreActParams) plus the skip projection the 'A'
    block always has (skip_conv/{depth,height,width}_conv/{kernel,bias}).
    The mask-'A' shifts are data ops with no parameters — they fold into
    the conv kernels (ops/causal_stack.py::fold_causal_block_params_A)."""

    channels: int
    kernel_size: int = 3
    condition_dim: int = 0
    bottleneck_divisor: int = 4
    num_layers: int = 1

    @nn.compact
    def __call__(self):
        base = _declare_causal_preact_params(self)
        c = self.channels

        class _Skip(nn.Module):
            @nn.compact
            def __call__(self2):
                return tuple(
                    _Kernel(
                        (1, 1, 1, c, c),
                        xavier_normal_init(),
                        use_bias=True,
                        name=n,
                    )()
                    for n in ("depth_conv", "height_conv", "width_conv")
                )

        skip = _Skip(name="skip_conv", parent=self)()
        return base + (skip,)


class FixupCausalResBlock(nn.Module):
    """Simpler 2-conv causal Fixup variant (reference layers.py:251-335)."""

    out_channels: int
    kernel_size: int = 3
    mask: str = "B"
    out: bool = False
    dropout_prob: float = 0.5
    num_layers: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        stack: Stack,
        aux=None,
        condition=None,
        train: bool = False,
    ) -> Stack:
        assert aux is None and condition is None, (
            "FixupCausalResBlock supports neither aux nor conditioning"
        )
        in_channels = stack[0].shape[-1]
        branch = max(in_channels, self.out_channels)

        scalars = {
            n: self.param(f"bias{n}", nn.initializers.zeros_init(), (1,))
            for n in ("1a", "1b", "2a", "2b")
        }
        scale = self.param("scale", nn.initializers.ones_init(), (1,))

        if self.dtype is not None:
            stack = map_stack(lambda x: x.astype(self.dtype), stack)
        dt = stack[0].dtype

        def s(name):
            return scalars[name].astype(dt)

        out = CausalConv3dAdd(
            features=branch,
            kernel_size=self.kernel_size,
            mask=self.mask,
            use_bias=False,
            kernel_init=fixup_branch_init(self.num_layers),
            dtype=self.dtype,
            name="branch_conv1",
        )(map_stack(lambda x: x + s("1a"), stack))
        out = map_stack(lambda x: nn.elu(x + s("1b")), out)

        if self.dropout_prob > 0 and train:
            rng = self.make_rng("dropout")
            rngs = jax.random.split(rng, 3)
            out = tuple(
                _channel_dropout(o, self.dropout_prob, r) for o, r in zip(out, rngs)
            )

        out = CausalConv3dAdd(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            mask="B",
            use_bias=False,
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="branch_conv2",
        )(map_stack(lambda x: x + s("2a"), out))
        out = map_stack(lambda x: x * scale.astype(dt) + s("2b"), out)

        needs_skip = in_channels != self.out_channels or self.mask == "A"
        if needs_skip:
            skip = CausalConv3dAdd(
                features=self.out_channels,
                kernel_size=1,
                mask=self.mask,
                use_bias=True,
                kernel_init=(
                    xavier_normal_init() if self.out else kaiming_normal_init()
                ),
                dtype=self.dtype,
                name="skip_conv",
            )(stack)
        else:
            skip = stack
        out = tuple(o + sk for o, sk in zip(out, skip))

        if not self.out:
            out = map_stack(nn.elu, out)
        return out


def tanh_glu(x: jax.Array) -> jax.Array:
    """PixelCNN++-style gate: tanh(a)·sigmoid(b) over channel halves."""
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


class GatedResBlock(nn.Module):
    """PixelCNN++-style tanh·sigmoid gated causal block.

    Re-design of /root/reference/pixel_model/layers.py:504-610. Note: the
    reference force-disables this block (pixelcnn.py:151 hard-sets
    ``use_gated_block = False``) and its forward's return signature is
    incompatible with the PixelCNN layer loop; this version is functional
    and causality-tested. Cross-stream feeds are explicitly shifted (this
    block's convs don't rely on a preceding mask-'A' layer for stream
    separation): depth→{height,width} shifted one s0-slice, height→width
    shifted one s1-row (reference :580-582).
    """

    kernel_size: int = 3
    mask: str = "B"
    condition_dim: int = 0
    condition_kernel_size: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        stack: Stack,
        aux=None,
        condition: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Stack:
        assert aux is None, "GatedResBlock has no aux input"
        in_channels = stack[0].shape[-1]
        if self.dtype is not None:
            stack = map_stack(lambda s: s.astype(self.dtype), stack)

        depth, height, width = CausalConv3dAdd(
            features=in_channels * 2,
            kernel_size=self.kernel_size,
            mask=self.mask,
            use_bias=True,
            dtype=self.dtype,
            name="causal_conv",
        )(stack)

        dc = Conv3D(
            features=in_channels * 4,
            kernel_size=1,
            groups=2,
            dtype=self.dtype,
            name="depth_conv",
        )(depth)
        d2h, d2w = jnp.split(dc, 2, axis=-1)

        height = height + shift_backwards_3d(d2h)
        h2w = Conv3D(
            features=in_channels * 2, kernel_size=1, dtype=self.dtype,
            name="height_conv",
        )(height)
        width = width + shift_down_3d(h2w) + shift_down_3d(shift_backwards_3d(d2w))

        streams = [depth, height, width]
        if condition is not None:
            assert self.condition_dim > 0
            for i in range(3):
                cond = Conv3D(
                    features=in_channels * 2,
                    kernel_size=self.condition_kernel_size,
                    pad=self.condition_kernel_size // 2,
                    dtype=self.dtype,
                    name=f"condition_conv_{i}",
                )(condition)
                streams[i] = streams[i] + cond.astype(streams[i].dtype)

        gated = [tanh_glu(s) for s in streams]

        if self.mask == "A":
            skip = CausalConv3dAdd(
                features=in_channels,
                kernel_size=1,
                mask="A",
                dtype=self.dtype,
                name="skip_conv",
            )(stack)
        else:
            skip = stack

        out = []
        for i, (sk, g) in enumerate(zip(skip, gated)):
            res = Conv3D(
                features=in_channels, kernel_size=1, dtype=self.dtype,
                name=f"res_conv_{i}",
            )(g)
            out.append(sk + res)
        return tuple(out)


# Above this sequence length the dense O(S²) logits path gives way to the
# chunked online-softmax path (the bottom code level is 128 voxels; the mid
# level is 8192 — exactly the case the dense path can't afford).
_DENSE_MAX_SEQ = 2048


def _flash_causal_attention(qh, kh, vh, sm_scale: float):
    """Flash causal attention via the bundled Pallas TPU kernel.

    qh/kh/vh: (B, nh, S, dh). Pads S up to a 128 multiple — safe under the
    causal mask (padded keys sit strictly in the future of every real query).
    The (S, S) score matrix never materializes (the dense path needs
    B·nh·S² fp32 — 2 GB per stream at the mid level's S=8192).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, nh, s, dh = qh.shape
    pad = (-s) % 128
    if pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
    blk = min(128, s + pad)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(qh, kh, vh, causal=True, sm_scale=sm_scale, block_sizes=sizes)
    return out[:, :, :s] if pad else out


class CausalAttention(nn.Module):
    """Multi-head causal self-attention over the flattened voxel sequence,
    applied independently per stream (reference layers.py:613-647).

    Paths:
      * Pallas flash kernel (``use_flash='auto'`` on TPU) whenever logit
        dropout is inactive — O(S) memory instead of the dense O(S²).
      * Chunked online-softmax attention (ops/chunked_attention.py) when
        logit dropout IS active (the reference quirk: dropout on pre-mask
        logits with dropped entries set to −1e3, layers.py:636-639 — live
        in all published PixelSNAIL train configs) and for long sequences
        off-TPU: O(S·block) memory, rematerialized backward. This is what
        makes reference-config PixelSNAIL training affordable at the mid
        level's S=8192 (dense would need 2 GB of logits per stream).
      * Dense for short sequences (≤ _DENSE_MAX_SEQ).
    """

    num_heads: int = 8
    dropout_prob: float = 0.5
    use_flash: str = "auto"  # 'auto' | 'never' | 'always'
    use_chunked: str = "auto"  # 'auto' | 'never' | 'always'

    @nn.compact
    def __call__(
        self,
        keys: Stack,
        queries: Stack,
        values: Stack,
        train: bool = False,
    ) -> Stack:
        outs = []
        for i, (k, q, v) in enumerate(zip(keys, queries, values)):
            outs.append(self._attend(k, q, v, train, i))
        return tuple(outs)

    def _attend(self, k, q, v, train, stream_idx):
        b, s0, s1, s2, ck = k.shape
        cv = v.shape[-1]
        nh = self.num_heads
        assert ck % nh == 0 and cv % nh == 0
        seq = s0 * s1 * s2
        dh = ck // nh
        sm_scale = dh**-0.5

        dropout_active = train and self.dropout_prob > 0
        if self.use_flash == "always":
            flash_ok = True
        elif self.use_flash == "never":
            flash_ok = False
        else:
            flash_ok = (
                not dropout_active
                and jax.default_backend() == "tpu"
                and cv == ck
            )

        if flash_ok:
            qh = q.reshape(b, seq, nh, dh).transpose(0, 2, 1, 3)
            kh = k.reshape(b, seq, nh, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(b, seq, nh, cv // nh).transpose(0, 2, 1, 3)
            out = _flash_causal_attention(qh, kh, vh, sm_scale)
            return out.transpose(0, 2, 1, 3).reshape(b, s0, s1, s2, cv)

        # Dropout-active TPU train path: Pallas flash kernel with IN-KERNEL
        # logit dropout (ops/flash_dropout_attention.py) — the reference's
        # pre-mask dropout quirk without the chunked path's ~100x slice/
        # while-loop overhead at S=8192. VQVAE3D_FLASH_DROPOUT=0 falls back
        # to the XLA chunked path.
        if (
            dropout_active
            and self.use_flash != "never"
            and jax.default_backend() == "tpu"
            and cv == ck
            and seq > _DENSE_MAX_SEQ
            and os.environ.get("VQVAE3D_FLASH_DROPOUT") != "0"
        ):
            from vqvae3d_tpu.ops.flash_dropout_attention import (
                flash_causal_dropout_attention,
                seed_from_rng,
            )

            seed = seed_from_rng(self.make_rng("dropout"))
            qh = q.reshape(b, seq, nh, dh).transpose(0, 2, 1, 3)
            kh = k.reshape(b, seq, nh, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(b, seq, nh, cv // nh).transpose(0, 2, 1, 3)
            out = flash_causal_dropout_attention(
                qh, kh, vh, sm_scale,
                dropout_p=self.dropout_prob, seed=seed,
            )
            return out.transpose(0, 2, 1, 3).reshape(b, s0, s1, s2, cv)

        if self.use_chunked == "always":
            chunked_ok = True
        elif self.use_chunked == "never":
            chunked_ok = False
        else:
            chunked_ok = seq > _DENSE_MAX_SEQ
        if chunked_ok:
            from vqvae3d_tpu.ops.chunked_attention import causal_attention_chunked

            rng = self.make_rng("dropout") if dropout_active else None
            qh = q.reshape(b, seq, nh, dh).transpose(0, 2, 1, 3)
            kh = k.reshape(b, seq, nh, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(b, seq, nh, cv // nh).transpose(0, 2, 1, 3)
            out = causal_attention_chunked(
                qh, kh, vh, sm_scale,
                dropout_p=self.dropout_prob if dropout_active else 0.0,
                dropout_rng=rng,
            )
            return out.transpose(0, 2, 1, 3).reshape(b, s0, s1, s2, cv)

        kf = k.reshape(b, seq, nh, dh)
        qf = q.reshape(b, seq, nh, dh) * sm_scale
        vf = v.reshape(b, seq, nh, cv // nh)

        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf).astype(jnp.float32)

        if dropout_active:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout_prob, logits.shape)
            logits = jnp.where(keep, logits / (1.0 - self.dropout_prob), -1e3)

        mask = jnp.tril(jnp.ones((seq, seq), jnp.bool_))
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1)

        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), vf)
        return out.reshape(b, s0, s1, s2, cv)


class CausalAttentionPixelBlock(nn.Module):
    """PixelSNAIL block: N causal resblocks → causal attention over
    (stack, out, background) → out-proj resblock with attention as aux
    (reference layers.py:650-703).

    The reference passes ``condition_cache=condition`` into the inner layers
    (:688) — a bug that defeats its cache; here conditioning is simply
    passed through correctly.
    """

    model_dim: int
    kernel_size: int = 3
    num_layers_per_block: int = 5
    bottleneck_divisor: int = 4
    condition_dim: int = 0
    num_heads: int = 8
    causal_dropout_prob: float = 0.5
    attention_dropout_prob: float = 0.5
    num_layers: int = 1  # fixup scale
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        stack: Stack,
        background: jax.Array,
        condition: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Stack:
        branch = self.model_dim // self.bottleneck_divisor

        out = stack
        for i in range(self.num_layers_per_block):
            out = PreActFixupCausalResBlock(
                out_channels=self.model_dim,
                kernel_size=self.kernel_size,
                mask="B",
                condition_dim=self.condition_dim,
                dropout_prob=self.causal_dropout_prob,
                bottleneck_divisor=self.bottleneck_divisor,
                num_layers=self.num_layers,
                dtype=self.dtype,
                name=f"causal_{i}",
            )(out, condition=condition, train=train)

        bg = background.astype(out[0].dtype)
        kv_in = tuple(
            jnp.concatenate([s_i, o_i, bg], axis=-1) for s_i, o_i in zip(stack, out)
        )
        kv = CausalConv3dAdd(
            features=branch * 2,
            kernel_size=1,
            dtype=self.dtype,
            name="key_value_proj",
        )(kv_in)
        keys = tuple(x[..., :branch] for x in kv)
        values = tuple(x[..., branch:] for x in kv)

        q_in = tuple(jnp.concatenate([o_i, bg], axis=-1) for o_i in out)
        queries = CausalConv3dAdd(
            features=branch, kernel_size=1, dtype=self.dtype, name="query_proj"
        )(q_in)

        # Role note: the reference passes (queries, keys, values) into a
        # forward declared (keys, queries, ...) (layers.py:619 vs :694), so
        # the output position's vector comes from the KV projection and the
        # attended-over positions from the query projection. Mirror that
        # pairing exactly (it's an equivalent parameterization, and converted
        # reference checkpoints depend on it): q:=keys, k:=queries.
        attn = CausalAttention(
            num_heads=self.num_heads,
            dropout_prob=self.attention_dropout_prob,
            name="causal_attention",
        )(keys=queries, queries=keys, values=values, train=train)

        return PreActFixupCausalResBlock(
            out_channels=self.model_dim,
            kernel_size=self.kernel_size,
            mask="B",
            condition_dim=self.condition_dim,
            dropout_prob=self.causal_dropout_prob,
            bottleneck_divisor=self.bottleneck_divisor,
            use_aux=True,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="out_proj",
        )(out, aux=attn, condition=condition, train=train)
