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
