import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.blocks import (
    DownBlock,
    EvoNorm3DS0,
    EvonormResBlock,
    FixupResBlock,
    PreActFixupResBlock,
    PreQuantizationConditioning,
    ResizeConv3D,
    UpBlock,
    group_std,
)

KEY = jax.random.PRNGKey(0)


def _x(shape, key=KEY):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("block_cls", [PreActFixupResBlock, FixupResBlock, EvonormResBlock])
@pytest.mark.parametrize(
    "mode,spatial_out",
    [("same", (8, 8, 4)), ("down", (4, 4, 2)), ("up", (16, 16, 8)), ("out", (8, 8, 4))],
)
def test_resblock_shapes(block_cls, mode, spatial_out):
    x = _x((2, 8, 8, 4, 6))
    block = block_cls(out_channels=10, mode=mode, num_layers=4)
    y, _ = block.init_with_output(KEY, x)
    assert y.shape == (2, *spatial_out, 10)
    assert jnp.isfinite(y).all()


def test_preact_fixup_identity_at_init():
    """branch_conv3 is zero-init → a same-shape block is the identity at init."""
    x = _x((1, 4, 4, 4, 8))
    block = PreActFixupResBlock(out_channels=8, mode="same", num_layers=4)
    y, _ = block.init_with_output(KEY, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_fixup_regular_identity_at_init():
    """branch_conv2 zero-init → output == activation(skip(x))."""
    x = _x((1, 4, 4, 4, 8))
    block = FixupResBlock(out_channels=8, mode="same", num_layers=4)
    y, variables = block.init_with_output(KEY, x)
    w = variables["params"]["skip_conv"]["kernel"]
    b = variables["params"]["skip_conv"]["bias"]
    skip = jnp.einsum("ndhwc,co->ndhwo", x, w[0, 0, 0]) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(jax.nn.elu(skip)), atol=1e-5)


def test_group_std_matches_manual():
    x = _x((2, 4, 4, 2, 16))
    std = group_std(x, groups=2)
    assert std.shape == x.shape
    xg = np.asarray(x).reshape(2, 4, 4, 2, 2, 8)
    for b in range(2):
        for g in range(2):
            expected = np.sqrt(np.var(xg[b, ..., g, :]) + 1e-5)
            got = np.asarray(std)[b, 0, 0, 0, g * 8]
            np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_evonorm_shape_and_finite():
    x = _x((2, 4, 4, 2, 16))
    y, _ = EvoNorm3DS0().init_with_output(KEY, x)
    assert y.shape == x.shape
    assert jnp.isfinite(y).all()


def test_resize_conv_upsamples():
    x = _x((1, 4, 4, 2, 3))
    y, _ = ResizeConv3D(features=5).init_with_output(KEY, x)
    assert y.shape == (1, 8, 8, 4, 5)


def test_down_up_blocks_roundtrip_shapes():
    x = _x((1, 16, 16, 8, 4))
    down = DownBlock(in_channels=4, n_down=2, n_post_downscale_blocks=1, num_layers=4)
    y, _ = down.init_with_output(KEY, x)
    assert y.shape == (1, 4, 4, 2, 16)

    up = UpBlock(in_channels=16, out_channels=4, n_up=2, n_post_upscale_blocks=1, num_layers=4)
    z, _ = up.init_with_output(KEY, y)
    assert z.shape == (1, 16, 16, 8, 4)


def test_pre_quantization_conditioning():
    # deepest level: no aux
    x = _x((1, 4, 4, 2, 16))
    pqc = PreQuantizationConditioning(in_channels=16, out_channels=2, num_layers=4)
    y, _ = pqc.init_with_output(KEY, x)
    assert y.shape == (1, 4, 4, 2, 2)

    # finer level: aux from a coarser grid (spatial /4, emb dim 8)
    x = _x((1, 8, 8, 4, 16))
    aux = _x((1, 2, 2, 1, 8))
    pqc = PreQuantizationConditioning(in_channels=16 + 2, out_channels=2, num_layers=4)
    y, _ = pqc.init_with_output(KEY, x, aux)
    assert y.shape == (1, 8, 8, 4, 2)
