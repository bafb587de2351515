"""Space-to-depth-domain conv rewrites (ops/s2d_conv.py, ops/conv3d.py).

The k4-stride2 rewrite is wired automatically into conv3d(); these tests pin
its exactness against the direct XLA convolution, plus the block-space k3
'same' and 1×1×1 embeddings used by the block-domain stacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.ops.conv3d import conv3d, pad3d
from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth
from vqvae3d_tpu.ops.s2d_conv import (
    conv1x1_block_kernel,
    conv_k3s1_same_via_s2d,
    conv_k4s2_via_s2d,
)


def _direct_conv(xp, w, stride):
    return jax.lax.conv_general_dilated(
        xp,
        w,
        window_strides=(stride,) * 3,
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("cin,cout", [(3, 6), (8, 16), (16, 32)])
def test_k4s2_conv3d_matches_direct(cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 6, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 4, 4, cin, cout)), jnp.float32)
    xp = pad3d(x, [(1, 1)] * 3)
    ref = _direct_conv(xp, w, 2)
    got = conv3d(x, w, stride=2, padding=[(1, 1)] * 3)  # auto-rewrites
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
    # explicit path too
    np.testing.assert_allclose(
        conv_k4s2_via_s2d(xp, w), ref, atol=2e-4, rtol=1e-4
    )


def test_k4s2_gradients_match_direct():
    rng = np.random.default_rng(1)
    cin, cout = 8, 16
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 4, 4, cin, cout)), jnp.float32)

    def loss_ours(x, w):
        return jnp.sum(conv3d(x, w, stride=2, padding=[(1, 1)] * 3) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_direct_conv(pad3d(x, [(1, 1)] * 3), w, 2) ** 2)

    gx1, gw1 = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx1, gx2, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(gw1, gw2, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("pad_mode", ["zeros", "wrap"])
@pytest.mark.parametrize("cin,cout", [(8, 8), (16, 8)])
def test_k3s1_same_block_space(pad_mode, cin, cout):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 10, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)), jnp.float32)
    ref = conv3d(x, w, padding=[(1, 1)] * 3, pad_mode=pad_mode)
    got = conv_k3s1_same_via_s2d(x, w, pad_mode)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("cin,cout", [(4, 8), (16, 32)])
def test_k2s2_conv3d_matches_direct(cin, cout):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 10, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = _direct_conv(x, w, 2) + bias
    got = conv3d(x, w, bias, stride=2)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    def loss_ours(x, w):
        return jnp.sum(conv3d(x, w, stride=2) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_direct_conv(x, w, 2) ** 2)

    g1 = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_conv1x1_block_diag():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 5, 7)), jnp.float32)
    ref = conv3d(x, w)
    got = depth_to_space(
        conv3d(space_to_depth(x, 2), conv1x1_block_kernel(w)), 2
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_block_stack_heuristic():
    from vqvae3d_tpu.ops.s2d_conv import block_stack_ok

    # 256-config C=16 post-downscale stack at the 64×64×32 grid: block space
    assert block_stack_ok(16, (32, 64, 64), 5)
    # wide stacks stay NDHWC
    assert not block_stack_ok(64, (32, 64, 64), 5)
    # odd dims can't space-to-depth
    assert not block_stack_ok(16, (31, 64, 64), 5)
    # tiny grids are op-overhead-bound
    assert not block_stack_ok(16, (8, 16, 16), 5)


def test_vqvae_block_stacks_match_ndhwc(monkeypatch):
    """Model outputs identical with mid-C stacks in block space vs NDHWC."""
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
    from vqvae3d_tpu.ops import s2d_conv

    # trigger block-space stacks on test-size grids; packed stays off for
    # C<=4 via its own (unpatched) threshold, so block space covers them too
    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)

    kw = dict(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 8),
        n_pre_quantization_blocks=2,
        n_post_quantization_blocks=2,
        n_post_upscale_blocks=1,
        n_post_downscale_blocks=1,
        base_network_channels=8,
        dtype=jnp.float32,
        remat=False,
    )
    m_off = VQVAE(VQVAEConfig(packed_stacks="off", **kw))
    m_auto = VQVAE(VQVAEConfig(packed_stacks="auto", **kw))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 16, 1), jnp.float32)
    v_off = m_off.init(jax.random.PRNGKey(1), x, train=False)
    v_auto = m_auto.init(jax.random.PRNGKey(1), x, train=False)
    assert jax.tree_util.tree_map(lambda a: a.shape, v_off) == jax.tree_util.tree_map(
        lambda a: a.shape, v_auto
    )

    y_off, (l_off, _, i_off) = m_off.apply(v_off, x, train=False)
    y_auto, (l_auto, _, i_auto) = m_auto.apply(v_off, x, train=False)
    np.testing.assert_allclose(y_off, y_auto, rtol=1e-4, atol=1e-5)
    for a, b in zip(i_off, i_auto):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(l_off, l_auto):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_block_stack_gradients_match(monkeypatch):
    """Gradients through a block-space stack == NDHWC stack."""
    from vqvae3d_tpu.models.blocks import PreActParams, apply_same_stack
    from vqvae3d_tpu.ops import s2d_conv
    from flax import linen as nn

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    C, n = 8, 3

    class Stack(nn.Module):
        enabled: bool

        @nn.compact
        def __call__(self, x):
            return apply_same_stack(
                x,
                n,
                None,
                make_params=lambda j: PreActParams(
                    channels=C, num_layers=7, name=f"blk{j}"
                )(),
                enabled=self.enabled,
                pad_mode="wrap",
            )

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, C), jnp.float32)
    m_ref, m_blk = Stack(enabled=False), Stack(enabled=True)
    params = m_ref.init(jax.random.PRNGKey(1), x)

    def loss(m):
        return lambda p, x: jnp.sum(jnp.sin(m.apply(p, x)))

    g_ref = jax.grad(loss(m_ref), argnums=(0, 1))(params, x)
    g_blk = jax.grad(loss(m_blk), argnums=(0, 1))(params, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_blk)
    ):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize(
    "K,pad",
    [
        ((3, 3, 3), ((1, 1), (1, 1), (1, 1))),
        ((2, 3, 3), ((1, 0), (1, 1), (1, 1))),  # causal depth stream shape
        ((1, 2, 3), ((0, 0), (1, 0), (2, 0))),  # causal height/width shapes
        ((5, 3, 1), ((2, 2), (1, 1), (0, 0))),
        ((1, 1, 2), ((0, 0), (0, 0), (1, 0))),
    ],
)
@pytest.mark.parametrize("pad_mode", ["zeros", "wrap"])
def test_stride1_block_kernel_generic(K, pad, pad_mode):
    from vqvae3d_tpu.ops.s2d_conv import stride1_block_kernel

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 10, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*K, 3, 4)), jnp.float32)
    ref = conv3d(x, w, padding=pad, pad_mode=pad_mode)
    wb, pad_b = stride1_block_kernel(w, pad)
    got = depth_to_space(
        conv3d(space_to_depth(x, 2), wb, padding=pad_b, pad_mode=pad_mode), 2
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_upsample2x_to_s2d_matches_trilinear():
    from vqvae3d_tpu.ops.resize import trilinear_upsample2x, upsample2x_to_s2d

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 6, 3)), jnp.float32)
    ref = trilinear_upsample2x(x)
    got = depth_to_space(upsample2x_to_s2d(x), 2)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("k,use_bias", [(3, False), (3, True), (1, False)])
def test_resize_conv_block_space_matches_stock(monkeypatch, k, use_bias):
    from vqvae3d_tpu.models import blocks as blocks_mod
    from vqvae3d_tpu.models.blocks import ResizeConv3D
    from vqvae3d_tpu.ops import s2d_conv

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 10, 8)), jnp.float32)
    kw = dict(
        features=16, kernel_size=k, pad=1 if k == 3 else 0, use_bias=use_bias
    )
    stock = ResizeConv3D(**kw)
    params = stock.init(jax.random.PRNGKey(0), x)  # tiny grid → stock path
    y_stock = stock.apply(params, x)

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)  # force block path
    blk = ResizeConv3D(**kw)
    params_blk = blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_map(
        lambda a: a.shape, params
    ) == jax.tree_util.tree_map(lambda a: a.shape, params_blk)
    y_blk = blk.apply(params, x)
    np.testing.assert_allclose(y_blk, y_stock, atol=2e-4, rtol=1e-4)


def test_k4s2_odd_dims_falls_back():
    # odd spatial dims can't space-to-depth; the stock path must handle them
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 7, 9, 5, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 3, 4)), jnp.float32)
    xp = pad3d(x, [(1, 1), (0, 1), (1, 2)])
    ref = _direct_conv(xp, w, 2)
    got = conv3d(x, w, stride=2, padding=[(1, 1), (0, 1), (1, 2)])
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


class TestResizeConvComposite:
    """resize_conv_s2d (upsample composed into the conv) must equal the
    two-step path (upsample2x_to_s2d + block conv) bit-for-bit in fp32,
    including all 26 border regions and both pad modes."""

    def _two_step(self, x, w, pad_mode):
        from vqvae3d_tpu.ops.resize import upsample2x_to_s2d
        from vqvae3d_tpu.ops.conv3d import conv3d
        from vqvae3d_tpu.ops.s2d_conv import (
            conv1x1_block_kernel,
            k3s1_block_kernel,
        )

        xs = upsample2x_to_s2d(x)
        if w.shape[0] == 3:
            return conv3d(
                xs, k3s1_block_kernel(w), padding=[(1, 1)] * 3, pad_mode=pad_mode
            )
        return conv3d(xs, conv1x1_block_kernel(w))

    @pytest.mark.parametrize("pad_mode", ["zeros", "wrap"])
    @pytest.mark.parametrize("k", [1, 3])
    @pytest.mark.parametrize("dims", [(4, 6, 2), (2, 2, 2), (8, 4, 6), (4, 4, 1)])
    def test_exact(self, pad_mode, k, dims):
        from vqvae3d_tpu.ops.s2d_conv import resize_conv_s2d

        rng = np.random.default_rng(hash((pad_mode, k, dims)) % 2**31)
        cin, cout = 5, 3
        x = jnp.asarray(rng.normal(size=(2, *dims, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, k, cin, cout)), jnp.float32)
        got = resize_conv_s2d(x, w, pad_mode)
        want = self._two_step(x, w, pad_mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_grads_match(self):
        from vqvae3d_tpu.ops.s2d_conv import resize_conv_s2d

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 2)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 16)), jnp.float32)

        def f_new(x, w):
            return jnp.vdot(resize_conv_s2d(x, w, "zeros"), g)

        def f_old(x, w):
            return jnp.vdot(self._two_step(x, w, "zeros"), g)

        gx_n, gw_n = jax.grad(f_new, argnums=(0, 1))(x, w)
        gx_o, gw_o = jax.grad(f_old, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_o), atol=3e-5)
        np.testing.assert_allclose(np.asarray(gw_n), np.asarray(gw_o), atol=3e-5)
