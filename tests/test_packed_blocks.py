"""Packed (channel-in-front) resblock path: exact equivalence with NDHWC.

The packed path (ops/packed_blocks.py) re-expresses small-channel 'same'
PreActFixupResBlocks on a (B, C, D, H*W) layout; these tests pin it to the
stock NDHWC path: same parameter tree, same outputs, same gradients, for
both padding modes — and end-to-end through the full VQVAE with
packed_stacks='auto' vs 'off' on identical parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.blocks import PreActFixupResBlock
from vqvae3d_tpu.ops import packed_blocks
from vqvae3d_tpu.ops.packed_blocks import pack, packed_stack_ok, unpack


def _mk_block(pad_mode, packed_width=None):
    return PreActFixupResBlock(
        out_channels=4,
        mode="same",
        num_layers=7,
        pad_mode=pad_mode,
        packed_width=packed_width,
    )


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_packed_block_matches_ndhwc(pad_mode):
    D, H, W, C = 8, 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (2, D, H, W, C), jnp.float32)

    ref = _mk_block(pad_mode)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)

    pk = _mk_block(pad_mode, packed_width=W)
    params_pk = pk.init(jax.random.PRNGKey(1), pack(x))
    # identical parameter trees (paths and shapes)
    ref_tree = jax.tree_util.tree_map(lambda a: a.shape, params)
    pk_tree = jax.tree_util.tree_map(lambda a: a.shape, params_pk)
    assert ref_tree == pk_tree

    y_pk = unpack(pk.apply(params, pack(x)), (H, W))
    np.testing.assert_allclose(y_ref, y_pk, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_packed_block_gradients_match(pad_mode):
    D, H, W, C = 8, 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (1, D, H, W, C), jnp.float32)
    ref = _mk_block(pad_mode)
    pk = _mk_block(pad_mode, packed_width=W)
    params = ref.init(jax.random.PRNGKey(1), x)

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(ref.apply(p, x)))

    def loss_pk(p, x):
        return jnp.sum(jnp.sin(unpack(pk.apply(p, pack(x)), (H, W))))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pk = jax.grad(loss_pk, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pk)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_heuristic():
    # level-0 pre-q of the 512-res full config: pack
    assert packed_stack_ok(2, (32, 128, 128), 50)
    # C=18 post-q: no (scalar expansion too wide)
    assert not packed_stack_ok(18, (32, 128, 128), 50)
    # tiny coarse grids: no
    assert not packed_stack_ok(8, (8, 32, 32), 50)
    # unpackable geometry (H*W not lane-aligned): no
    assert not packed_stack_ok(2, (32, 100, 100), 50)


def test_vqvae_scan_stacks_matches_loop():
    """lax.scan'd stacks == the per-block module loop, identical params."""
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig

    kw = dict(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 8),
        n_pre_quantization_blocks=3,
        n_post_quantization_blocks=3,
        n_post_upscale_blocks=2,
        n_post_downscale_blocks=2,
        base_network_channels=4,
        dtype=jnp.float32,
        remat=False,
        packed_stacks="off",
    )
    m_loop = VQVAE(VQVAEConfig(scan_stacks=False, **kw))
    m_scan = VQVAE(VQVAEConfig(scan_stacks=True, **kw))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 16, 1), jnp.float32)
    v_loop = m_loop.init(jax.random.PRNGKey(1), x, train=False)
    v_scan = m_scan.init(jax.random.PRNGKey(1), x, train=False)
    t_loop = jax.tree_util.tree_map(lambda a: a.shape, v_loop)
    t_scan = jax.tree_util.tree_map(lambda a: a.shape, v_scan)
    assert t_loop == t_scan

    y_loop, (l_loop, _, i_loop) = m_loop.apply(v_loop, x, train=False)
    y_scan, (l_scan, _, i_scan) = m_scan.apply(v_loop, x, train=False)
    np.testing.assert_allclose(y_loop, y_scan, rtol=1e-5, atol=1e-6)
    for a, b in zip(i_loop, i_scan):
        np.testing.assert_array_equal(a, b)


def test_vqvae_packed_auto_matches_off(monkeypatch):
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig

    # trigger packing even on test-size grids
    monkeypatch.setattr(packed_blocks, "_MIN_VOXELS", 1)

    kw = dict(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 8),
        n_pre_quantization_blocks=2,
        n_post_quantization_blocks=2,
        n_post_upscale_blocks=1,
        n_post_downscale_blocks=1,
        base_network_channels=4,
        dtype=jnp.float32,
        remat=False,
    )
    m_off = VQVAE(VQVAEConfig(packed_stacks="off", **kw))
    m_auto = VQVAE(VQVAEConfig(packed_stacks="auto", **kw))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 16, 1), jnp.float32)
    v_off = m_off.init(jax.random.PRNGKey(1), x, train=False)
    v_auto = m_auto.init(jax.random.PRNGKey(1), x, train=False)
    t_off = jax.tree_util.tree_map(lambda a: a.shape, v_off)
    t_auto = jax.tree_util.tree_map(lambda a: a.shape, v_auto)
    assert t_off == t_auto

    y_off, (l_off, _, i_off) = m_off.apply(v_off, x, train=False)
    y_auto, (l_auto, _, i_auto) = m_auto.apply(v_off, x, train=False)
    np.testing.assert_allclose(y_off, y_auto, rtol=1e-4, atol=1e-5)
    for a, b in zip(i_off, i_auto):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(l_off, l_auto):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
