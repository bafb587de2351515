"""Stack-resident megakernel (ops/stack_kernel.py) vs scanning the XLA
block-space body (ops/s2d_conv.py::preact_fixup_same_block) — whole-stack
forward and gradients, interpret mode (the CPU suite can't run compiled
Mosaic; the compiled path is exercised on real TPU by the train bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.ops.s2d_conv import (
    conv1x1_block_kernel,
    k3s1_block_kernel,
    preact_fixup_same_block,
)
from vqvae3d_tpu.ops.stack_kernel import preact_stack_fused


def _make_stack(nb=3, b=1, d=8, h=6, w=4, c=2, seed=0):
    """Block-space activation (C8 = 8c) + per-block stock-shaped weights."""
    rng = np.random.default_rng(seed)
    c8, cb = 8 * c, max(c, 1)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c8)), jnp.float32)
    blocks = []
    for _ in range(nb):
        w1 = jnp.asarray(rng.normal(size=(1, 1, 1, c, cb)) * 0.3, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, cb, cb)) * 0.2, jnp.float32)
        w3 = jnp.asarray(rng.normal(size=(1, 1, 1, cb, c)) * 0.3, jnp.float32)
        scalars = tuple(
            jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
            for _ in range(7)
        ) + (jnp.asarray([1.0 + 0.1 * rng.normal()], jnp.float32),)
        blocks.append((w1, w2, w3, scalars))
    return x, blocks


def _ref(x, blocks, pad_mode):
    for w1, w2, w3, scalars in blocks:
        x = preact_fixup_same_block(x, w1, w2, w3, scalars, pad_mode=pad_mode)
    return x


def _fused(x, blocks, pad_mode):
    w1e = jnp.stack(
        [conv1x1_block_kernel(w1)[0, 0, 0] for w1, _, _, _ in blocks]
    ).astype(x.dtype)
    w2e = jnp.stack(
        [k3s1_block_kernel(w2) for _, w2, _, _ in blocks]
    ).astype(x.dtype)
    w3e = jnp.stack(
        [conv1x1_block_kernel(w3)[0, 0, 0] for _, _, w3, _ in blocks]
    ).astype(x.dtype)
    sc8 = jnp.stack([jnp.concatenate(sc) for _, _, _, sc in blocks])
    return preact_stack_fused(x, w1e, w2e, w3e, sc8, pad_mode, True)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
@pytest.mark.parametrize("nb,b,d,h,w,c", [(3, 1, 8, 6, 4, 2), (2, 2, 4, 4, 4, 1)])
def test_fwd_matches_scan(pad_mode, nb, b, d, h, w, c):
    x, blocks = _make_stack(nb, b, d, h, w, c)
    ref = _ref(x, blocks, pad_mode)
    got = _fused(x, blocks, pad_mode)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_grads_match_scan(pad_mode):
    x, blocks = _make_stack(3, 1, 8, 6, 4, 2, seed=3)

    def loss_ref(x, blocks):
        return jnp.sum(jnp.sin(_ref(x, blocks, pad_mode)))

    def loss_fused(x, blocks):
        return jnp.sum(jnp.sin(_fused(x, blocks, pad_mode)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_grads_match_scan_batched():
    """Batch > 1 exercises the cross-batch grad sum over the grid."""
    x, blocks = _make_stack(2, 2, 4, 4, 4, 1, seed=7)

    def loss_ref(x, blocks):
        return jnp.sum(jnp.sin(_ref(x, blocks, "wrap")))

    def loss_fused(x, blocks):
        return jnp.sum(jnp.sin(_fused(x, blocks, "wrap")))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_double_fold_matches_plain(pad_mode):
    """Two space-to-depth folds + twice-embedded weights (the C≤4 stack
    path picked by ``stack_fold``) equals the plain NDHWC block loop."""
    from vqvae3d_tpu.models.blocks import preact_fixup_same_ndhwc
    from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth
    from vqvae3d_tpu.ops.stack_kernel import stack_fold

    nb, b, d, h, w, c = 2, 1, 8, 8, 8, 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    blocks = []
    for _ in range(nb):
        w1 = jnp.asarray(rng.normal(size=(1, 1, 1, c, c)) * 0.3, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.2, jnp.float32)
        w3 = jnp.asarray(rng.normal(size=(1, 1, 1, c, c)) * 0.3, jnp.float32)
        sc = tuple(
            jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
            for _ in range(7)
        ) + (jnp.asarray([1.0], jnp.float32),)
        blocks.append((w1, w2, w3, sc))

    assert stack_fold(x.shape, nb, x.dtype) == 2  # C=2 folds twice

    ref = x
    for w1, w2, w3, sc in blocks:
        ref = preact_fixup_same_ndhwc(ref, w1, w2, w3, sc, pad_mode=pad_mode)

    xf = space_to_depth(space_to_depth(x, 2), 2)
    w1e = jnp.stack(
        [
            conv1x1_block_kernel(conv1x1_block_kernel(w1))[0, 0, 0]
            for w1, _, _, _ in blocks
        ]
    )
    w2e = jnp.stack(
        [k3s1_block_kernel(k3s1_block_kernel(w2)) for _, w2, _, _ in blocks]
    )
    w3e = jnp.stack(
        [
            conv1x1_block_kernel(conv1x1_block_kernel(w3))[0, 0, 0]
            for _, _, w3, _ in blocks
        ]
    )
    sc8 = jnp.stack([jnp.concatenate(sc) for _, _, _, sc in blocks])
    got = preact_stack_fused(xf, w1e, w2e, w3e, sc8, pad_mode, True)
    got = depth_to_space(depth_to_space(got, 2), 2)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def _make_ndhwc_stack(nb, b, d, h, w, c, cb, seed=0):
    """Plain NDHWC activation + stock weights for the 0-fold kernel tier
    (C and Cb deliberately NOT multiples of 8 to stress lane padding)."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    blocks = []
    for _ in range(nb):
        w1 = jnp.asarray(rng.normal(size=(1, 1, 1, c, cb)) * 0.3, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, cb, cb)) * 0.2, jnp.float32)
        w3 = jnp.asarray(rng.normal(size=(1, 1, 1, cb, c)) * 0.3, jnp.float32)
        sc = tuple(
            jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
            for _ in range(7)
        ) + (jnp.asarray([1.0 + 0.1 * rng.normal()], jnp.float32),)
        blocks.append((w1, w2, w3, sc))
    return x, blocks


def _fused_zero_fold(x, blocks, pad_mode):
    """The exact call apply_same_stack makes at stack_fold == 0: stock
    weight stacks, no embedding, kernel runs on the unfolded activation."""
    w1e = jnp.stack([w1[0, 0, 0] for w1, _, _, _ in blocks]).astype(x.dtype)
    w2e = jnp.stack([w2 for _, w2, _, _ in blocks]).astype(x.dtype)
    w3e = jnp.stack([w3[0, 0, 0] for _, _, w3, _ in blocks]).astype(x.dtype)
    sc8 = jnp.stack([jnp.concatenate(sc) for _, _, _, sc in blocks])
    return preact_stack_fused(x, w1e, w2e, w3e, sc8, pad_mode, True)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
@pytest.mark.parametrize(
    "nb,b,d,h,w,c,cb",
    [
        (3, 1, 8, 6, 4, 9, 5),  # odd widths, lane-padded
        (2, 1, 4, 4, 2, 12, 6),  # depth-2 minor (the 8x8x2 level-2 shape)
    ],
)
def test_zero_fold_fwd_matches_ndhwc(pad_mode, nb, b, d, h, w, c, cb):
    """0-fold tier (VERDICT-r4 #7): the kernel on an UNFOLDED activation
    with stock weights equals the plain NDHWC block loop — the path the
    512-res level-1 (C=72) and level-2 (8x8x2) stacks now take."""
    from vqvae3d_tpu.models.blocks import preact_fixup_same_ndhwc

    x, blocks = _make_ndhwc_stack(nb, b, d, h, w, c, cb, seed=21)
    ref = x
    for w1, w2, w3, sc in blocks:
        ref = preact_fixup_same_ndhwc(ref, w1, w2, w3, sc, pad_mode=pad_mode)
    got = _fused_zero_fold(x, blocks, pad_mode)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_zero_fold_grads_match_ndhwc(pad_mode):
    from vqvae3d_tpu.models.blocks import preact_fixup_same_ndhwc

    x, blocks = _make_ndhwc_stack(3, 1, 8, 6, 4, 9, 5, seed=23)

    def loss_ref(x, blocks):
        h = x
        for w1, w2, w3, sc in blocks:
            h = preact_fixup_same_ndhwc(h, w1, w2, w3, sc, pad_mode=pad_mode)
        return jnp.sum(jnp.sin(h))

    def loss_fused(x, blocks):
        return jnp.sum(jnp.sin(_fused_zero_fold(x, blocks, pad_mode)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_stack_fold_policy_zero_fold_tier():
    """The 512-res full-config stacks the r4 trace left on XLA scans now
    dispatch to the unfolded resident kernel; unsupported cases stay None."""
    from vqvae3d_tpu.ops.stack_kernel import stack_fold

    bf16 = jnp.bfloat16
    # decoder level-1 C=72 @(32,32,8): C>32, fold tiers can't fire -> 0
    assert stack_fold((1, 32, 32, 8, 72), 50, bf16, cb=36) == 0
    # level-2 C=32 @(8,8,2): depth 2 can't halve -> 0
    assert stack_fold((1, 8, 8, 2, 32), 50, bf16, cb=16) == 0
    # short stacks (up/down, 2-5 blocks) stay on the XLA paths
    assert stack_fold((1, 8, 8, 2, 32), 3, bf16, cb=16) is None
    # a wide stack too big for resident VMEM stays unsupported
    assert stack_fold((1, 128, 128, 32, 72), 50, bf16, cb=36) is None
    # the existing fold tiers are untouched
    assert stack_fold((1, 8, 8, 8, 2), 2, jnp.float32) == 2


def test_fwd_bf16_close():
    x, blocks = _make_stack(2, 1, 8, 4, 4, 2, seed=5)
    xb = x.astype(jnp.bfloat16)
    ref = _ref(xb, blocks, "wrap")
    got = _fused(xb, blocks, "wrap")
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=0.05,
        atol=0.05,
    )


@pytest.fixture
def force_streaming(monkeypatch):
    """Force the streaming-io kernels (HBM ANY refs + explicit DMA — the
    512-res big-stack path) on test-sized volumes by zeroing the resident
    cap."""
    from vqvae3d_tpu.ops import stack_kernel

    monkeypatch.setattr(stack_kernel, "_MAX_VOLUME_BYTES", 0)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
@pytest.mark.parametrize("nb,b,d,h,w,c", [(3, 1, 8, 6, 4, 2), (2, 2, 4, 4, 4, 1)])
def test_streaming_fwd_matches_scan(force_streaming, pad_mode, nb, b, d, h, w, c):
    x, blocks = _make_stack(nb, b, d, h, w, c)
    ref = _ref(x, blocks, pad_mode)
    got = _fused(x, blocks, pad_mode)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_streaming_grads_match_scan(force_streaming, pad_mode):
    x, blocks = _make_stack(3, 2, 8, 6, 4, 2, seed=13)

    def loss_ref(x, blocks):
        return jnp.sum(jnp.sin(_ref(x, blocks, pad_mode)))

    def loss_fused(x, blocks):
        return jnp.sum(jnp.sin(_fused(x, blocks, pad_mode)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


@pytest.fixture
def force_tiled(monkeypatch):
    """Force the depth-tiled kernels (HBM ping-pong windows — the path for
    volumes beyond the streaming kernel's scratch cap) on test-sized
    volumes."""
    from vqvae3d_tpu.ops import stack_kernel

    monkeypatch.setattr(stack_kernel, "_FORCE_MODE", "tiled")


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
@pytest.mark.parametrize("nb,b,d,h,w,c", [(3, 1, 8, 6, 4, 2), (2, 2, 4, 4, 4, 1)])
def test_tiled_fwd_matches_scan(force_tiled, pad_mode, nb, b, d, h, w, c):
    x, blocks = _make_stack(nb, b, d, h, w, c)
    ref = _ref(x, blocks, pad_mode)
    got = _fused(x, blocks, pad_mode)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_tiled_grads_match_scan(force_tiled, pad_mode):
    x, blocks = _make_stack(3, 2, 8, 6, 4, 2, seed=13)

    def loss_ref(x, blocks):
        return jnp.sum(jnp.sin(_ref(x, blocks, pad_mode)))

    def loss_fused(x, blocks):
        return jnp.sum(jnp.sin(_fused(x, blocks, pad_mode)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        # scalar grads are whole-volume sums — compare relative to magnitude
        np.testing.assert_allclose(
            b, a, rtol=3e-4, atol=3e-4 * max(float(np.max(np.abs(a))), 1.0)
        )
