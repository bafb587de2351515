"""Causal 3-stream stack megakernel (ops/causal_kernel.py) vs the
block-space scan (ops/causal_stack.py) — forward and full gradients,
interpret mode (the CPU suite can't run compiled Mosaic; the compiled path
is exercised on real TPU by bench_prior.py / tools/tpu_kernel_tests.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.causal_blocks import CausalPreActParams
from vqvae3d_tpu.ops.causal_kernel import (
    causal_fused_ok,
    causal_stack_fused,
    pack_causal_union,
)
from vqvae3d_tpu.ops.causal_stack import (
    apply_causal_stack,
    fold_causal_block_params,
)


def _make(nb=3, b=1, d=4, h=4, w=4, c=2, cond_dim=0, seed=0):
    """Folded streams + leaf-stacked folded params via the real param
    module (so shapes/init exactly match the model path)."""
    rng = np.random.default_rng(seed)
    c8 = 8 * c
    streams = tuple(
        jnp.asarray(rng.normal(size=(b, d, h, w, c8)), jnp.float32)
        for _ in range(3)
    )
    cond = (
        jnp.asarray(rng.normal(size=(b, d, h, w, 8 * cond_dim)), jnp.float32)
        if cond_dim
        else None
    )
    per_block = []
    for j in range(nb):
        mod = CausalPreActParams(
            channels=c, kernel_size=3, condition_dim=cond_dim
        )
        p = mod.init(jax.random.PRNGKey(j))
        vals = mod.apply(p)
        # randomize the zero-init w3 so gradients flow everywhere
        w1, expand, w2, cnd, w3, scalars = vals
        w3 = tuple(
            jnp.asarray(rng.normal(size=x.shape) * 0.3, jnp.float32)
            for x in w3
        )
        scalars = tuple(
            jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
            for _ in range(7)
        ) + (jnp.asarray([1.0 + 0.1 * rng.normal()], jnp.float32),)
        per_block.append((w1, expand, w2, cnd, w3, scalars))
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_block
    )
    return streams, stacked, cond


def _scan(streams, stacked, cond, dropout_prob=0.0, rng=None):
    # apply_causal_stack folds the ORIGINAL (unfolded) params; here the
    # stacked params are already the module's raw values, so fold via the
    # same path it uses.
    return apply_causal_stack(
        streams, stacked, cond,
        kernel_size=3, dropout_prob=dropout_prob,
        train=dropout_prob > 0, rng=rng,
    )


def _fused(streams, stacked, cond, dropout_prob=0.0, rng=None):
    folded = jax.vmap(lambda p: fold_causal_block_params(p, 3))(stacked)
    weights = jax.vmap(pack_causal_union)(folded)
    has_cond = cond is not None
    b = streams[0].shape[0]
    cond_f = cond if has_cond else jnp.zeros((b, 1, 1, 1, 8), streams[0].dtype)
    xu = jnp.concatenate(streams, axis=-1)
    nb = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if dropout_prob > 0:
        from vqvae3d_tpu.ops.causal_stack import union_dropout_masks

        cb8 = jax.tree_util.tree_leaves(folded)[0].shape[-1]
        mask = union_dropout_masks(rng, nb, b, cb8, dropout_prob)
    else:
        mask = jnp.zeros((nb, b, 1), jnp.float32)
    yu = causal_stack_fused(
        (has_cond, float(dropout_prob), True), xu, cond_f, mask, *weights
    )
    c8 = streams[0].shape[-1]
    return tuple(yu[..., s * c8 : (s + 1) * c8] for s in range(3))


@pytest.mark.parametrize("cond_dim", [0, 2])
def test_fwd_matches_scan(monkeypatch, cond_dim):
    from vqvae3d_tpu.ops import s2d_conv

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    streams, stacked, cond = _make(cond_dim=cond_dim)
    # streams here are ALREADY folded: the scan path folds internally, so
    # hand it the unfolded view
    from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth

    unfolded = tuple(depth_to_space(s, 2) for s in streams)
    cond_un = depth_to_space(cond, 2) if cond is not None else None
    ref = _scan(unfolded, stacked, cond_un)
    got = _fused(streams, stacked, cond)
    got_un = tuple(depth_to_space(g, 2) for g in got)
    for a, b in zip(got_un, ref):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cond_dim", [0, 2])
def test_grads_match_scan(monkeypatch, cond_dim):
    from vqvae3d_tpu.ops import s2d_conv

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    streams, stacked, cond = _make(nb=2, cond_dim=cond_dim, seed=1)
    from vqvae3d_tpu.ops.resize import depth_to_space

    unfolded = tuple(depth_to_space(s, 2) for s in streams)
    cond_un = depth_to_space(cond, 2) if cond is not None else None

    def loss_scan(args):
        st, par, cnd = args
        out = _scan(st, par, cnd)
        return sum(jnp.sum(o * jnp.sin(o)) for o in out)

    def loss_fused(args):
        st, par, cnd = args
        from vqvae3d_tpu.ops.resize import space_to_depth

        stf = tuple(space_to_depth(s, 2) for s in st)
        cf = space_to_depth(cnd, 2) if cnd is not None else None
        out = _fused(stf, par, cf)
        out = tuple(depth_to_space(o, 2) for o in out)
        return sum(jnp.sum(o * jnp.sin(o)) for o in out)

    args = (unfolded, stacked, cond_un)
    g_ref = jax.grad(loss_scan)(args)
    g_got = jax.grad(loss_fused)(args)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    got_leaves = jax.tree_util.tree_leaves(g_got)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def test_batch2_and_deep(monkeypatch):
    from vqvae3d_tpu.ops import s2d_conv

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    from vqvae3d_tpu.ops.resize import depth_to_space

    streams, stacked, cond = _make(nb=5, b=2, d=6, h=4, w=4, c=1, seed=2)
    unfolded = tuple(depth_to_space(s, 2) for s in streams)
    ref = _scan(unfolded, stacked, None)
    got = _fused(streams, stacked, None)
    got_un = tuple(depth_to_space(g, 2) for g in got)
    for a, b in zip(got_un, ref):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_gate():
    # published top config: folded streams (64, 64, 16) x 128 lanes, cb8=32
    assert causal_fused_ok((1, 64, 64, 16, 128), jnp.bfloat16, 32, 128)
    # lane misalignment
    assert not causal_fused_ok((1, 64, 64, 16, 64), jnp.bfloat16, 32, 128)
    assert not causal_fused_ok((1, 64, 64, 16, 128), jnp.bfloat16, 32, 64)
    # too small to matter
    assert not causal_fused_ok((1, 4, 4, 4, 128), jnp.bfloat16, 32, 128)
    # kernel_size gate
    assert not causal_fused_ok(
        (1, 64, 64, 16, 128), jnp.bfloat16, 32, 128, kernel_size=5
    )


@pytest.mark.parametrize("cond_dim", [0, 2])
@pytest.mark.parametrize("p", [0.2, 0.5])
def test_dropout_fwd_matches_scan(monkeypatch, cond_dim, p):
    """Channel-dropout streamed into the kernel as data must sample the
    SAME subnetwork as the scan path (same rng -> same masks -> same
    outputs). Reference semantics: torch Dropout3d after the causal conv
    (pixel_model/layers.py:445)."""
    from vqvae3d_tpu.ops import s2d_conv

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    from vqvae3d_tpu.ops.resize import depth_to_space

    streams, stacked, cond = _make(cond_dim=cond_dim, b=2, seed=4)
    rng = jax.random.PRNGKey(42)
    unfolded = tuple(depth_to_space(s, 2) for s in streams)
    cond_un = depth_to_space(cond, 2) if cond is not None else None
    ref = _scan(unfolded, stacked, cond_un, dropout_prob=p, rng=rng)
    got = _fused(streams, stacked, cond, dropout_prob=p, rng=rng)
    got_un = tuple(depth_to_space(g, 2) for g in got)
    for a, b in zip(got_un, ref):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_dropout_grads_match_scan(monkeypatch):
    from vqvae3d_tpu.ops import s2d_conv

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth

    streams, stacked, cond = _make(nb=2, cond_dim=2, seed=5)
    rng = jax.random.PRNGKey(7)
    p = 0.5
    unfolded = tuple(depth_to_space(s, 2) for s in streams)
    cond_un = depth_to_space(cond, 2)

    def loss_scan(args):
        st, par, cnd = args
        out = _scan(st, par, cnd, dropout_prob=p, rng=rng)
        return sum(jnp.sum(o * jnp.sin(o)) for o in out)

    def loss_fused(args):
        st, par, cnd = args
        stf = tuple(space_to_depth(s, 2) for s in st)
        cf = space_to_depth(cnd, 2)
        out = _fused(stf, par, cf, dropout_prob=p, rng=rng)
        out = tuple(depth_to_space(o, 2) for o in out)
        return sum(jnp.sum(o * jnp.sin(o)) for o in out)

    args = (unfolded, stacked, cond_un)
    g_ref = jax.grad(loss_scan)(args)
    g_got = jax.grad(loss_fused)(args)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    got_leaves = jax.tree_util.tree_leaves(g_got)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)
