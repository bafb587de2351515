"""Block-space scanned causal stack (ops/causal_stack.py).

Pins that PixelCNN with ``scan_stacks=True`` — the mask-'B' segment folded
to 2x block space and run as one lax.scan over leaf-stacked params — is
numerically the SAME model as the naive per-block module loop (which is
itself torch-oracle- and causality-tested): identical parameter tree,
identical logits, identical gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.ops import s2d_conv


def _cfg(scan, cond_dim=0, **kw):
    base = dict(
        input_dim=12,
        condition_dim=cond_dim,
        model_dim=8,
        kernel_size=3,
        num_resblocks=3,
        dropout_prob=0.5,
        dtype=jnp.float32,
        scan_stacks=scan,
    )
    base.update(kw)
    return PixelCNNConfig(**base)


def _data(cond_dim=0, shape=(2, 4, 4, 8)):
    rng = np.random.default_rng(0)
    b, *sp = shape
    codes = rng.integers(0, 12, size=shape)
    x = jax.nn.one_hot(jnp.asarray(codes), 12, dtype=jnp.float32)
    cond = None
    if cond_dim:
        cond = jnp.asarray(
            rng.normal(size=(b, *sp, cond_dim)), jnp.float32
        )
    return x, cond


@pytest.mark.parametrize("cond_dim", [0, 6])
def test_scan_matches_loop(monkeypatch, cond_dim):
    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    x, cond = _data(cond_dim)
    scan_model = PixelCNN(_cfg(True, cond_dim))
    loop_model = PixelCNN(_cfg(False, cond_dim))

    params = scan_model.init(jax.random.PRNGKey(0), x, cond)
    # identical parameter trees: loop params load into the scan model
    params_loop = loop_model.init(jax.random.PRNGKey(0), x, cond)
    ts = jax.tree_util.tree_structure(params)
    assert ts == jax.tree_util.tree_structure(params_loop)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_loop)
    ):
        assert a.shape == b.shape

    got = scan_model.apply(params, x, cond)
    ref = loop_model.apply(params, x, cond)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_scan_gradients_match_loop(monkeypatch):
    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    cond_dim = 5
    x, cond = _data(cond_dim, shape=(1, 4, 4, 4))
    scan_model = PixelCNN(_cfg(True, cond_dim, num_resblocks=2))
    loop_model = PixelCNN(_cfg(False, cond_dim, num_resblocks=2))
    params = scan_model.init(jax.random.PRNGKey(1), x, cond)

    def loss(m):
        def f(p):
            out = m.apply(p, x, cond)
            return jnp.sum(out * jnp.sin(out))

        return f

    g1 = jax.grad(loss(scan_model))(params)
    g2 = jax.grad(loss(loop_model))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-4)


def test_scan_train_dropout_runs(monkeypatch):
    """Dropout RNG streams differ between the two paths (per-block fold_in vs
    per-module make_rng) so train-mode equality is not expected — but the
    folded channel-dropout must run, stay finite, and keep eval equal."""
    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    x, _ = _data()
    model = PixelCNN(_cfg(True, remat_scan=True))
    params = model.init(jax.random.PRNGKey(2), x)
    out = model.apply(
        params, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    assert bool(jnp.all(jnp.isfinite(out)))


def test_scan_dropout_mask_is_channelwise(monkeypatch):
    """Folded channel dropout = torch Dropout3d: one keep decision per
    ORIGINAL channel per sample, tiled over the 8 phases."""
    from vqvae3d_tpu.ops.causal_stack import _channel_dropout_folded
    from vqvae3d_tpu.ops.resize import depth_to_space

    x = jnp.ones((2, 2, 2, 2, 8 * 3), jnp.float32)
    y = _channel_dropout_folded(x, 0.5, jax.random.PRNGKey(0))
    # unfold: every surviving channel is uniform over space; dropped are 0
    y_full = depth_to_space(y, 2)  # (2,4,4,4,3)
    flat = y_full.reshape(2, -1, 3)
    per_chan_min = flat.min(axis=1)
    per_chan_max = flat.max(axis=1)
    np.testing.assert_allclose(per_chan_min, per_chan_max)
    assert set(np.unique(np.asarray(y))) <= {0.0, 2.0}


def test_causal_stack_ok_gates():
    from vqvae3d_tpu.ops.causal_stack import causal_stack_ok

    big = (32, 128, 128)
    assert causal_stack_ok(16, big, 50)
    assert not causal_stack_ok(64, big, 50)  # channels too big
    assert not causal_stack_ok(16, (31, 128, 128), 50)  # odd dim
    assert not causal_stack_ok(16, (2, 4, 4), 50)  # tiny grid
    assert not causal_stack_ok(16, big, 50, concat_activation=True)
