"""Numeric causality tests for the autoregressive stack.

The reference's own warning (pixel_model/layers.py:136-139): if causality is
broken, validation loss collapses to ~0 — so these are the most important
tests in the suite. Strategy: perturb the input at voxel v and assert the
logits at every raster position p <= v are bit-identical (fp32).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.causal_blocks import (
    CausalConv3dAdd,
    ExpandRFConv,
    input_to_stack,
    stack_to_output,
)
from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig

KEY = jax.random.PRNGKey(0)
DIMS = (3, 4, 3)


def _randomize(params, key, scale=0.3):
    """Replace every kernel/bias with random values so zero-init branches
    don't trivially hide causality bugs."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * scale for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


def _raster_positions(dims):
    s0, s1, s2 = dims
    for i0 in range(s0):
        for i1 in range(s1):
            for i2 in range(s2):
                yield (i0, i1, i2)


def _flat(pos, dims):
    return (pos[0] * dims[1] + pos[1]) * dims[2] + pos[2]


def _check_causality(apply_fn, x, dims, positions=None):
    """apply_fn(x) → logits with same spatial dims. Perturb x at v, check
    logits unchanged at every p <= v."""
    base = np.asarray(apply_fn(x))
    if positions is None:
        positions = list(_raster_positions(dims))[:: max(1, len(list(_raster_positions(dims))) // 8)]
    for v in positions:
        x2 = x.at[(0, *v)].add(3.0)  # perturb all channels via broadcast? no:
        x2 = x.at[(0, *v, slice(None))].add(3.0)
        out = np.asarray(apply_fn(x2))
        diff = np.abs(out - base).sum(axis=-1)[0]  # (s0, s1, s2)
        vflat = _flat(v, dims)
        for p in _raster_positions(dims):
            if _flat(p, dims) <= vflat:
                assert diff[p] == 0.0, (
                    f"causality violated: perturbing {v} changed logits at {p}"
                )


def test_causal_conv_add_single_layer_mask_A():
    """Mask-'A' conv: output at the impulse position and before must be 0."""
    x = jnp.zeros((1, *DIMS, 1))
    imp_pos = (1, 2, 1)
    x = x.at[(0, *imp_pos, 0)].set(1.0)

    conv = CausalConv3dAdd(features=1, kernel_size=3, mask="A", use_bias=False)
    variables = conv.init(KEY, input_to_stack(x))
    # all-ones weights so any reachable position lights up
    params = jax.tree.map(jnp.ones_like, variables["params"])
    out = stack_to_output(conv.apply({"params": params}, input_to_stack(x)))
    out = np.asarray(out)[0, ..., 0]

    vflat = _flat(imp_pos, DIMS)
    for p in _raster_positions(DIMS):
        if _flat(p, DIMS) <= vflat:
            assert out[p] == 0.0, f"impulse at {imp_pos} leaked to {p}"
    # and it must reach the immediate raster successor
    assert out[1, 2, 2] != 0.0


def test_causal_conv_add_A_then_B_composition():
    """A 'B' conv is only causal on a stack that already passed an 'A'
    layer (reference layers.py:217: "the padding below only works with the
    mask 'A' padding done beforehand"). Verify the A→B composition: an
    impulse at v must not reach any output position p <= v."""
    x = jnp.zeros((1, *DIMS, 1))
    imp_pos = (1, 1, 1)
    x = x.at[(0, *imp_pos, 0)].set(1.0)

    conv_a = CausalConv3dAdd(features=1, kernel_size=3, mask="A", use_bias=False)
    conv_b = CausalConv3dAdd(features=1, kernel_size=3, mask="B", use_bias=False)
    va = conv_a.init(KEY, input_to_stack(x))
    pa = jax.tree.map(jnp.ones_like, va["params"])
    mid = conv_a.apply({"params": pa}, input_to_stack(x))
    vb = conv_b.init(KEY, mid)
    pb = jax.tree.map(jnp.ones_like, vb["params"])
    out = stack_to_output(conv_b.apply({"params": pb}, mid))
    out = np.asarray(out)[0, ..., 0]

    vflat = _flat(imp_pos, DIMS)
    for p in _raster_positions(DIMS):
        if _flat(p, DIMS) <= vflat:
            assert out[p] == 0.0, f"impulse at {imp_pos} leaked to {p}"
    assert np.abs(out).sum() > 0  # it does reach the future


def test_expand_rf_direction():
    """ExpandRF mixes depth→{height,width} and height→width only."""
    x = jnp.ones((1, *DIMS, 2))
    zero = jnp.zeros_like(x)
    module = ExpandRFConv()
    variables = module.init(KEY, (x, zero, zero))
    # kernels → 1, biases → 0 (a ones-bias would light every stream up)
    params = jax.tree_util.tree_map_with_path(
        lambda path, l: (
            jnp.zeros_like(l) if "bias" in str(path[-1]) else jnp.ones_like(l)
        ),
        variables["params"],
    )

    d, h, w = module.apply({"params": params}, (x, zero, zero))
    assert np.abs(np.asarray(h)).sum() > 0  # depth fed height
    assert np.abs(np.asarray(w)).sum() > 0  # depth fed width

    d, h, w = module.apply({"params": params}, (zero, x, zero))
    assert np.abs(np.asarray(d)).sum() == 0  # height must NOT feed depth
    assert np.abs(np.asarray(w)).sum() > 0  # height fed width

    d, h, w = module.apply({"params": params}, (zero, zero, x))
    assert np.abs(np.asarray(d)).sum() == 0  # width feeds nothing
    assert np.abs(np.asarray(h)).sum() == 0


@pytest.mark.parametrize("use_cond", [False, True])
def test_pixelcnn_causality(use_cond):
    cfg = PixelCNNConfig(
        input_dim=6,
        condition_dim=5 if use_cond else 0,
        model_dim=8,
        num_resblocks=2,
        dropout_prob=0.0,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    x = jax.random.uniform(KEY, (1, *DIMS, 6))
    cond = jax.random.uniform(KEY, (1, *DIMS, 5)) if use_cond else None
    variables = model.init(KEY, x, cond, train=False)
    params = _randomize(variables["params"], jax.random.PRNGKey(1))

    def apply_fn(x):
        return model.apply({"params": params}, x, cond, train=False)

    _check_causality(apply_fn, x, DIMS)


def test_pixelcnn_condition_affects_everywhere():
    cfg = PixelCNNConfig(
        input_dim=6, condition_dim=5, model_dim=8, num_resblocks=1,
        dropout_prob=0.0, dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    x = jax.random.uniform(KEY, (1, *DIMS, 6))
    cond = jax.random.uniform(KEY, (1, *DIMS, 5))
    variables = model.init(KEY, x, cond, train=False)
    params = _randomize(variables["params"], jax.random.PRNGKey(1))
    a = model.apply({"params": params}, x, cond, train=False)
    b = model.apply({"params": params}, x, cond + 1.0, train=False)
    # conditioning is not autoregressive — it may (and should) change all logits
    assert np.abs(np.asarray(a - b)).min() > 0


@pytest.mark.parametrize("use_cond", [False, True])
def test_pixelsnail_causality(use_cond):
    cfg = PixelSNAILConfig(
        input_dim=6,
        condition_dim=5 if use_cond else 0,
        model_dim=8,
        num_layers_per_block=1,
        num_blocks=1,
        causal_dropout_prob=0.0,
        attention_dropout_prob=0.0,
        num_heads=2,
        dtype=jnp.float32,
    )
    model = PixelSNAIL(cfg)
    x = jax.random.uniform(KEY, (1, *DIMS, 6))
    cond = jax.random.uniform(KEY, (1, *DIMS, 5)) if use_cond else None
    variables = model.init(KEY, x, cond, train=False)
    params = _randomize(variables["params"], jax.random.PRNGKey(1))

    def apply_fn(x):
        return model.apply({"params": params}, x, cond, train=False)

    _check_causality(apply_fn, x, DIMS)
