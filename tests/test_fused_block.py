"""Fused PreActFixup block kernel (ops/fused_block.py) vs the XLA block-space
body (ops/s2d_conv.py::preact_fixup_same_block) — forward and gradients,
interpret mode (the CPU suite can't run compiled Mosaic; a TPU-gated test
covers the compiled path)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.ops.fused_block import preact_block_fused
from vqvae3d_tpu.ops.s2d_conv import (
    conv1x1_block_kernel,
    k3s1_block_kernel,
    preact_fixup_same_block,
)


def _make_inputs(b=1, d=8, h=6, w=4, c=2, seed=0):
    """Block-space activation (C8 = 8c) + stock-parameter-shaped weights."""
    rng = np.random.default_rng(seed)
    c8, cb = 8 * c, max(c, 1)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c8)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(1, 1, 1, c, cb)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, cb, cb)) * 0.2, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(1, 1, 1, cb, c)) * 0.3, jnp.float32)
    scalars = tuple(
        jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32) for _ in range(7)
    ) + (jnp.asarray([1.0 + 0.1 * rng.normal()], jnp.float32),)
    return x, w1, w2, w3, scalars


def _fused(x, w1, w2, w3, scalars, pad_mode):
    w1e = conv1x1_block_kernel(w1)[0, 0, 0].astype(x.dtype)
    w2e = k3s1_block_kernel(w2).astype(x.dtype)
    w3e = conv1x1_block_kernel(w3)[0, 0, 0].astype(x.dtype)
    sc8 = jnp.concatenate(scalars)
    return preact_block_fused(x, w1e, w2e, w3e, sc8, pad_mode, True)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
@pytest.mark.parametrize("b,d,h,w,c", [(1, 8, 6, 4, 2), (2, 4, 4, 4, 1)])
def test_fwd_matches_xla_body(pad_mode, b, d, h, w, c):
    x, w1, w2, w3, scalars = _make_inputs(b, d, h, w, c)
    ref = preact_fixup_same_block(x, w1, w2, w3, scalars, pad_mode=pad_mode)
    got = _fused(x, w1, w2, w3, scalars, pad_mode)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["wrap", "zeros"])
def test_grads_match_xla_body(pad_mode):
    x, w1, w2, w3, scalars = _make_inputs(1, 8, 6, 4, 2, seed=3)

    def loss_ref(x, w1, w2, w3, scalars):
        y = preact_fixup_same_block(x, w1, w2, w3, scalars, pad_mode=pad_mode)
        return jnp.sum(jnp.sin(y))

    def loss_fused(x, w1, w2, w3, scalars):
        y = _fused(x, w1, w2, w3, scalars, pad_mode)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, w2, w3, scalars)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, w2, w3, scalars)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_fwd_bf16_close():
    x, w1, w2, w3, scalars = _make_inputs(1, 8, 4, 4, 2, seed=5)
    xb = x.astype(jnp.bfloat16)
    ref = preact_fixup_same_block(xb, w1, w2, w3, scalars, pad_mode="wrap")
    got = _fused(xb, w1, w2, w3, scalars, "wrap")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_stack_integration_interpret(monkeypatch):
    """apply_same_stack with the fused kernel forced on (interpret mode)
    matches the XLA block-space scan, values and gradients."""
    from flax import linen as nn

    from vqvae3d_tpu.models.blocks import PreActParams, apply_same_stack
    from vqvae3d_tpu.ops import s2d_conv

    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    C, n = 8, 3

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            return apply_same_stack(
                x,
                n,
                None,
                make_params=lambda j: PreActParams(
                    channels=C, num_layers=7, name=f"blk{j}"
                )(),
                pad_mode="wrap",
            )

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, C), jnp.float32)
    m = Stack()
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p, x):
        return jnp.sum(jnp.sin(m.apply(p, x)))

    g_ref = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setenv("VQVAE3D_FUSED_STACK", "1")
    g_fus = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)
    ):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled-kernel check needs TPU"
)
def test_compiled_matches_interpret_tpu():
    x, w1, w2, w3, scalars = _make_inputs(1, 16, 16, 8, 2, seed=7)
    w1e = conv1x1_block_kernel(w1)[0, 0, 0]
    w2e = k3s1_block_kernel(w2)
    w3e = conv1x1_block_kernel(w3)[0, 0, 0]
    sc8 = jnp.concatenate(scalars)
    ref = preact_block_fused(x, w1e, w2e, w3e, sc8, "wrap", True)
    got = preact_block_fused(x, w1e, w2e, w3e, sc8, "wrap", False)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
