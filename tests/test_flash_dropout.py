"""Tests for the Pallas flash causal attention with in-kernel logit dropout.

The kernel (ops/flash_dropout_attention.py) uses the TPU hardware PRNG
(pltpu.prng_seed / prng_random_bits) which has no interpret-mode lowering,
so every test here is TPU-gated — they run in tools/tpu_kernel_tests.py's
real-TPU sweep and are skipped by the CPU suite.

Strategy: `collect_mask=True` makes the kernel emit the keep-mask it
actually used, so a dense JAX reference built with the *kernel's own mask*
checks the forward and all three input grads exactly (up to flash-vs-dense
softmax reassociation) — including that the backward kernels regenerate
the identical mask by reseeding (any fwd/bwd mask mismatch shows up as a
large grad error).

Reference semantics under test: dropout on PRE-MASK logits, kept scaled
1/(1-p), dropped set to -1e3, causal mask after
(/root/reference/pixel_model/layers.py:636-639).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":
    pytest.skip(
        "flash-dropout kernel needs the TPU hardware PRNG (no interpret-mode"
        " lowering for prng_seed)",
        allow_module_level=True,
    )

from vqvae3d_tpu.ops.flash_dropout_attention import (  # noqa: E402
    flash_causal_dropout_attention,
    seed_from_rng,
)

B, NH, S, DH = 2, 4, 640, 32  # S deliberately not a block multiple
SM = DH**-0.5


def dense_ref(q, k, v, sm_scale, mask=None, p=0.0):
    """fp32 dense reference; `mask` is the kernel-extracted keep mask."""
    qf = (q.astype(jnp.float32) * sm_scale).astype(q.dtype).astype(jnp.float32)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qf, k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if mask is not None:
        logits = jnp.where(mask.astype(bool), logits / (1.0 - p), -1e3)
    s = q.shape[2]
    causal = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(causal[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w, v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.fixture(scope="module")
def qkv():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, NH, S, DH), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, NH, S, DH), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, NH, S, DH), jnp.float32)
    return q, k, v


def test_forward_parity_no_dropout(qkv):
    q, k, v = qkv
    out = flash_causal_dropout_attention(q, k, v, SM, 0.0)
    ref = dense_ref(q, k, v, SM)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_parity_with_kernel_mask(qkv):
    q, k, v = qkv
    seed = jnp.array([1234], jnp.int32)
    out, mask = flash_causal_dropout_attention(
        q, k, v, SM, 0.5, seed=seed, collect_mask=True
    )
    ref = dense_ref(q, k, v, SM, mask=mask, p=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    # keep rate over the causally-visible region is ~1-p (exact threshold
    # 2^31 for p=0.5)
    tri = np.tril(np.ones((S, S), bool))
    rate = np.asarray(mask)[..., tri].mean()
    assert abs(rate - 0.5) < 5e-3


def test_grads_match_dense_with_kernel_mask(qkv):
    """Checks dq/dk/dv against jax.grad of the dense reference built from
    the kernel's own extracted mask — this verifies the backward kernels
    regenerate the forward's dropout mask bit-identically."""
    q, k, v = qkv
    seed = jnp.array([99], jnp.int32)
    _, mask = flash_causal_dropout_attention(
        q, k, v, SM, 0.5, seed=seed, collect_mask=True
    )

    def loss_kernel(q, k, v):
        o = flash_causal_dropout_attention(q, k, v, SM, 0.5, seed=seed)
        return jnp.sum(o**2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_ref(q, k, v, SM, mask=mask, p=0.5).astype(q.dtype) ** 2)

    gk = jax.grad(loss_kernel, (0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, (0, 1, 2))(q, k, v)
    for a, b in zip(gk, gd):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 5e-4, rel


def test_deterministic_and_seed_sensitive(qkv):
    q, k, v = qkv
    seed = jnp.array([7], jnp.int32)
    o1 = flash_causal_dropout_attention(q, k, v, SM, 0.5, seed=seed)
    o2 = flash_causal_dropout_attention(q, k, v, SM, 0.5, seed=seed)
    o3 = flash_causal_dropout_attention(q, k, v, SM, 0.5, seed=seed + 1)
    assert bool((o1 == o2).all())
    assert bool((o1 != o3).any())


def test_bf16_path(qkv):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
    seed = jnp.array([5], jnp.int32)
    out, mask = flash_causal_dropout_attention(
        q, k, v, SM, 0.5, seed=seed, collect_mask=True
    )
    ref = dense_ref(q, k, v, SM, mask=mask, p=0.5)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 0.05, err  # bf16 fwd tolerance


def test_seed_from_rng():
    s1 = seed_from_rng(jax.random.PRNGKey(0))
    s2 = seed_from_rng(jax.random.fold_in(jax.random.PRNGKey(0), 3))
    assert s1.shape == (1,) and s1.dtype == jnp.int32
    assert int(s1[0]) != int(s2[0])
