"""Chunked online-softmax causal attention (VERDICT r1 #7).

Parity vs the dense path at dropout=0, causality, dropout semantics
(reference pixel_model/layers.py:636-639: kept logits ×1/(1-p), dropped
→ −1e3, applied before the causal mask), and trainability (reverse-mode
grads through the scan/fori machinery).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.ops.chunked_attention import causal_attention_chunked


def _dense_oracle(q, k, v, sm_scale, dropout_p=0.0, rng=None, keep=None):
    """The dense path of models/causal_blocks.CausalAttention._attend."""
    b, nh, s, dh = q.shape
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32) * sm_scale,
        k.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST,
    )
    if dropout_p > 0.0:
        if keep is None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout_p, logits.shape)
        logits = jnp.where(keep, logits / (1.0 - dropout_p), -1e3)
    mask = jnp.tril(jnp.ones((s, s), jnp.bool_))
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w, v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(v.dtype)


def _rand_qkv(s, b=2, nh=2, dh=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, nh, s, dh)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("s", [64, 300, 1024])
def test_matches_dense_no_dropout(s):
    q, k, v = _rand_qkv(s)
    want = _dense_oracle(q, k, v, 0.25)
    got = causal_attention_chunked(q, k, v, 0.25, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_causality():
    """Changing future positions never changes earlier outputs."""
    s = 200
    q, k, v = _rand_qkv(s, seed=1)
    out1 = causal_attention_chunked(q, k, v, 0.3, block_q=64, block_k=64)
    k2 = k.at[:, :, 150:].set(99.0)
    v2 = v.at[:, :, 150:].set(-99.0)
    out2 = causal_attention_chunked(q, k2, v2, 0.3, block_q=64, block_k=64)
    np.testing.assert_array_equal(
        np.asarray(out1[:, :, :150]), np.asarray(out2[:, :, :150])
    )


def test_dropout_deterministic_and_effective():
    s = 256
    q, k, v = _rand_qkv(s, seed=2)
    rng = jax.random.PRNGKey(3)
    a = causal_attention_chunked(q, k, v, 0.2, 0.5, rng, block_q=64, block_k=64)
    b = causal_attention_chunked(q, k, v, 0.2, 0.5, rng, block_q=64, block_k=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = causal_attention_chunked(
        q, k, v, 0.2, 0.5, jax.random.PRNGKey(4), block_q=64, block_k=64
    )
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3
    clean = causal_attention_chunked(q, k, v, 0.2, block_q=64, block_k=64)
    assert np.abs(np.asarray(a) - np.asarray(clean)).max() > 1e-3


def test_gradients_flow():
    """Reverse-mode AD through the scan + static fori_loop (+ dropout)."""
    s = 128
    q, k, v = _rand_qkv(s, b=1, seed=5)

    def loss(q, k, v, p, rng):
        out = causal_attention_chunked(
            q, k, v, 0.3, p, rng, block_q=64, block_k=64
        )
        return jnp.sum(out**2)

    for p, rng in [(0.0, None), (0.5, jax.random.PRNGKey(0))]:
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, p, rng)
        for g in (gq, gk, gv):
            assert np.isfinite(np.asarray(g)).all()
            assert np.abs(np.asarray(g)).max() > 0

    # grads match dense autodiff at dropout=0
    def loss_dense(q, k, v):
        return jnp.sum(_dense_oracle(q, k, v, 0.3) ** 2)

    gq1, gk1, gv1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, 0.0, None)
    gq2, gk2, gv2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g1, g2 in [(gq1, gq2), (gk1, gk2), (gv1, gv2)]:
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4
        )


def test_module_integration():
    """CausalAttention(use_chunked='always') ≡ dense at dropout=0 through
    the flax module, stack streams included."""
    from vqvae3d_tpu.models.causal_blocks import CausalAttention

    rng = np.random.default_rng(6)
    shape = (2, 4, 4, 4, 16)
    mk = lambda: tuple(
        jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(3)
    )
    keys, queries, values = mk(), mk(), mk()

    dense = CausalAttention(
        num_heads=4, dropout_prob=0.0, use_flash="never", use_chunked="never"
    )
    chunk = CausalAttention(
        num_heads=4, dropout_prob=0.0, use_flash="never", use_chunked="always"
    )
    vars_ = dense.init(jax.random.PRNGKey(0), keys, queries, values)
    out_d = dense.apply(vars_, keys, queries, values)
    out_c = chunk.apply(vars_, keys, queries, values)
    for a, b in zip(out_d, out_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_pixelsnail_long_seq_train_step_with_dropout():
    """VERDICT r1 #7 'done': a PixelSNAIL train step at S = 32·16·8 = 4096
    (> _DENSE_MAX_SEQ, so the chunked path is auto-selected) with logit
    dropout 0.5. The published mid level is S=8192 — same code path, kept
    at 4096 here to bound CPU suite time; the real size is exercised on
    TPU via the train CLI."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
    from vqvae3d_tpu.train.prior_train import (
        create_prior_train_state,
        make_prior_train_step,
    )

    cfg = PixelSNAILConfig(
        input_dim=16,
        condition_dim=0,
        model_dim=8,
        kernel_size=3,
        num_layers_per_block=1,
        num_blocks=1,
        causal_dropout_prob=0.5,
        attention_dropout_prob=0.5,
        bottleneck_divisor=2,
        num_heads=2,
        dtype=jnp.float32,
    )
    model = PixelSNAIL(cfg)
    rng = np.random.default_rng(0)
    batch = {"data": rng.integers(0, 16, (1, 32, 16, 8)).astype(np.int32)}
    state = create_prior_train_state(model, jax.random.PRNGKey(0), batch)
    train_step = make_prior_train_step(model)
    state, log = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(log["loss_mean"]))
