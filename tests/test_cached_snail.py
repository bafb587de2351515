"""KV-cached PixelSNAIL sampler exactness (VERDICT r1 #3).

Two checks: (a) forced-teacher mode reproduces the model's one-shot forward
logits voxel-for-voxel, (b) free-running sampling equals the naive
fixed-shape sampler under the same rng.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
from vqvae3d_tpu.sample.ar_sample import ancestral_sample
from vqvae3d_tpu.sample.cached_snail import cached_snail_sample
from vqvae3d_tpu.train.prior_train import create_prior_train_state

KEY = jax.random.PRNGKey(0)
DIMS = (3, 2, 3)


def _randomized_params(model, batch, key):
    state = create_prior_train_state(model, KEY, batch)
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, l.shape, l.dtype) * 0.2 for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def _make(with_cond=False, kernel_size=3):
    cfg = PixelSNAILConfig(
        input_dim=5,
        condition_dim=4 if with_cond else 0,
        model_dim=8,
        kernel_size=kernel_size,
        num_layers_per_block=2,
        num_blocks=2,
        causal_dropout_prob=0.0,
        attention_dropout_prob=0.0,
        bottleneck_divisor=2,
        num_heads=2,
        dtype=jnp.float32,
    )
    model = PixelSNAIL(cfg)
    batch = {"data": np.zeros((2, *DIMS), np.int32)}
    cond = None
    if with_cond:
        batch["condition"] = np.zeros((2, 2, 1, 2), np.int32)
        cond = jnp.asarray(
            np.random.default_rng(0).integers(0, 4, (2, 2, 1, 2)), jnp.int32
        )
    params = _randomized_params(model, batch, jax.random.PRNGKey(1))
    return model, params, cond


@pytest.mark.parametrize("with_cond", [False, True])
def test_forced_logits_match_forward(with_cond):
    from vqvae3d_tpu.models.prior_utils import idx_to_one_hot
    from vqvae3d_tpu.ops.resize import trilinear_resize

    model, params, cond = _make(with_cond)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 5, (2, *DIMS)), jnp.int32)

    got = cached_snail_sample(
        model, params, jax.random.PRNGKey(0), DIMS, 2,
        condition_idx=cond, forced_x=x,
    )

    data_oh = jax.nn.one_hot(x, 5, dtype=jnp.float32)
    cond_in = None
    if with_cond:
        cond_oh = idx_to_one_hot(cond, 4)
        cond_in = trilinear_resize(cond_oh, DIMS).astype(jnp.float32)
    want = model.apply({"params": params}, data_oh, cond_in, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_cached_snail_matches_naive_sampling():
    model, params, _ = _make(False)
    rng = jax.random.PRNGKey(7)
    naive = ancestral_sample(model, params, rng, DIMS, 2, None, tau=1.0)
    cached = cached_snail_sample(model, params, rng, DIMS, 2, None, tau=1.0)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(cached))


def test_incremental_matches_full_recompute(monkeypatch):
    """The r3/r4 incremental depth+height phases (per-layer causal-tap
    caches + append-only attention K/V, VQVAE3D_SNAIL_INC=1, default)
    produce the same forced-teacher logits and the same free-running
    samples as the full-recompute fallback (VQVAE3D_SNAIL_INC=0)."""
    model, params, _ = _make(False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 5, (2, *DIMS)), jnp.int32)
    key = jax.random.PRNGKey(13)

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("VQVAE3D_SNAIL_INC", mode)
        logits = cached_snail_sample(
            model, params, key, DIMS, 2, forced_x=x
        )
        sampled = cached_snail_sample(model, params, key, DIMS, 2, tau=0.9)
        outs[mode] = (np.asarray(logits), np.asarray(sampled))

    np.testing.assert_allclose(
        outs["1"][0], outs["0"][0], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(outs["1"][1], outs["0"][1])


@pytest.mark.parametrize("chunk", ["1", "3"])
def test_host_sliced_matches_fori(monkeypatch, chunk):
    """Host-sliced snail sampler (one execution per slice chunk, r5
    VQVAE3D_SNAIL_SLICES_PER_EXEC) equals the fori_loop driver for the
    same rng."""
    from vqvae3d_tpu.sample.cached_snail import (
        cached_snail_sample,
        make_cached_snail_sampler,
    )

    monkeypatch.setenv("VQVAE3D_SNAIL_SLICES_PER_EXEC", chunk)

    cfg = PixelSNAILConfig(
        input_dim=6, condition_dim=0, model_dim=8, kernel_size=3,
        num_layers_per_block=1, num_blocks=2, causal_dropout_prob=0.0,
        attention_dropout_prob=0.0, num_heads=2, bottleneck_divisor=2,
        dtype=jnp.float32,
    )
    model = PixelSNAIL(cfg)
    batch = {"data": np.zeros((2, 3, 4, 3), np.int32)}
    params = _randomized_params(model, batch, jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(11)
    dims = (3, 4, 3)

    ref = cached_snail_sample(model, params, rng, dims, 2, None, tau=0.7)
    hs = make_cached_snail_sampler(model, dims, 2, tau=0.7, host_slices=True)
    got = hs(params, rng)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
