import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
from vqvae3d_tpu.models.prior_utils import (
    bits_per_dim,
    generate_background,
    mixup_data,
    sattolo_cycle,
)
from vqvae3d_tpu.parallel.mesh import make_mesh
from vqvae3d_tpu.sample.ar_sample import ancestral_sample, make_ancestral_sampler
from vqvae3d_tpu.train.prior_train import (
    create_prior_train_state,
    make_prior_eval_step,
    make_prior_train_step,
    prior_loss_fn,
)

KEY = jax.random.PRNGKey(0)
DIMS = (4, 4, 2)


def _batch(b=2, k=8, cond_k=6, cond_dims=(2, 2, 1), with_cond=True, seed=3):
    rng = np.random.default_rng(seed)
    batch = {"data": rng.integers(0, k, (b, *DIMS)).astype(np.int32)}
    if with_cond:
        batch["condition"] = rng.integers(0, cond_k, (b, *cond_dims)).astype(np.int32)
    return batch


def test_sattolo_cycle_is_derangement():
    for b in (2, 5, 16):
        perm = np.asarray(sattolo_cycle(jax.random.PRNGKey(b), b))
        assert sorted(perm.tolist()) == list(range(b))
        assert not np.any(perm == np.arange(b)), perm


def test_mixup_data():
    x = jnp.eye(4)[:, None, :]  # (4, 1, 4)
    y = jnp.arange(4)
    mx, mc, (ya, yb), lam = mixup_data(KEY, x, y, alpha=0.4, condition=x)
    assert mx.shape == x.shape and mc.shape == x.shape
    assert float(lam) >= 0 and float(lam) <= 1
    np.testing.assert_array_equal(np.asarray(ya), np.arange(4))
    assert not np.array_equal(np.asarray(yb), np.arange(4))


def test_generate_background():
    bg = generate_background(2, (3, 4, 5))
    assert bg.shape == (2, 3, 4, 5, 3)
    assert float(bg[0, 0, 0, 0, 0]) == -1.0 and float(bg[0, -1, 0, 0, 0]) == 1.0
    assert float(bg[0, 0, 0, 0, 1]) == -1.0 and float(bg[0, 0, -1, 0, 1]) == 1.0


@pytest.mark.parametrize("with_cond", [False, True])
def test_pixelcnn_train_eval_steps(with_cond):
    cfg = PixelCNNConfig(
        input_dim=8,
        condition_dim=6 if with_cond else 0,
        model_dim=8,
        num_resblocks=1,
        dropout_prob=0.5,
        mixup_alpha=0.4 if with_cond else 0.0,
        dtype=jnp.float32,
        lr=1e-3,
    )
    model = PixelCNN(cfg)
    batch = _batch(with_cond=with_cond)
    state = create_prior_train_state(model, KEY, batch)
    step = make_prior_train_step(model, donate=False)
    state1, log = step(state, batch, KEY)
    assert np.isfinite(float(log["loss_mean"]))
    assert float(log["bits_per_dim"]) == pytest.approx(
        float(log["loss_mean"]) / np.log(2), rel=1e-5
    )
    p0 = state.params["parse_input"]["kernel"]
    p1 = state1.params["parse_input"]["kernel"]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    ev = make_prior_eval_step(model)
    elog = ev(state1, batch)
    assert "accuracy" in elog and 0 <= float(elog["accuracy"]) <= 1


def test_pixelsnail_train_step():
    cfg = PixelSNAILConfig(
        input_dim=8,
        condition_dim=6,
        model_dim=8,
        num_layers_per_block=1,
        num_blocks=1,
        num_heads=2,
        dtype=jnp.float32,
        lr=1e-3,
    )
    model = PixelSNAIL(cfg)
    batch = _batch()
    state = create_prior_train_state(model, KEY, batch)
    step = make_prior_train_step(model, donate=False)
    state1, log = step(state, batch, KEY)
    assert np.isfinite(float(log["loss_mean"]))


def test_prior_train_sharded():
    cfg = PixelCNNConfig(
        input_dim=8, condition_dim=0, model_dim=8, num_resblocks=1,
        dropout_prob=0.0, dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = _batch(b=8, with_cond=False)
    state = create_prior_train_state(model, KEY, batch)
    mesh = make_mesh((8,), ("data",))
    step = make_prior_train_step(model, mesh=mesh, donate=False)
    with mesh:
        state1, log = step(state, batch, KEY)
    assert np.isfinite(float(log["loss_mean"]))


def test_prior_loss_decreases():
    """A tiny PixelCNN should overfit a single fixed batch quickly."""
    cfg = PixelCNNConfig(
        input_dim=4, condition_dim=0, model_dim=16, num_resblocks=1,
        dropout_prob=0.0, dtype=jnp.float32, lr=3e-3,
    )
    model = PixelCNN(cfg)
    batch = _batch(b=2, k=4, with_cond=False)
    state = create_prior_train_state(model, KEY, batch)
    step = make_prior_train_step(model, donate=False)
    first = None
    for i in range(30):
        state, log = step(state, batch, KEY)
        if first is None:
            first = float(log["loss_mean"])
    assert float(log["loss_mean"]) < first * 0.9, (first, float(log["loss_mean"]))


@pytest.mark.parametrize("with_cond", [False, True])
def test_ancestral_sampling(with_cond):
    cfg = PixelCNNConfig(
        input_dim=5,
        condition_dim=4 if with_cond else 0,
        model_dim=8,
        num_resblocks=1,
        dropout_prob=0.0,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = _batch(b=2, k=5, cond_k=4, with_cond=with_cond)
    state = create_prior_train_state(model, KEY, batch)

    cond = jnp.asarray(batch["condition"]) if with_cond else None
    sampler = make_ancestral_sampler(model, DIMS, batch_size=2, tau=1.0)
    args = (state.params, KEY) + ((cond,) if with_cond else ())
    out = sampler(*args)
    assert out.shape == (2, *DIMS)
    assert out.dtype == jnp.int32
    assert int(out.min()) >= 0 and int(out.max()) < 5
    # deterministic given the rng
    out2 = sampler(*args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ancestral_sampling_matches_teacher_forcing():
    """Re-running the model on the final sample must reproduce the same
    sequential decisions (consistency of the fixed-shape sampler):
    for each position v, sampling from logits(final_grid)[v] with the same
    per-step rng gives final_grid[v]."""
    cfg = PixelCNNConfig(
        input_dim=5, condition_dim=0, model_dim=8, num_resblocks=1,
        dropout_prob=0.0, dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = _batch(b=1, k=5, with_cond=False)
    state = create_prior_train_state(model, KEY, batch)

    out = ancestral_sample(model, state.params, KEY, DIMS, 1, None, tau=1.0)

    # replay: logits from the completed grid, same rng folding as the loop
    one_hot = jax.nn.one_hot(out, 5, dtype=jnp.float32)
    logits = model.apply({"params": state.params}, one_hot, None, train=False)
    flat = np.asarray(logits.reshape(1, -1, 5))
    rng = KEY
    v_total = int(np.prod(DIMS))
    flat_out = np.asarray(out).reshape(1, -1)
    for v in range(v_total):
        rng, sub = jax.random.split(rng)
        sampled = jax.random.categorical(sub, jnp.asarray(flat[:, v]), axis=-1)
        assert int(sampled[0]) == int(flat_out[0, v]), v
