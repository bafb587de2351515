"""Block-space prior training path: prior_loss_fn with folded logits +
folded targets (and the coarse-condition embed-then-upsample reorder) must
equal the naive full-resolution formulation — loss, every log metric, and
all gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.ops import s2d_conv
from vqvae3d_tpu.train.prior_train import prior_loss_fn


def _setup(scan, cond_dim, mixup=0.0):
    cfg = PixelCNNConfig(
        input_dim=12,
        condition_dim=cond_dim,
        model_dim=8,
        kernel_size=3,
        num_resblocks=2,
        dropout_prob=0.0,
        mixup_alpha=mixup,
        dtype=jnp.float32,
        scan_stacks=scan,
    )
    return PixelCNN(cfg)


def _batch(cond_dim, shape=(2, 4, 4, 8), cond_shape=(2, 2, 2, 4)):
    rng = np.random.default_rng(0)
    batch = {"data": jnp.asarray(rng.integers(0, 12, size=shape), jnp.int32)}
    if cond_dim:
        batch["condition"] = jnp.asarray(
            rng.integers(0, cond_dim, size=cond_shape), jnp.int32
        )
    return batch


@pytest.mark.parametrize("cond_dim", [0, 6])
@pytest.mark.parametrize("train", [False, True])
def test_folded_loss_matches_full(monkeypatch, cond_dim, train):
    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    from vqvae3d_tpu.models.prior_utils import idx_to_one_hot

    batch = _batch(cond_dim)
    scan_model = _setup(True, cond_dim)
    loop_model = _setup(False, cond_dim)
    data = idx_to_one_hot(batch["data"], 12)
    cond = (
        idx_to_one_hot(batch["condition"], cond_dim) if cond_dim else None
    )
    params = scan_model.init(jax.random.PRNGKey(0), data, cond)["params"]

    def run(model):
        def f(p):
            return prior_loss_fn(
                model, p, batch, train=train, rng=jax.random.PRNGKey(1)
            )

        (loss, log), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, log, grads

    l1, log1, g1 = run(scan_model)
    l2, log2, g2 = run(loop_model)
    np.testing.assert_allclose(l1, l2, rtol=2e-5, atol=2e-6)
    assert set(log1) == set(log2)
    for k in log1:
        np.testing.assert_allclose(log1[k], log2[k], rtol=5e-5, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=5e-5)


def test_mixup_folded_runs(monkeypatch):
    monkeypatch.setattr(s2d_conv, "_MIN_VOXELS", 1)
    batch = _batch(0)
    model = _setup(True, 0, mixup=0.4)
    from vqvae3d_tpu.models.prior_utils import idx_to_one_hot

    params = model.init(
        jax.random.PRNGKey(0), idx_to_one_hot(batch["data"], 12), None
    )["params"]
    loss, log = prior_loss_fn(
        model, params, batch, train=True, rng=jax.random.PRNGKey(2)
    )
    assert bool(jnp.isfinite(loss))
