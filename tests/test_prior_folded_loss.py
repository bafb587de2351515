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


class TestCrossEntropyOracle:
    """Custom-VJP cross_entropy (models/prior_utils.py) vs the
    log_softmax + take_along_axis oracle: value and gradient, fp32 and
    bf16 logits, plain and mixup paths, plus weighted upstream
    cotangents (VERDICT r4 #3)."""

    @staticmethod
    def _oracle(logits, targets):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(
            lp, targets[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_value_and_grad_match_oracle(self, dtype):
        from vqvae3d_tpu.models.prior_utils import cross_entropy

        rng = np.random.default_rng(3)
        logits = jnp.asarray(
            rng.normal(scale=4.0, size=(2, 3, 4, 5, 17)), dtype
        )
        targets = jnp.asarray(rng.integers(0, 17, size=(2, 3, 4, 5)), jnp.int32)
        # non-uniform upstream cotangent (the train path weights by
        # depth-valid masks) so the VJP is exercised beyond mean().
        w = jnp.asarray(rng.uniform(0.1, 2.0, size=targets.shape), jnp.float32)

        got = cross_entropy(logits, targets)
        want = self._oracle(logits, targets)
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol,
        )

        def f_fused(l):
            return jnp.sum(cross_entropy(l, targets) * w)

        def f_oracle(l):
            return jnp.sum(self._oracle(l, targets) * w)

        g_fused = jax.grad(f_fused)(logits)
        g_oracle = jax.grad(f_oracle)(logits)
        gtol = 1e-5 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(
            np.asarray(g_fused, np.float32),
            np.asarray(g_oracle, np.float32),
            rtol=gtol, atol=gtol,
        )

    def test_narrow_int_targets(self):
        """int8 targets with input_dim > 127 must not wrap (ADVICE r4)."""
        from vqvae3d_tpu.models.prior_utils import cross_entropy

        rng = np.random.default_rng(4)
        logits = jnp.asarray(rng.normal(size=(3, 200)), jnp.float32)
        t32 = jnp.asarray(rng.integers(0, 127, size=(3,)), jnp.int32)
        t8 = t32.astype(jnp.int8)
        np.testing.assert_allclose(
            cross_entropy(logits, t8), cross_entropy(logits, t32), rtol=1e-6
        )

    def test_mixup_criterion_matches_oracle(self):
        from vqvae3d_tpu.models.prior_utils import mixup_cross_entropy

        rng = np.random.default_rng(5)
        logits = jnp.asarray(rng.normal(size=(4, 6, 9)), jnp.float32)
        y_a = jnp.asarray(rng.integers(0, 9, size=(4, 6)), jnp.int32)
        y_b = jnp.asarray(rng.integers(0, 9, size=(4, 6)), jnp.int32)
        lam = jnp.float32(0.3)

        def f(l):
            return jnp.mean(mixup_cross_entropy(l, (y_a, y_b), lam))

        def f_oracle(l):
            return jnp.mean(
                lam * self._oracle(l, y_a) + (1 - lam) * self._oracle(l, y_b)
            )

        np.testing.assert_allclose(f(logits), f_oracle(logits), rtol=1e-6)
        np.testing.assert_allclose(
            jax.grad(f)(logits), jax.grad(f_oracle)(logits),
            rtol=1e-5, atol=1e-6,
        )
