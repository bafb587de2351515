import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
from vqvae3d_tpu.ops.resize import depth_to_space, space_to_depth
from vqvae3d_tpu.train.state import create_vqvae_train_state
from vqvae3d_tpu.train.vqvae_train import make_train_step

KEY = jax.random.PRNGKey(0)


def test_space_to_depth_roundtrip():
    x = jax.random.normal(KEY, (2, 8, 8, 4, 3))
    packed = space_to_depth(x, 2)
    assert packed.shape == (2, 4, 4, 2, 24)
    np.testing.assert_array_equal(np.asarray(depth_to_space(packed, 2)), np.asarray(x))
    # identity at factor 1
    assert space_to_depth(x, 1) is x


def test_space_to_depth_block_semantics():
    """Channel c of the packed tensor = voxel (dh, dw, dd) of each block."""
    x = jnp.arange(4 * 4 * 2).reshape(1, 4, 4, 2, 1).astype(jnp.float32)
    p = space_to_depth(x, 2)
    # block (0,0,0): voxels (h,w,d) in {0,1}² × {0,1}
    block = np.asarray(x[0, :2, :2, :2, 0]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 0]), block)


def test_stem_config_schedules():
    """stem=2 with base 8 reproduces the reference full model's code grids,
    channels, and embedding dims."""
    ref = VQVAEConfig(num_embeddings=(128, 256, 512))
    stem = VQVAEConfig(
        num_embeddings=(128, 256, 512),
        base_network_channels=8,
        stem_space_to_depth=2,
    )
    assert stem.level_channels == ref.level_channels == [16, 64, 256]
    assert stem.embedding_dims == ref.embedding_dims == [2, 8, 32]
    assert stem.level_n_down(0) == 1 and stem.level_n_down(1) == 2
    assert stem.code_grid_shapes((512, 512, 128)) == ref.code_grid_shapes(
        (512, 512, 128)
    )


def test_stem_vqvae_forward_and_train():
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        base_network_channels=8,
        stem_space_to_depth=2,
        dtype=jnp.float32,
        remat=False,
        base_lr=1e-3,
    )
    model = VQVAE(cfg)
    x = jax.random.normal(KEY, (1, 32, 32, 16, 1))
    variables = model.init(KEY, x, train=False)
    decoded, (losses, quants, indices) = model.apply(variables, x, train=False)
    assert decoded.shape == x.shape
    # same code-grid shapes as a stem-less model
    assert indices[0].shape == (1, 8, 8, 4)
    assert indices[1].shape == (1, 2, 2, 1)

    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    step = make_train_step(model, donate=False)
    batch = {
        "volume": x,
        "num_valid_slices": jnp.array([16], jnp.int32),
    }
    state1, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))


def test_stem_rejects_invalid_factor():
    with pytest.raises(AssertionError):
        VQVAEConfig(stem_space_to_depth=3)
    with pytest.raises(AssertionError):
        VQVAEConfig(stem_space_to_depth=8, n_blocks_per_bottleneck=2)


def test_folded_io_eval_equivalence():
    """apply(fold(x), folded_io=True) == fold(apply(x)) for the eval
    forward — the contract bench.py's folded-IO mode (BENCH_FOLDED_IO)
    relies on: folding is a host-side permutation, not a model change."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        base_network_channels=8,
        stem_space_to_depth=2,
        dtype=jnp.float32,
        remat=False,
    )
    model = VQVAE(cfg)
    x = jax.random.normal(KEY, (1, 32, 32, 16, 1))
    variables = model.init(KEY, x, train=False)

    decoded, (losses, _, indices) = model.apply(variables, x, train=False)
    decoded_f, (losses_f, _, indices_f) = model.apply(
        variables, space_to_depth(x, 2), train=False, folded_io=True
    )
    assert decoded_f.shape == space_to_depth(x, 2).shape
    np.testing.assert_allclose(
        np.asarray(depth_to_space(decoded_f, 2)), np.asarray(decoded),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(indices, indices_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(losses, losses_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("metric", ["huber", "mixture-nll"])
def test_folded_loss_matches_unfolded(metric):
    """The block-space (folded) train loss is exact: same loss, logs, and
    gradients as the full-res formulation (the sums merely reassociate)."""
    from vqvae3d_tpu.train.vqvae_train import vqvae_loss_fn

    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        base_network_channels=8,
        stem_space_to_depth=2,
        dtype=jnp.float32,
        remat=False,
        metric=metric,
        n_mix=2 if metric == "mixture-nll" else 0,
    )
    model = VQVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 16, 1))
    variables = model.init(KEY, x, train=False)
    params, quant = variables["params"], variables["quantizer"]
    batch = {
        "volume": x,
        "num_valid_slices": jnp.array([16, 11], jnp.int32),
    }

    def run(folded):
        def loss_of(p):
            loss, (new_q, log, _) = vqvae_loss_fn(
                model, p, quant, batch, train=True, folded=folded
            )
            return loss, (new_q, log)

        (loss, (new_q, log)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params)
        return loss, new_q, log, grads

    l0, q0, log0, g0 = run(False)
    l1, q1, log1, g1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    assert set(log0) == set(log1)
    for k in log0:
        np.testing.assert_allclose(log1[k], log0[k], rtol=2e-4, atol=1e-6, err_msg=k)
    for (a, b) in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=1e-6)
    for (a, b) in zip(jax.tree.leaves(q0), jax.tree.leaves(q1)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)


def test_literal_fold_serving_equivalence():
    """LITERAL stem (stem_space_to_depth=1) folded serving:
    apply(s2d(x,2), folded_io=True) == s2d(apply(x), 2) — the exact
    weight-space fold of the level-0 front/back-end that restores full-res
    (512³×128) serving of converted reference checkpoints on one chip
    (VERDICT r4 #1). Same parameter tree; code indices identical."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        base_network_channels=4,
        stem_space_to_depth=1,
        n_pre_quantization_blocks=1,
        n_post_quantization_blocks=1,
        n_post_upscale_blocks=2,
        n_post_downscale_blocks=1,
        dtype=jnp.float32,
        remat=False,
        pad_mode="wrap",
    )
    model = VQVAE(cfg)
    x = jax.random.normal(KEY, (2, 32, 32, 16, 1))
    variables = model.init(KEY, x, train=False)

    decoded, (losses, _, indices) = model.apply(variables, x, train=False)
    decoded_f, (losses_f, _, indices_f) = model.apply(
        variables, space_to_depth(x, 2), train=False, folded_io=True
    )
    assert decoded_f.shape == space_to_depth(x, 2).shape
    np.testing.assert_allclose(
        np.asarray(depth_to_space(decoded_f, 2)), np.asarray(decoded),
        rtol=2e-5, atol=2e-5,
    )
    for a, b in zip(indices, indices_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(losses, losses_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_literal_fold_serving_equivalence_zeros_pad():
    """Same contract under pad_mode='zeros' (the folded k4s2p1/k3 kernels
    must reproduce both padding modes exactly)."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=1,
        num_embeddings=(8,),
        base_network_channels=4,
        stem_space_to_depth=1,
        n_post_upscale_blocks=1,
        dtype=jnp.float32,
        remat=False,
        pad_mode="zeros",
    )
    model = VQVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 8, 1))
    variables = model.init(KEY, x, train=False)
    decoded, (_, _, indices) = model.apply(variables, x, train=False)
    decoded_f, (_, _, indices_f) = model.apply(
        variables, space_to_depth(x, 2), train=False, folded_io=True
    )
    np.testing.assert_allclose(
        np.asarray(depth_to_space(decoded_f, 2)), np.asarray(decoded),
        rtol=2e-5, atol=2e-5,
    )
    for a, b in zip(indices, indices_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
