import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig, embed_code

KEY = jax.random.PRNGKey(0)

SMALL = VQVAEConfig(
    n_bottleneck_blocks=2,
    num_embeddings=(16, 32),
    dtype=jnp.float32,
    remat=False,
)


def test_config_schedules():
    cfg = VQVAEConfig(num_embeddings=(128, 256, 512))
    assert cfg.level_channels == [16, 64, 256]
    assert cfg.embedding_dims == [2, 8, 32]
    assert cfg.downscale_factor == 4
    assert cfg.code_grid_shapes((512, 512, 128)) == [
        (128, 128, 32),
        (32, 32, 8),
        (8, 8, 2),
    ]
    # reference full config: 50/50 blocks, 3 up, 2 down
    full = VQVAEConfig(
        num_embeddings=(128, 256, 512),
        n_pre_quantization_blocks=50,
        n_post_quantization_blocks=50,
        n_post_upscale_blocks=3,
        n_post_downscale_blocks=2,
    )
    assert full.num_layers == 2 + 12 + 50 + 50 + 12 + 18 + 1

    single = VQVAEConfig(num_embeddings=(64,))
    assert single.num_embeddings == (64, 64, 64)


@pytest.fixture(scope="module")
def vqvae_small():
    model = VQVAE(SMALL)
    x = jnp.zeros((1, 32, 32, 16, 1))
    variables = model.init(KEY, x, train=False)
    return model, variables


def test_vqvae_forward_shapes(vqvae_small):
    model, variables = vqvae_small
    x = jax.random.normal(KEY, (1, 32, 32, 16, 1))
    decoded, (losses, quants, indices) = model.apply(variables, x, train=False)
    assert decoded.shape == x.shape
    assert len(losses) == len(quants) == len(indices) == 2
    # fine -> coarse
    assert quants[0].shape == (1, 8, 8, 4, 2)
    assert quants[1].shape == (1, 2, 2, 1, 8)
    assert indices[0].shape == (1, 8, 8, 4)
    assert indices[1].shape == (1, 2, 2, 1)


def test_vqvae_decode_matches_forward(vqvae_small):
    model, variables = vqvae_small
    x = jax.random.normal(KEY, (1, 32, 32, 16, 1))
    decoded, (_, quants, indices) = model.apply(variables, x, train=False)

    # decode from codebook lookups of the indices == decode from quantizations
    embs = [
        embed_code(variables, level, indices[level]) for level in range(2)
    ]
    for e, q in zip(embs, quants):
        np.testing.assert_allclose(np.asarray(e), np.asarray(q), atol=1e-6)

    decoded2 = model.apply(variables, embs, train=False, method=VQVAE.decode)
    np.testing.assert_allclose(np.asarray(decoded2), np.asarray(decoded), atol=1e-5)


def test_vqvae_train_mode_mutates_quantizer(vqvae_small):
    model, variables = vqvae_small
    x = jax.random.normal(KEY, (2, 32, 32, 16, 1))
    (decoded, aux), mutated = model.apply(
        variables, x, train=True, mutable=["quantizer"]
    )
    q_state = mutated["quantizer"]["encoder"]
    assert bool(q_state["quantize_0"]["initialized"])
    assert bool(q_state["quantize_1"]["initialized"])


def test_vqvae_grads_flow(vqvae_small):
    model, variables = vqvae_small
    params = variables["params"]
    x = jax.random.normal(KEY, (1, 32, 32, 16, 1))

    def loss_fn(params):
        decoded, (losses, *_ ) = model.apply(
            {**variables, "params": params}, x, train=False
        )
        return jnp.mean((decoded - x) ** 2) + sum(losses)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(g).all() for g in leaves)
    # encoder input conv must receive gradient through the straight-through path
    g_in = grads["encoder"]["parse_input"]["kernel"]
    assert float(jnp.abs(g_in).sum()) > 0
