"""The cached incremental sampler must reproduce the naive fixed-shape
sampler exactly (same rng → same grids), with and without conditioning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.sample.ar_sample import ancestral_sample
from vqvae3d_tpu.sample.cached_sample import cached_ancestral_sample
from vqvae3d_tpu.train.prior_train import create_prior_train_state

KEY = jax.random.PRNGKey(0)
DIMS = (3, 4, 3)


def _randomized_params(model, batch, key):
    state = create_prior_train_state(model, KEY, batch)
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, l.shape, l.dtype) * 0.2 for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


@pytest.mark.parametrize("with_cond", [False, True])
@pytest.mark.parametrize("kernel_size", [3, 5])
def test_cached_matches_naive(with_cond, kernel_size):
    cfg = PixelCNNConfig(
        input_dim=5,
        condition_dim=4 if with_cond else 0,
        model_dim=8,
        kernel_size=kernel_size,
        num_resblocks=2,
        dropout_prob=0.0,
        bottleneck_divisor=2,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    rng = jax.random.PRNGKey(7)
    batch = {"data": np.zeros((2, *DIMS), np.int32)}
    cond = None
    if with_cond:
        batch["condition"] = np.zeros((2, 2, 2, 1), np.int32)
        cond = jnp.asarray(
            np.random.default_rng(0).integers(0, 4, (2, 2, 2, 1)), jnp.int32
        )
    params = _randomized_params(model, batch, jax.random.PRNGKey(1))

    naive = ancestral_sample(model, params, rng, DIMS, 2, cond, tau=1.0)
    cached = cached_ancestral_sample(model, params, rng, DIMS, 2, cond, tau=1.0)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(cached))


def test_cached_matches_naive_deeper():
    """More layers + bigger grid to stress the caches."""
    cfg = PixelCNNConfig(
        input_dim=6, condition_dim=0, model_dim=12, kernel_size=3,
        num_resblocks=4, dropout_prob=0.0, bottleneck_divisor=4,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = {"data": np.zeros((1, 4, 4, 4), np.int32)}
    params = _randomized_params(model, batch, jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(11)

    naive = ancestral_sample(model, params, rng, (4, 4, 4), 1, None, tau=0.7)
    cached = cached_ancestral_sample(model, params, rng, (4, 4, 4), 1, None, tau=0.7)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(cached))


def test_incremental_depth_matches_full_recompute(monkeypatch):
    """The r4 incremental depth tower (per-layer causal-tap caches,
    VQVAE3D_CNN_INC=1, default) samples the same grids as the full-grid
    recompute fallback (VQVAE3D_CNN_INC=0)."""
    cfg = PixelCNNConfig(
        input_dim=5, condition_dim=4, model_dim=8, kernel_size=3,
        num_resblocks=2, dropout_prob=0.0, bottleneck_divisor=2,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = {
        "data": np.zeros((2, *DIMS), np.int32),
        "condition": np.zeros((2, 2, 2, 1), np.int32),
    }
    cond = jnp.asarray(
        np.random.default_rng(3).integers(0, 4, (2, 2, 2, 1)), jnp.int32
    )
    params = _randomized_params(model, batch, jax.random.PRNGKey(4))
    rng = jax.random.PRNGKey(21)

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("VQVAE3D_CNN_INC", mode)
        outs[mode] = np.asarray(
            cached_ancestral_sample(model, params, rng, DIMS, 2, cond, tau=0.8)
        )
    np.testing.assert_array_equal(outs["1"], outs["0"])


@pytest.mark.parametrize("chunk", ["1", "2"])
def test_host_sliced_matches_fori(monkeypatch, chunk):
    """make_cached_sampler(host_slices=True) — one execution per slice
    CHUNK of slices (r5: VQVAE3D_SLICES_PER_EXEC) — must produce the SAME
    grids as the single-execution fori_loop driver (same rng): the host
    loop is the identical slice_body chained by its carry."""
    from vqvae3d_tpu.sample.cached_sample import make_cached_sampler

    monkeypatch.setenv("VQVAE3D_SLICES_PER_EXEC", chunk)

    cfg = PixelCNNConfig(
        input_dim=5, condition_dim=4, model_dim=8, kernel_size=3,
        num_resblocks=2, dropout_prob=0.0, bottleneck_divisor=2,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = {
        "data": np.zeros((2, *DIMS), np.int32),
        "condition": np.zeros((2, 2, 2, 1), np.int32),
    }
    cond = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, (2, 2, 2, 1)), jnp.int32
    )
    params = _randomized_params(model, batch, jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(9)

    ref = cached_ancestral_sample(model, params, rng, DIMS, 2, cond, tau=0.7)
    hs = make_cached_sampler(model, DIMS, 2, tau=0.7, host_slices=True)
    got = hs(params, rng, cond)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("with_cond", [False, True])
def test_row_kernel_matches_xla(with_cond):
    """The Pallas row-decode kernel (interpret mode on CPU) must produce
    the SAME grids as the XLA voxel loop for the same rng: the Gumbel
    table replicates jax.random.categorical's own per-voxel draws."""
    cfg = PixelCNNConfig(
        input_dim=5,
        condition_dim=4 if with_cond else 0,
        model_dim=8,
        kernel_size=3,
        num_resblocks=2,
        dropout_prob=0.0,
        bottleneck_divisor=2,
        dtype=jnp.float32,
    )
    model = PixelCNN(cfg)
    batch = {"data": np.zeros((2, *DIMS), np.int32)}
    cond = None
    if with_cond:
        batch["condition"] = np.zeros((2, 2, 2, 1), np.int32)
        cond = jnp.asarray(
            np.random.default_rng(3).integers(0, 4, (2, 2, 2, 1)), jnp.int32
        )
    params = _randomized_params(model, batch, jax.random.PRNGKey(6))
    rng = jax.random.PRNGKey(13)

    ref = cached_ancestral_sample(model, params, rng, DIMS, 2, cond, tau=0.7)
    got = cached_ancestral_sample(
        model, params, rng, DIMS, 2, cond, tau=0.7, row_kernel="interpret"
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
