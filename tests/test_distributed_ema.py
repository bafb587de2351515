"""Distributed quantizer-EMA equivalence.

The reference hand-all_reduces cluster counts/dw across DDP ranks
(vqvae/layers.py:645-647) so every rank sees GLOBAL statistics. Our claim:
under GSPMD with the batch sharded on the 'data' axis, the quantizer's
batch reductions are global automatically. Verify: a train step on an
8-device sharded batch must produce bit-comparable EMA state and loss to the
same step on one device.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
from vqvae3d_tpu.parallel.mesh import make_mesh
from vqvae3d_tpu.train.state import create_vqvae_train_state
from vqvae3d_tpu.train.vqvae_train import make_train_step

KEY = jax.random.PRNGKey(0)


def test_sharded_ema_matches_single_device():
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        dtype=jnp.float32,
        remat=False,
        base_lr=1e-3,
    )
    model = VQVAE(cfg)
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))

    vol = jax.random.uniform(
        jax.random.PRNGKey(3), (8, 32, 32, 16, 1), minval=-0.5, maxval=4.0
    )
    batch = {
        "volume": vol,
        "num_valid_slices": jnp.full((8,), 16, jnp.int32),
    }

    # single-device (no mesh)
    step1 = make_train_step(model, donate=False)
    s1, log1 = step1(state, batch)

    # 8-way data-sharded
    mesh = make_mesh((8,), ("data",))
    step8 = make_train_step(model, mesh=mesh, donate=False)
    with mesh:
        s8, log8 = step8(state, batch)

    np.testing.assert_allclose(float(log1["loss"]), float(log8["loss"]), rtol=1e-5)
    for lvl in range(2):
        q1 = s1.quantizer["encoder"][f"quantize_{lvl}"]
        q8 = s8.quantizer["encoder"][f"quantize_{lvl}"]
        np.testing.assert_allclose(
            np.asarray(q1["cluster_size"]), np.asarray(q8["cluster_size"]),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(q1["embed"]), np.asarray(q8["embed"]), rtol=1e-3, atol=1e-5
        )
    # and the gradient update itself
    np.testing.assert_allclose(
        np.asarray(s1.params["encoder"]["parse_input"]["kernel"]),
        np.asarray(s8.params["encoder"]["parse_input"]["kernel"]),
        rtol=1e-4, atol=1e-7,
    )


def test_sharded_pallas_kernel_matches_single_device():
    """Round-2 (VERDICT #2): the PALLAS argmin+stats kernel (interpret mode
    on CPU) under a ('data', 'space')-sharded batch, shard_mapped with
    psum'd EMA stats, matches the single-device step."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        dtype=jnp.float32,
        remat=False,
        base_lr=1e-3,
        argmin_method="pallas",
    )
    model = VQVAE(cfg)
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))

    vol = jax.random.uniform(
        jax.random.PRNGKey(3), (4, 32, 32, 16, 1), minval=-0.5, maxval=4.0
    )
    batch = {
        "volume": vol,
        "num_valid_slices": jnp.full((4,), 16, jnp.int32),
    }

    step1 = make_train_step(model, donate=False)
    s1, log1 = step1(state, batch)

    mesh = make_mesh((4, 2), ("data", "space"))
    step8 = make_train_step(model, mesh=mesh, donate=False)
    with mesh:
        s8, log8 = step8(state, batch)

    np.testing.assert_allclose(float(log1["loss"]), float(log8["loss"]), rtol=1e-5)
    for lvl in range(2):
        q1 = s1.quantizer["encoder"][f"quantize_{lvl}"]
        q8 = s8.quantizer["encoder"][f"quantize_{lvl}"]
        # counts are integers in fp32: exact equality across shardings
        np.testing.assert_array_equal(
            np.asarray(q1["cluster_size"]), np.asarray(q8["cluster_size"])
        )
        np.testing.assert_allclose(
            np.asarray(q1["embed"]), np.asarray(q8["embed"]), rtol=1e-4, atol=1e-6
        )
