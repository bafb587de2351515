import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
from vqvae3d_tpu.parallel.mesh import make_mesh
from vqvae3d_tpu.train.state import create_vqvae_train_state
from vqvae3d_tpu.train.vqvae_train import (
    depth_valid_mask,
    huber_loss,
    make_eval_step,
    make_train_step,
)

KEY = jax.random.PRNGKey(0)

CFG = VQVAEConfig(
    n_bottleneck_blocks=2,
    num_embeddings=(16, 32),
    dtype=jnp.float32,
    remat=False,
    base_lr=1e-3,
)


def _batch(b=2, h=32, w=32, d=16):
    k1 = jax.random.PRNGKey(7)
    vol = jax.random.uniform(k1, (b, h, w, d, 1), minval=-0.5, maxval=4.0)
    num_valid = jnp.array(([d, d // 2] * ((b + 1) // 2))[:b], jnp.int32)
    # zero the padded slices like DepthPadAndCrop would
    mask = depth_valid_mask(num_valid, d)
    vol = vol * mask
    return {"volume": vol, "num_valid_slices": num_valid}


def test_huber_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(50,)).astype(np.float32) * 2
    y = np.zeros((50,), np.float32)
    got = np.asarray(huber_loss(jnp.asarray(x), jnp.asarray(y)))
    want = F.smooth_l1_loss(torch.tensor(x), torch.tensor(y), reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_depth_valid_mask():
    m = depth_valid_mask(jnp.array([2, 4]), 4)
    assert m.shape == (2, 1, 1, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(m[:, 0, 0, :, 0]), [[1, 1, 0, 0], [1, 1, 1, 1]]
    )


@pytest.fixture(scope="module")
def trained_setup():
    model = VQVAE(CFG)
    batch = _batch()
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    return model, state, batch


def test_train_step_runs_and_learns(trained_setup):
    model, state, batch = trained_setup
    step = make_train_step(model, donate=False)
    state1, log1 = step(state, batch)
    assert np.isfinite(float(log1["loss"]))
    # quantizer got initialized + mutated
    q0 = state1.quantizer["encoder"]["quantize_0"]
    assert bool(q0["initialized"])
    # params changed
    p_old = state.params["encoder"]["parse_input"]["kernel"]
    p_new = state1.params["encoder"]["parse_input"]["kernel"]
    assert not np.allclose(np.asarray(p_old), np.asarray(p_new))

    # a few more steps: loss stays finite, step counter advances
    s = state1
    for _ in range(3):
        s, log = step(s, batch)
    assert int(s.step) == 4
    assert np.isfinite(float(log["loss"]))


def test_eval_step(trained_setup):
    model, state, batch = trained_setup
    ev = make_eval_step(model)
    log = ev(state, batch)
    assert "ssim" in log and np.isfinite(float(log["ssim"]))
    assert "recon_loss_median" in log
    assert np.isfinite(float(log["recon_loss_mean"]))


def test_train_step_bf16():
    """bf16 compute / fp32 params training must differentiate cleanly
    (regression: fp32-preferred conv outputs used to break the conv
    transpose rule under bf16)."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        dtype=jnp.bfloat16,
        remat=True,
        base_lr=1e-3,
    )
    model = VQVAE(cfg)
    batch = _batch(b=1)
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    step = make_train_step(model, donate=False)
    state1, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))
    # params stay fp32
    assert state1.params["encoder"]["parse_input"]["kernel"].dtype == jnp.float32


def test_remat_blocks_equivalence():
    """The outer DownBlock/UpBlock nn.remat wrapper (remat_blocks) must not
    change the math: losses and gradients are identical with and without it
    (remat only trades recompute for saved activations)."""
    from vqvae3d_tpu.train.vqvae_train import vqvae_loss_fn

    batch = _batch(b=1)
    grads = {}
    for rb in (False, True):
        cfg = VQVAEConfig(
            n_bottleneck_blocks=2,
            num_embeddings=(8, 16),
            dtype=jnp.float32,
            remat=True,
            remat_blocks=rb,
        )
        model = VQVAE(cfg)
        state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))

        def loss(params):
            out, _ = vqvae_loss_fn(
                model, params, state.quantizer, batch, train=True
            )
            return out

        val, g = jax.jit(jax.value_and_grad(loss))(state.params)
        grads[rb] = (float(val), g)
    np.testing.assert_allclose(grads[False][0], grads[True][0], rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        grads[False][1],
        grads[True][1],
    )


def test_prefolded_batch_equivalence():
    """Feeding the train step a host-pre-folded volume (CTDataModule
    fold=f) must give the identical loss/grads as the in-jit fold."""
    from vqvae3d_tpu.data.ct_dataset import fold_volume_np
    from vqvae3d_tpu.train.vqvae_train import vqvae_loss_fn

    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(8, 16),
        dtype=jnp.float32,
        remat=False,
        stem_space_to_depth=2,
        base_network_channels=8,
    )
    model = VQVAE(cfg)
    batch = _batch(b=1)
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    pre = {
        "volume": jnp.asarray(fold_volume_np(np.asarray(batch["volume"]), 2)),
        "num_valid_slices": batch["num_valid_slices"],
    }

    def loss(params, b):
        out, (_, log, _) = vqvae_loss_fn(model, params, state.quantizer, b, train=True)
        return out

    v0, g0 = jax.jit(jax.value_and_grad(loss))(state.params, batch)
    v1, g1 = jax.jit(jax.value_and_grad(loss))(state.params, pre)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7), g0, g1
    )


def test_train_step_sharded_8dev(trained_setup):
    """Full train step jitted over an 8-device 'data' mesh (virtual CPU)."""
    model, state, _ = trained_setup
    mesh = make_mesh((8,), ("data",))
    batch = _batch(b=8)
    step = make_train_step(model, mesh=mesh, donate=False)
    with mesh:
        state1, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))
    assert bool(state1.quantizer["encoder"]["quantize_0"]["initialized"])


def test_train_step_data_space_mesh(trained_setup):
    """2-D (data=2, space=4) mesh: batch + spatial-H sharding compiles and
    runs (halo exchange derived by GSPMD)."""
    model, state, _ = trained_setup
    mesh = make_mesh((2, 4), ("data", "space"))
    batch = _batch(b=2)
    step = make_train_step(model, mesh=mesh, donate=False)
    with mesh:
        state1, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))


def test_make_data_mesh_divisibility():
    from vqvae3d_tpu.parallel.mesh import make_data_mesh

    # 8 virtual devices: largest divisor of the batch that fits
    assert make_data_mesh(2).devices.size == 2
    assert make_data_mesh(3).devices.size == 3
    assert make_data_mesh(8).devices.size == 8
    assert make_data_mesh(12).devices.size == 6
    assert make_data_mesh(7).devices.size == 7
    assert make_data_mesh(1).devices.size == 1


def test_make_hybrid_mesh_fallback():
    """Single-process fallback of the multi-host mesh helper."""
    from vqvae3d_tpu.parallel.multihost import is_primary, make_hybrid_mesh

    mesh = make_hybrid_mesh(space=2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.size == 8
    assert is_primary()


def test_mixture_nll_metric_trains():
    """metric='mixture-nll' wires the discretized-logistic-mixture head
    (round-2: the reference parsed --n-mix but never wired it)."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(16, 32),
        dtype=jnp.float32,
        remat=False,
        base_lr=1e-3,
        metric="mixture-nll",
        n_mix=3,
    )
    model = VQVAE(cfg)
    assert cfg.head_channels == 9
    batch = _batch()
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    # decoder emits 3*n_mix channels
    decoded, _ = model.apply(
        {"params": state.params, "quantizer": state.quantizer},
        batch["volume"], train=False,
    )
    assert decoded.shape[-1] == 9

    train_step = make_train_step(model, donate=False)
    losses = []
    for _ in range(3):
        state, log = train_step(state, batch)
        losses.append(float(log["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # NLL decreases

    eval_step = make_eval_step(model)
    log = eval_step(state, batch)
    assert np.isfinite(float(log["ssim"]))
    assert np.isfinite(float(log["recon_loss_median"]))


def test_mixture_nll_matches_reference_formula():
    """mixture_nll_loss agrees with the torch MixtureSameFamily oracle
    (reference metrics/distribution.py:22-50)."""
    import torch
    import torch.distributions as D

    from vqvae3d_tpu.metrics.distribution import mixture_nll_loss

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 5)).astype(np.float32)
    logits = rng.normal(size=(4, 5, 3)).astype(np.float32)
    loc = rng.normal(size=(4, 5, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(4, 5, 3)).astype(np.float32)

    got = np.asarray(
        mixture_nll_loss(
            jnp.asarray(x), jnp.asarray(logits), jnp.asarray(loc),
            jnp.asarray(scale), reduce_sum=False,
        )
    )

    base = D.TransformedDistribution(
        D.Uniform(torch.zeros_like(torch.tensor(loc)), 1.0),
        [D.SigmoidTransform().inv,
         D.AffineTransform(torch.tensor(loc), torch.tensor(scale))],
    )
    mix = D.MixtureSameFamily(
        D.Categorical(logits=torch.tensor(logits)), base
    )
    want = -mix.log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
