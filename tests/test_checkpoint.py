"""Checkpoint save/restore + torch-reference weight conversion parity.

The conversion test loads the ACTUAL reference modules (read-only import
from /root/reference, torch CPU) as a numerical oracle: build the reference
Encoder2+Decoder, convert its state_dict with
``convert_reference_vqvae_state_dict``, and require the converted JAX model
to reproduce the torch forward voxel-for-voxel. This is the mechanism for
establishing SSIM parity against published reference checkpoints
(BASELINE.md).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
from vqvae3d_tpu.train.checkpoint import (
    convert_reference_vqvae_state_dict,
    load_config,
    restore_checkpoint,
    save_checkpoint,
)
from vqvae3d_tpu.train.state import create_vqvae_train_state

KEY = jax.random.PRNGKey(0)


def test_orbax_roundtrip(tmp_path):
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2, num_embeddings=(8, 16), dtype=jnp.float32, remat=False
    )
    model = VQVAE(cfg)
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    save_checkpoint(tmp_path / "ckpt", state, config=cfg)

    # restore into a freshly initialized state
    state2 = create_vqvae_train_state(
        model, jax.random.PRNGKey(9), np.zeros((1, 32, 32, 16, 1))
    )
    restored = restore_checkpoint(tmp_path / "ckpt", state2)
    a = state.params["encoder"]["parse_input"]["kernel"]
    b = restored.params["encoder"]["parse_input"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    q0 = np.asarray(state.quantizer["encoder"]["quantize_0"]["embed"])
    q1 = np.asarray(restored.quantizer["encoder"]["quantize_0"]["embed"])
    np.testing.assert_array_equal(q0, q1)

    cfg2 = load_config(tmp_path / "ckpt", VQVAEConfig)
    assert cfg2 == cfg


@pytest.fixture(scope="module")
def reference_modules():
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    import importlib

    layers = importlib.import_module("vqvae.layers")
    return torch, layers


def test_reference_vqvae_conversion_parity(reference_modules):
    torch, layers = reference_modules
    torch.manual_seed(0)

    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        n_blocks_per_bottleneck=2,
        num_embeddings=(16, 32),
        n_pre_quantization_blocks=1,
        n_post_quantization_blocks=1,
        n_post_upscale_blocks=1,
        n_post_downscale_blocks=1,
        dtype=jnp.float32,
        remat=False,
        argmin_method="ref",
    )

    enc = layers.Encoder2(
        in_channels=1,
        base_network_channels=cfg.base_network_channels,
        num_embeddings=list(cfg.num_embeddings),
        n_enc=2,
        n_down_per_enc=2,
        n_pre_q_blocks=1,
        n_post_upscale_blocks=1,
        n_post_downscale_blocks=1,
        resblock=layers.PreActFixupResBlock,
    ).eval()
    dec = layers.Decoder(
        out_channels=1,
        base_network_channels=cfg.base_network_channels,
        n_enc=2,
        n_up_per_enc=2,
        n_post_q_blocks=1,
        n_post_upscale_blocks=1,
        resblock=layers.PreActFixupResBlock,
    ).eval()

    # randomize all params so zero-init branches don't mask mapping bugs
    with torch.no_grad():
        for p in list(enc.parameters()) + list(dec.parameters()):
            p.copy_(torch.randn_like(p) * 0.2)

    x_t = torch.randn(1, 1, 32, 32, 16)
    with torch.no_grad():
        results = list(enc(x_t))  # fine → coarse (loss, quantized, idx)
        torch_quants = [r[1] for r in results]
        torch_idx = [r[2] for r in results]
        torch_out = dec(torch_quants)

    sd = {f"encoder.{k}": v.numpy() for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v.numpy() for k, v in dec.state_dict().items()})
    variables = convert_reference_vqvae_state_dict(sd, cfg)

    model = VQVAE(cfg)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())  # NCHWD → NHWDC
    decoded, (losses, quants, indices) = model.apply(variables, x_j, train=False)

    for lvl in range(2):
        np.testing.assert_array_equal(
            np.asarray(indices[lvl]),
            torch_idx[lvl].numpy()[:, 0]
            if torch_idx[lvl].ndim == 5
            else torch_idx[lvl].numpy(),
        )
        np.testing.assert_allclose(
            np.asarray(quants[lvl]),
            torch_quants[lvl].permute(0, 2, 3, 4, 1).numpy(),
            atol=2e-4,
        )
    np.testing.assert_allclose(
        np.asarray(decoded),
        torch_out.permute(0, 2, 3, 4, 1).numpy(),
        atol=2e-3,
    )


def test_checkpoint_retention(tmp_path):
    """max_to_keep prunes old step dirs (round-2: reference keeps
    top-1 + last, vqvae/train.py:56; unbounded growth before)."""
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2, num_embeddings=(8, 16), dtype=jnp.float32, remat=False
    )
    model = VQVAE(cfg)
    state = create_vqvae_train_state(model, KEY, np.zeros((1, 32, 32, 16, 1)))
    d = tmp_path / "ckpt"
    for step in (1, 2, 3):
        save_checkpoint(d, state, config=cfg, step=step, max_to_keep=2)
    kept = sorted(p.name for p in d.glob("step_*") if p.is_dir())
    assert kept == ["step_2", "step_3"]
    assert not (d / "step_1_config.json").exists()
    assert (d / "step_3_config.json").exists()
    assert (d / "latest.txt").read_text() == "3"
    # the latest checkpoint still restores
    restored = restore_checkpoint(d, state)
    assert int(restored.step) == int(state.step)
