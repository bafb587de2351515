"""convert_checkpoint CLI: torch Lightning .ckpt → our Orbax checkpoint."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    import importlib

    return torch, importlib.import_module("vqvae.layers")


def test_convert_vqvae_ckpt_cli(ref, tmp_path):
    torch, layers = ref
    torch.manual_seed(0)

    enc = layers.Encoder2(
        in_channels=1, base_network_channels=4, num_embeddings=[8, 16],
        n_enc=2, n_down_per_enc=2, resblock=layers.PreActFixupResBlock,
    )
    dec = layers.Decoder(
        out_channels=1, base_network_channels=4, n_enc=2, n_up_per_enc=2,
        resblock=layers.PreActFixupResBlock,
    )
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    ckpt_file = tmp_path / "ref.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": {}}, ckpt_file)

    from vqvae3d_tpu.cli import convert_checkpoint

    out_dir = tmp_path / "converted"
    args = convert_checkpoint.parse_arguments([
        "vqvae", str(ckpt_file), str(out_dir),
        "--n-bottleneck-blocks", "2",
        "--num-embeddings", "8", "16",
    ])
    convert_checkpoint.main(args)

    # reload through the standard loader and run a forward
    from vqvae3d_tpu.cli.extract_embeddings import load_vqvae

    model, state, config = load_vqvae(out_dir, (1, 32, 32, 16, 1))
    np.testing.assert_allclose(
        np.asarray(state.quantizer["encoder"]["quantize_0"]["embed"]),
        enc.quantize[0].embed.numpy(),
        atol=1e-6,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 16, 1)), jnp.float32)
    variables = {"params": state.params, "quantizer": state.quantizer}
    decoded, _ = model.apply(variables, x, train=False)
    assert decoded.shape == x.shape
    assert np.isfinite(np.asarray(decoded, np.float32)).all()
