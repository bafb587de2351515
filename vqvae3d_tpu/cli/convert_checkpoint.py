"""Convert a reference (PyTorch Lightning) checkpoint into our format.

Reads the torch ``.ckpt`` (torch.load; a dict with 'state_dict' and
'hyper_parameters' — the reference's save_hyperparameters makes checkpoints
self-describing, vqvae/model.py:42) and writes an Orbax checkpoint + config
snapshot loadable by every CLI in this package. This is the bridge for
evaluating the reference's published checkpoints (README.md:5-14) at SSIM
parity (BASELINE.md).

    python -m vqvae3d_tpu.cli.convert_checkpoint vqvae ref.ckpt out_dir \
        --num-embeddings 128 256 512 --n-pre-quantization-blocks 50 ...
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from vqvae3d_tpu.cli.common import add_dataclass_args, dataclass_from_args


def parse_arguments(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("kind", choices=["vqvae", "pixelcnn", "pixelsnail"])
    known, _ = pre.parse_known_args(argv)

    parser = argparse.ArgumentParser(description=__doc__, parents=[pre])
    if known.kind == "vqvae":
        from vqvae3d_tpu.models.vqvae import VQVAEConfig

        parser = add_dataclass_args(parser, VQVAEConfig)
    elif known.kind == "pixelcnn":
        from vqvae3d_tpu.models.pixelcnn import PixelCNNConfig

        parser = add_dataclass_args(parser, PixelCNNConfig, skip=("dtype",))
    else:
        from vqvae3d_tpu.models.pixelsnail import PixelSNAILConfig

        parser = add_dataclass_args(parser, PixelSNAILConfig, skip=("dtype",))
    parser.add_argument("ckpt_path", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--from-hparams", action="store_true",
                        help="read model hyperparameters from the Lightning "
                             "checkpoint instead of CLI flags (best effort)")
    return parser.parse_args(argv)


def load_torch_state_dict(ckpt_path):
    import torch

    ckpt = torch.load(str(ckpt_path), map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    hparams = ckpt.get("hyper_parameters", {})
    return {k: v.numpy() for k, v in sd.items()}, hparams


def _vqvae_config_from_hparams(hparams):
    from vqvae3d_tpu.models.vqvae import VQVAEConfig

    args = hparams.get("args", hparams)
    get = lambda k, d: getattr(args, k, None) if not isinstance(args, dict) else args.get(k, d)  # noqa: E731
    ne = get("num_embeddings", [256])
    if isinstance(ne, int):
        ne = [ne]
    return VQVAEConfig(
        input_channels=get("input_channels", 1) or 1,
        base_network_channels=get("base_network_channels", 4) or 4,
        n_bottleneck_blocks=get("n_bottleneck_blocks", 3) or 3,
        n_blocks_per_bottleneck=get("n_downscales_per_bottleneck", 2) or 2,
        n_pre_quantization_blocks=get("n_pre_quantization_blocks", 0) or 0,
        n_post_quantization_blocks=get("n_post_quantization_blocks", 0) or 0,
        n_post_upscale_blocks=get("n_post_upscale_blocks", 0) or 0,
        n_post_downscale_blocks=get("n_post_downscale_blocks", 0) or 0,
        num_embeddings=tuple(ne),
    )


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    sd, hparams = load_torch_state_dict(args.ckpt_path)

    if args.kind == "vqvae":
        from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
        from vqvae3d_tpu.train.checkpoint import (
            convert_reference_vqvae_state_dict,
            save_checkpoint,
        )
        from vqvae3d_tpu.train.state import create_vqvae_train_state

        config = (
            _vqvae_config_from_hparams(hparams)
            if args.from_hparams
            else dataclass_from_args(VQVAEConfig, args)
        )
        model = VQVAE(config)
        variables = convert_reference_vqvae_state_dict(sd, config)
        state = create_vqvae_train_state(
            model, jax.random.PRNGKey(0), np.zeros((1, 64, 64, 64, 1))
        )
        state = state.replace(
            params=variables["params"], quantizer=variables["quantizer"]
        )
        save_checkpoint(args.out_dir, state, config=config)
    else:
        from vqvae3d_tpu.train.prior_train import create_prior_train_state
        from vqvae3d_tpu.train.checkpoint import save_checkpoint

        if args.kind == "pixelcnn":
            from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
            from vqvae3d_tpu.train.checkpoint import (
                convert_reference_pixelcnn_state_dict as convert,
            )

            config = dataclass_from_args(PixelCNNConfig, args, skip=("dtype",))
            model = PixelCNN(config)
        else:
            from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
            from vqvae3d_tpu.train.checkpoint import (
                convert_reference_pixelsnail_state_dict as convert,
            )

            config = dataclass_from_args(PixelSNAILConfig, args, skip=("dtype",))
            model = PixelSNAIL(config)

        variables = convert(sd, config)
        probe = {"data": np.zeros((1, 8, 8, 4), np.int32)}
        if config.use_conditioning:
            probe["condition"] = np.zeros((1, 2, 2, 1), np.int32)
        state = create_prior_train_state(model, jax.random.PRNGKey(0), probe)
        state = state.replace(params=variables["params"])
        save_checkpoint(args.out_dir, state, config=config)

    print(f"converted {args.kind} checkpoint → {args.out_dir}")


if __name__ == "__main__":
    main(parse_arguments())
