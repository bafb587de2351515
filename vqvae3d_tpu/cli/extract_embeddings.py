"""Stage-1.5 CLI: run the trained encoder over the dataset and dump
per-level code grids into a multi-level code store.

Mirrors /root/reference/vqvae/extract_embeddings.py: batch 1, train_frac 1,
store schema = sub-store per level + num_dbs/length/num_embeddings metadata.
The reference hard-codes rescale_input=(256,256,128) (:54); here it is a
flag with the same default.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.data.code_store import CodeStoreWriter
from vqvae3d_tpu.data.ct_dataset import CTDataModule
from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
from vqvae3d_tpu.train.checkpoint import load_config, restore_checkpoint
from vqvae3d_tpu.train.state import create_vqvae_train_state


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-path", type=Path, default=Path("."))
    parser.add_argument("--output-name", type=str, default="codes")
    parser.add_argument("--checkpoint-path", type=Path, required=True)
    parser.add_argument("--dataset-path", type=Path, required=True)
    parser.add_argument("--rescale-input", type=int, nargs="+",
                        default=[256, 256, 128],
                        help="pass a single 0 to disable rescaling")
    parser.add_argument("--backend", choices=["auto", "lmdb", "file"], default="auto")
    parser.add_argument("--scan-size", type=int, nargs=2, default=[512, 512])
    parser.add_argument("--output-depth", type=int, default=128)
    return parser.parse_args(argv)


def load_vqvae(checkpoint_path, sample_shape):
    config = load_config(checkpoint_path, VQVAEConfig)
    model = VQVAE(config)
    state = create_vqvae_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros(sample_shape)
    )
    state = restore_checkpoint(checkpoint_path, state)
    return model, state, config


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    rescale = tuple(args.rescale_input) if args.rescale_input else None
    if rescale is not None and 0 in rescale:
        rescale = None
    dm = CTDataModule(
        str(args.dataset_path),
        batch_size=1,
        train_frac=1.0,
        num_workers=5,
        rescale_input=rescale,
        size=(*args.scan_size, None),
        output_depth=args.output_depth,
    )
    assert dm.train_len > 0, "no compatible scans found"

    sample_shape = (1, *(rescale or (*args.scan_size, args.output_depth)), 1)
    model, state, config = load_vqvae(args.checkpoint_path, sample_shape)

    # literal-stem checkpoints: host-prefold + folded encoder front-end so
    # full-res extraction fits one chip (cli/common.literal_fold_serving)
    from vqvae3d_tpu.cli.common import literal_fold_serving
    from vqvae3d_tpu.data.ct_dataset import fold_volume_np

    folded = literal_fold_serving(config, sample_shape[1:4])

    @jax.jit
    def encode(variables, x):
        results = model.apply(
            variables, x, train=False, folded_io=folded, method=VQVAE.encode
        )
        return [idx for (_, _, idx) in results]

    variables = {"params": state.params, "quantizer": state.quantizer}
    out_path = str(args.output_path / args.output_name)
    writer = CodeStoreWriter(
        out_path,
        num_levels=config.n_bottleneck_blocks,
        num_embeddings=list(config.num_embeddings),
        backend=args.backend,
    )
    n = 0
    for i, batch in enumerate(dm.train_dataloader(epoch=0)):
        vol = np.asarray(batch["volume"])
        if folded:
            vol = fold_volume_np(vol, 2)
        indices = encode(variables, jnp.asarray(vol))
        writer.write_sample(i, [np.asarray(ix[0], np.int32) for ix in indices])
        n += 1
    writer.close()
    print(f"wrote {n} samples × {config.n_bottleneck_blocks} levels to {out_path}")
    return out_path


if __name__ == "__main__":
    main(parse_arguments())
