"""Visual-check CLI: reconstruct one dataset volume and write it as NRRD.

Mirrors /root/reference/vqvae/plot_from_checkpoint.py (forward → ELU →
un-normalize → .nrrd) without the reference's breakpoint()s.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.cli.extract_embeddings import load_vqvae
from vqvae3d_tpu.data import nrrd_io
from vqvae3d_tpu.data.ct_dataset import CTDataModule
from vqvae3d_tpu.data.transforms import hu_unnormalize


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt_path", type=Path)
    parser.add_argument("dataset_path", type=Path)
    parser.add_argument("out_path", type=Path, help="output prefix (no extension)")
    parser.add_argument("--sample-index", type=int, default=0)
    parser.add_argument("--rescale-input", type=int, nargs="+", default=None)
    parser.add_argument("--scan-size", type=int, nargs=2, default=[512, 512])
    parser.add_argument("--output-depth", type=int, default=128)
    return parser.parse_args(argv)


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    rescale = tuple(args.rescale_input) if args.rescale_input else None
    dm = CTDataModule(
        str(args.dataset_path), batch_size=1, train_frac=1.0, rescale_input=rescale,
        size=(*args.scan_size, None),
        output_depth=args.output_depth,
    )
    vol, _ = dm.dataset[args.sample_index]
    x = jnp.asarray(vol)[None]

    model, state, config = load_vqvae(args.ckpt_path, x.shape)
    variables = {"params": state.params, "quantizer": state.quantizer}

    # literal-stem checkpoints: folded serving (see cli/common)
    from vqvae3d_tpu.cli.common import literal_fold_serving
    from vqvae3d_tpu.data.ct_dataset import fold_volume_np, unfold_volume_np

    folded = literal_fold_serving(config, x.shape[1:4])
    if folded:
        x = jnp.asarray(fold_volume_np(np.asarray(x), 2))
    decoded, _ = jax.jit(
        lambda v, x: model.apply(v, x, train=False, folded_io=folded)
    )(variables, x)
    recon = np.asarray(jax.nn.elu(decoded.astype(jnp.float32)))
    if folded:
        recon = unfold_volume_np(recon, 2)
    recon = recon[0, ..., 0]

    for name, arr in (("orig", vol[..., 0]), ("recon", recon)):
        out = str(args.out_path) + f"_{name}.nrrd"
        nrrd_io.write(out, hu_unnormalize(arr), header={"spacings": (0.976, 0.976, 3)})
        print(f"wrote {out}")


if __name__ == "__main__":
    main(parse_arguments())
