"""Stage-3 CLI: decode sampled code grids into synthetic CT volumes (.nrrd).

Mirrors /root/reference/vqvae/decode_embeddings.py: for each finest-level
sample in the sample DB, fetch its coarser condition grid by uuid, look the
indices up in the VQ-VAE codebooks, run the decoder + ELU, un-normalize to
integer HU, and write NRRD with spacings (0.976, 0.976, 3). Samples whose
last finest-grid slice is all-zero are tagged 'failure' (reference :32).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.cli.extract_embeddings import load_vqvae
from vqvae3d_tpu.data import nrrd_io
from vqvae3d_tpu.data.sample_db import create_or_load_db
from vqvae3d_tpu.data.transforms import hu_unnormalize
from vqvae3d_tpu.models.vqvae import VQVAE, embed_code


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("db_path", type=Path)
    parser.add_argument("ckpt_path", type=Path)
    parser.add_argument("out_path", type=Path, help="output prefix without extension")
    parser.add_argument("--volume-shape", type=int, nargs=3, default=[256, 256, 128],
                        help="decoded volume shape (sets the jit shapes)")
    return parser.parse_args(argv)


def decode_samples(model, variables, sample_db, n_levels=2, folded=False):
    """Yield (name, volume ndarray) per finest-level sample.

    ``folded``: literal-stem folded serving — the decoder emits
    s2d(decoded, 2) (no full-res small-C tensor on device); ELU is
    pointwise so it applies in the folded layout, and the host unfolds."""
    from vqvae3d_tpu.data.ct_dataset import unfold_volume_np

    @jax.jit
    def decode(variables, embeddings):
        out = model.apply(
            variables, embeddings, train=False, folded_io=folded,
            method=VQVAE.decode,
        )
        return jax.nn.elu(out.astype(jnp.float32))

    for key0, entry0 in sample_db[0].items():
        key1 = entry0["condition"]
        grids = [np.asarray(entry0["data"])]
        if key1 is not None:
            grids.append(np.asarray(sample_db[1][key1]["data"]))
        success = "failure" if np.all(grids[0][..., -1] == 0) else "success"

        embeddings = [
            embed_code(variables, lvl, jnp.asarray(g)[None])
            for lvl, g in enumerate(grids)
        ]
        res = np.asarray(decode(variables, embeddings))
        if folded:
            res = unfold_volume_np(res, 2)
        vol = res[0, ..., 0]
        yield f"{success}_{key1}_{key0}", vol


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    vol_shape = tuple(args.volume_shape)
    args.out_path.parent.mkdir(parents=True, exist_ok=True)
    model, state, config = load_vqvae(args.ckpt_path, (1, *vol_shape, 1))
    variables = {"params": state.params, "quantizer": state.quantizer}

    from vqvae3d_tpu.cli.common import literal_fold_serving

    folded = literal_fold_serving(config, vol_shape)
    db = create_or_load_db(args.db_path, level=0)
    n = 0
    for name, vol in decode_samples(model, variables, db, folded=folded):
        hu = hu_unnormalize(vol)
        out_file = str(args.out_path) + f"_{name}.nrrd"
        nrrd_io.write(out_file, hu.astype(np.int32), header={"spacings": (0.976, 0.976, 3)})
        print(f"wrote {out_file}")
        n += 1
    print(f"decoded {n} samples")


if __name__ == "__main__":
    main(parse_arguments())
