"""Evaluation CLI: reconstruction SSIM over the train+val splits.

Mirrors /root/reference/vqvae/calc_ssim_from_checkpoint.py (slice-wise 3D
SSIM with data range [−0.24, 4] → 4.24, :32) without the reference's
breakpoint()s; prints per-split mean ± std and a JSON summary. This is the
parity-measurement tool for published reference checkpoints converted via
train.checkpoint.convert_reference_vqvae_state_dict (BASELINE.md).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.cli.extract_embeddings import load_vqvae
from vqvae3d_tpu.data.ct_dataset import CTDataModule
from vqvae3d_tpu.metrics.evaluate import ssim3d_slices

SSIM_DATA_RANGE = 4.24  # reference calc_ssim_from_checkpoint.py:32


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt_path", type=Path)
    parser.add_argument("dataset_path", type=Path)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--rescale-input", type=int, nargs="+", default=None)
    parser.add_argument("--scan-size", type=int, nargs=2, default=[512, 512])
    parser.add_argument("--output-depth", type=int, default=128)
    return parser.parse_args(argv)


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    rescale = tuple(args.rescale_input) if args.rescale_input else None
    dm = CTDataModule(
        str(args.dataset_path), batch_size=args.batch_size, rescale_input=rescale,
        size=(*args.scan_size, None),
        output_depth=args.output_depth,
    )
    shape = (args.batch_size, *(rescale or (*args.scan_size, args.output_depth)), 1)
    model, state, config = load_vqvae(args.ckpt_path, shape)
    variables = {"params": state.params, "quantizer": state.quantizer}

    # literal-stem (converted reference) checkpoints serve through the
    # folded domain so full-resolution (512×512×128) eval fits one chip —
    # the reference evaluates whole volumes too (calc_ssim :31-38). The
    # host prefolds; SSIM itself needs full-res slices, so the decoded
    # volume unfolds in-jit (a boundary relayout, not a conv input).
    from vqvae3d_tpu.cli.common import literal_fold_serving
    from vqvae3d_tpu.data.ct_dataset import fold_volume_np
    from vqvae3d_tpu.ops.resize import depth_to_space

    folded = literal_fold_serving(config, shape[1:4])

    @jax.jit
    def recon_ssim(variables, x):
        if folded:
            decoded, _ = model.apply(variables, x, train=False, folded_io=True)
            decoded = depth_to_space(decoded, 2)
            x = depth_to_space(x, 2)
        else:
            decoded, _ = model.apply(variables, x, train=False)
        loc = jax.nn.elu(decoded.astype(jnp.float32))
        return ssim3d_slices(loc, x.astype(jnp.float32), data_range=SSIM_DATA_RANGE)

    def prep(b):
        v = np.asarray(b["volume"])
        return jnp.asarray(fold_volume_np(v, 2) if folded else v)

    out = {}
    for split, loader in (
        ("train", dm.train_dataloader(epoch=0)),
        ("val", dm.val_dataloader()),
    ):
        vals = [float(recon_ssim(variables, prep(b))) for b in loader]
        if vals:
            out[split] = {
                "ssim_mean": float(np.mean(vals)),
                "ssim_std": float(np.std(vals)),
                "n": len(vals),
            }
            print(f"{split}: SSIM {out[split]['ssim_mean']:.4f} "
                  f"± {out[split]['ssim_std']:.4f} over {len(vals)} batches")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(parse_arguments())
