"""Offline per-intensity histogram over the (cylinder-masked) dataset.

Equivalent of /root/reference/utils/data_marginal.py:9-38: accumulates a
normalized-intensity histogram across all scans, restricted to the CT gantry
cylinder, and saves it as .npz (bins + counts) for data-marginal analysis.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from vqvae3d_tpu.data.ct_dataset import CTDataModule
from vqvae3d_tpu.data.transforms import create_cylinder_xy_mask


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset_path", type=Path)
    parser.add_argument("--out", type=Path, default=Path("data_marginal.npz"))
    parser.add_argument("--bins", type=int, default=512)
    parser.add_argument("--range", type=float, nargs=2, default=[-0.5, 4.0])
    parser.add_argument("--scan-size", type=int, nargs=2, default=[512, 512])
    return parser.parse_args(argv)


def main(args):
    dm = CTDataModule(
        str(args.dataset_path),
        batch_size=1,
        train_frac=1.0,
        size=(*args.scan_size, None),
    )
    edges = np.linspace(args.range[0], args.range[1], args.bins + 1)
    counts = np.zeros(args.bins, np.int64)
    mask = None
    n = 0
    for batch in dm.train_dataloader(epoch=0):
        vol = batch["volume"][0, ..., 0]
        if mask is None:
            mask = create_cylinder_xy_mask(vol.shape[:2])
        vals = vol[mask]
        c, _ = np.histogram(vals, bins=edges)
        counts += c
        n += 1
    np.savez(args.out, bin_edges=edges, counts=counts, num_scans=n)
    print(f"histogram over {n} scans → {args.out}")
    return counts


if __name__ == "__main__":
    main(parse_arguments())
