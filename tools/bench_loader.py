"""Measure sustained input-pipeline throughput: NRRD decode + transforms +
space-to-depth fold + H2D, over a synthetic CT-like NRRD directory
(VERDICT r3 #4 — prove the host can feed the device at the benchmarked
rate; the reference sized its pipeline with DataLoader num_workers=5 +
node-local scratch, utils/load_nrrd_dataset.py:105-109,
slurm-jobs/train_vqvae_3d.job:93-96).

Synthetic volumes mimic CT statistics (smooth structure + noise, int16,
gzip encoding — the decode cost is dominated by gzip inflate + HU
normalize + fold, all of which are content-dependent only through the
compression ratio, reported alongside).

Usage:
    python tools/bench_loader.py [--workers 1,5,8] [--n-vols 12]
        [--depth 110] [--res 512] [--fold 2] [--no-h2d]

Prints one JSON line per worker count:
    {"metric": "loader_volumes_per_sec", "value": ..., "extra": {...}}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_dir(
    root: str, n_vols: int, res: int, depth: int, seed: int = 0
) -> tuple:
    """Write n_vols CT-like NRRD scans; returns (dir, bytes_on_disk)."""
    from vqvae3d_tpu.data import nrrd_io

    d = Path(root)
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    # smooth base (low-res repeated up) + quantized noise: compresses a
    # couple of x under gzip like real CT. float32 + np.repeat keeps
    # generation cheap (np.kron/float64 measured minutes per volume).
    for i in range(n_vols):
        lo = rng.normal(0, 600, size=(res // 16, res // 16, depth // 2)).astype(
            np.float32
        )
        base = np.repeat(
            np.repeat(np.repeat(lo, 16, 0), 16, 1), 2, 2
        )[:res, :res, :depth]
        noise = (rng.integers(-3, 4, size=(res, res, depth)) * 20.0).astype(
            np.float32
        )
        vol = np.clip(base + noise, -1200, 2800).astype(np.int16)
        nrrd_io.write(
            d / f"scan{i}.nrrd", vol, header={"spacings": (0.976, 0.976, 3)}
        )
    nbytes = sum(p.stat().st_size for p in d.glob("*.nrrd"))
    return str(d), nbytes


def bench(
    data_dir: str,
    workers: int,
    fold: int,
    h2d: bool,
    epochs: int = 2,
    cache_dir: str | None = None,
):
    from vqvae3d_tpu.data.ct_dataset import CTDataModule

    dm = CTDataModule(
        data_dir, batch_size=1, train_frac=1.0, num_workers=workers,
        size=(None, None, None), spacing=None, cache_dir=cache_dir,
    )
    if h2d:
        import jax

    n = 0
    t0 = None
    for ep in range(epochs):
        for batch in dm.train_dataloader(epoch=ep, fold=fold):
            if h2d:
                arrs = jax.device_put(batch)
                jax.block_until_ready(arrs)
            if t0 is None:
                # clock starts after the first batch: steady-state rate,
                # not pool ramp-up
                t0 = time.perf_counter()
            else:
                n += batch["volume"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt, n, dt


def bench_cached_epochs(
    data_dir: str, workers: int, fold: int, h2d: bool, cache_dir: str
):
    """(cold_rate, warm_rate): epoch 1 decodes + writes the volume cache,
    epoch 2 reads it back (the decode-once fold-on-write path — VERDICT
    r4 #6). Epochs are timed separately, whole-epoch walls (no warmup
    batch discard — the cache hit/miss asymmetry IS the measurement)."""
    from vqvae3d_tpu.data.ct_dataset import CTDataModule

    dm = CTDataModule(
        data_dir, batch_size=1, train_frac=1.0, num_workers=workers,
        size=(None, None, None), spacing=None, cache_dir=cache_dir,
    )
    if h2d:
        import jax

    rates = []
    for ep in range(2):
        n = 0
        t0 = time.perf_counter()
        for batch in dm.train_dataloader(epoch=ep, fold=fold):
            if h2d:
                arrs = jax.device_put(batch)
                jax.block_until_ready(arrs)
            n += batch["volume"].shape[0]
        rates.append(n / (time.perf_counter() - t0))
    return rates[0], rates[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=str, default="1,5,8")
    p.add_argument("--n-vols", type=int, default=12)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--depth", type=int, default=110)
    p.add_argument("--fold", type=int, default=2)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--no-h2d", action="store_true")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument(
        "--cache", action="store_true",
        help="also measure the decode-once volume cache: cold (decode+"
        "write) vs warm (read) epoch rates",
    )
    args = p.parse_args()

    tmp = args.data_dir or os.path.join(
        tempfile.gettempdir(), f"ctbench_{args.res}_{args.depth}_{args.n_vols}"
    )
    if not (Path(tmp).exists() and len(list(Path(tmp).glob("*.nrrd"))) >= args.n_vols):
        t0 = time.perf_counter()
        tmp, nbytes = make_synthetic_dir(tmp, args.n_vols, args.res, args.depth)
        gen_s = time.perf_counter() - t0
    else:
        nbytes = sum(p_.stat().st_size for p_ in Path(tmp).glob("*.nrrd"))
        gen_s = 0.0
    raw = args.n_vols * args.res * args.res * args.depth * 2
    for w in [int(x) for x in args.workers.split(",")]:
        rate, n, dt = bench(tmp, w, args.fold, not args.no_h2d, args.epochs)
        print(
            json.dumps(
                {
                    "metric": "loader_volumes_per_sec",
                    "value": round(rate, 3),
                    "unit": "volumes/sec",
                    "extra": {
                        "num_workers": w,
                        "volumes_timed": n,
                        "wall_sec": round(dt, 2),
                        "fold": args.fold,
                        "h2d": not args.no_h2d,
                        "res": args.res,
                        "depth_raw": args.depth,
                        "compression_ratio": round(raw / nbytes, 2),
                        "gen_sec": round(gen_s, 1),
                        "pipeline": "nrrd gzip decode + HU window + depth pad"
                        " + s2d fold" + ("" if args.no_h2d else " + device_put"),
                    },
                }
            ),
            flush=True,
        )
    if args.cache:
        import shutil
        import tempfile as _tf

        cdir = _tf.mkdtemp(prefix="volcache_")
        try:
            w = [int(x) for x in args.workers.split(",")][-1]
            cold, warm = bench_cached_epochs(
                tmp, w, args.fold, not args.no_h2d, cdir
            )
            csize = sum(p_.stat().st_size for p_ in Path(cdir).glob("*.npz"))
            print(
                json.dumps(
                    {
                        "metric": "loader_cached_epoch_volumes_per_sec",
                        "value": round(warm, 3),
                        "unit": "volumes/sec",
                        "extra": {
                            "cold_epoch_volumes_per_sec": round(cold, 3),
                            "num_workers": w,
                            "fold": args.fold,
                            "h2d": not args.no_h2d,
                            "cache_bytes_per_volume": csize // max(args.n_vols, 1),
                            "pipeline": "epoch 1: decode+fold+normalize+WRITE"
                            " cache; epoch 2: READ cache"
                            + ("" if args.no_h2d else " + device_put"),
                        },
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(cdir, ignore_errors=True)


if __name__ == "__main__":
    main()
