"""Benchmark: ancestral sampling at the reference's published grid sizes.

The reference's sample jobs (the capability this must match) are:

  top    grid 128x128x32  batch 1   PixelCNN 50x16d, conditioned
         (slurm-jobs/sample_embeddings_top.job:68-70; model from
          train_pixelcnn_top.job:82-86 — the job top resumes/samples)
  mid    grid 32x32x8     batch 10  PixelSNAIL 8x5x256d
         (sample_embeddings_mid.job:67-69; train_pixelsnail_mid_downscaled
          .job:84-90)
  bottom grid 8x8x2       batch 20  PixelSNAIL 3x5x512d
         (sample_embeddings_bottom.job:63-65; train_pixelsnail_bottom
          .job:84-91)

All samplers are the exact cached decompositions (sample/cached_sample.py,
sample/cached_snail.py — unit-tested bit/logit-equal to the one-shot
forward), replacing the reference's O(V^2) full-forward-per-voxel loop
(pixel_model/pixelcnn.py:260-283).

TIMING: same async-safe protocol as bench.py — executions chain (each
run's PRNG key is folded with the previous run's output so the runtime
cannot overlap them), a scalar host readback forces completion, and when
runs are fast the per-run time is the slope between two chain lengths.
For multi-second runs a single chained run is reported (dispatch RTT
~0.1 s is noise at that scale; the readback still bounds completion).

Prints one JSON line per level plus a summary line. BENCH_SAMPLE_LEVELS
selects a subset (e.g. "bottom,mid").
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _measure(run, n_lo=1, n_hi=2):
    """run(key, prev) -> grid; returns (sec_per_run, n_runs_timed)."""
    key0 = jax.random.PRNGKey(0)

    @jax.jit
    def chain_key(key, grid):
        # data dependency on the previous run's output: executions serialize
        return jax.random.fold_in(key, jnp.sum(grid).astype(jnp.uint32))

    # compile + warmup
    g = run(key0)
    float(jnp.sum(g))

    def timed_chain(n):
        key, grid = key0, g
        t0 = time.perf_counter()
        for _ in range(n):
            key = chain_key(key, grid)
            grid = run(key)
        float(jnp.sum(grid))  # scalar readback = true completion
        return time.perf_counter() - t0

    t1 = timed_chain(1)
    if t1 > 20.0:
        return t1, 1  # single run; RTT ~0.1 s is <1% here
    if t1 > 4.0:
        t2 = timed_chain(2)
        return max(t2 - t1, 1e-6), 3
    t_lo = timed_chain(2)
    t_hi = timed_chain(6)
    return max((t_hi - t_lo) / 4, 1e-6), 8


def bench_top():
    from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
    from vqvae3d_tpu.sample.cached_sample import make_cached_sampler

    dims, batch = (128, 128, 32), 1
    cfg = PixelCNNConfig(
        input_dim=128, condition_dim=256, model_dim=16, num_resblocks=50,
        dropout_prob=0.0, dtype=jnp.bfloat16,
    )
    model = PixelCNN(cfg)
    from vqvae3d_tpu.train.prior_train import create_prior_train_state

    init_batch = {
        "data": np.zeros((1, 4, 4, 2), np.int32),
        "condition": np.zeros((1, 1, 1, 1), np.int32),
    }
    params = create_prior_train_state(
        model, jax.random.PRNGKey(0), init_batch
    ).params
    cond = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (batch, 32, 32, 8)), jnp.int32
    )
    sampler = make_cached_sampler(model, dims, batch, tau=0.1)
    return _measure(lambda key: sampler(params, key, cond)), dims, batch


def bench_mid():
    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
    from vqvae3d_tpu.sample.cached_snail import make_cached_snail_sampler

    dims, batch = (32, 32, 8), 10
    cfg = PixelSNAILConfig(
        input_dim=256, condition_dim=0, model_dim=256,
        num_layers_per_block=5, num_blocks=8,
        causal_dropout_prob=0.0, attention_dropout_prob=0.0,
        dtype=jnp.bfloat16,
    )
    model = PixelSNAIL(cfg)
    from vqvae3d_tpu.train.prior_train import create_prior_train_state

    params = create_prior_train_state(
        model, jax.random.PRNGKey(0), {"data": np.zeros((1, 4, 4, 2), np.int32)}
    ).params
    sampler = make_cached_snail_sampler(model, dims, batch, tau=0.1)
    return _measure(lambda key: sampler(params, key)), dims, batch


def bench_bottom():
    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
    from vqvae3d_tpu.sample.cached_snail import make_cached_snail_sampler

    dims, batch = (8, 8, 2), 20
    cfg = PixelSNAILConfig(
        input_dim=512, condition_dim=0, model_dim=512,
        num_layers_per_block=5, num_blocks=3,
        causal_dropout_prob=0.0, attention_dropout_prob=0.0,
        dtype=jnp.bfloat16,
    )
    model = PixelSNAIL(cfg)
    from vqvae3d_tpu.train.prior_train import create_prior_train_state

    params = create_prior_train_state(
        model, jax.random.PRNGKey(0), {"data": np.zeros((1, 4, 4, 2), np.int32)}
    ).params
    sampler = make_cached_snail_sampler(model, dims, batch, tau=0.1)
    return _measure(lambda key: sampler(params, key)), dims, batch


LEVELS = {"bottom": bench_bottom, "mid": bench_mid, "top": bench_top}


def main():
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    sel = os.environ.get("BENCH_SAMPLE_LEVELS", "bottom,mid,top").split(",")
    results = {}
    for name in sel:
        name = name.strip()
        t0 = time.perf_counter()
        (dt, n_timed), dims, batch = LEVELS[name]()
        wall = time.perf_counter() - t0
        voxels = int(np.prod(dims))
        results[name] = dt
        print(
            json.dumps(
                {
                    "metric": f"sample_{name}_sec_per_grid_batch",
                    "value": round(dt, 3),
                    "unit": "sec",
                    "extra": {
                        "grid": list(dims),
                        "batch": batch,
                        "voxels": voxels,
                        "sec_per_grid": round(dt / batch, 4),
                        "usec_per_voxel_step": round(dt / voxels * 1e6, 1),
                        "runs_timed": n_timed,
                        "compile_plus_total_sec": round(wall, 1),
                        "timing": "chained-key runs + scalar readback",
                    },
                }
            ),
            flush=True,
        )
    if len(results) == len(LEVELS):
        print(
            json.dumps(
                {
                    "metric": "sample_all_levels_sec",
                    "value": round(sum(results.values()), 2),
                    "unit": "sec",
                    "extra": {k: round(v, 2) for k, v in results.items()},
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
