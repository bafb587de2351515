"""Stage-2.5 CLI: ancestral sampling of code grids into the sample DB.

Mirrors /root/reference/pixel_model/sample_embeddings.py: load a trained
prior, sample ``--num-samples`` grids of ``--size``, conditioned on random
entries of the next-coarser level in the DB (repeated when the pool is
small), store {uuid: {'data', 'condition'}} per level under a FileLock with
merge-on-save. Sampling order (SURVEY §3.5): coarsest level first
(unconditional), then each finer level conditioned on the previous.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.data.sample_db import (
    add_samples,
    create_or_load_db,
    get_condition_uuids,
    get_conditions,
    save_db,
)
from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
from vqvae3d_tpu.sample.ar_sample import make_ancestral_sampler
from vqvae3d_tpu.sample.cached_sample import make_cached_sampler
from vqvae3d_tpu.sample.cached_snail import make_cached_snail_sampler
from vqvae3d_tpu.train.checkpoint import load_config, restore_checkpoint
from vqvae3d_tpu.train.prior_train import create_prior_train_state

MODELS = {
    "pixelcnn": (PixelCNN, PixelCNNConfig),
    "pixelsnail": (PixelSNAIL, PixelSNAILConfig),
}


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-checkpoint", type=Path, required=True)
    parser.add_argument("--db-path", type=Path, required=True)
    parser.add_argument("--level", type=int, required=True)
    parser.add_argument("--size", type=int, nargs=3, required=True,
                        help="code-grid spatial dims (s0 s1 s2)")
    parser.add_argument("--num-samples", type=int, default=1)
    parser.add_argument("--use-model", choices=list(MODELS), default="pixelcnn")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--tau", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sampler", choices=["cached", "naive"], default="cached",
                        help="'cached' = exact incremental sampler (PixelCNN "
                             "only); PixelSNAIL falls back to naive")
    args = parser.parse_args(argv)
    assert 1 <= args.batch_size <= args.num_samples
    assert args.tau > 0
    assert args.level >= 0
    return args


def load_prior(checkpoint_path, use_model, sample_batch):
    model_cls, cfg_cls = MODELS[use_model]
    config = load_config(checkpoint_path, cfg_cls)
    model = model_cls(config)
    state = create_prior_train_state(model, jax.random.PRNGKey(0), sample_batch)
    state = restore_checkpoint(checkpoint_path, state)
    return model, state, config


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    dims = tuple(args.size)
    db = create_or_load_db(args.db_path, args.level)

    # build a shape-probe batch to init/restore the prior
    probe = {"data": np.zeros((args.batch_size, *dims), np.int32)}
    has_cond_pool = args.level + 1 in db and len(db[args.level + 1]) > 0
    if has_cond_pool:
        cond_shape = np.asarray(
            next(iter(db[args.level + 1].values()))["data"]
        ).shape
        probe["condition"] = np.zeros((args.batch_size, *cond_shape), np.int32)

    model, state, config = load_prior(args.model_checkpoint, args.use_model, probe)
    assert (config.condition_dim == 0) == (not has_cond_pool), (
        "conditional prior needs coarser-level samples in the DB "
        "(and vice versa)"
    )

    if args.sampler == "cached" and args.use_model == "pixelcnn":
        sampler = make_cached_sampler(model, dims, args.batch_size, tau=args.tau)
    elif args.sampler == "cached":  # pixelsnail: KV-cached attention sampler
        sampler = make_cached_snail_sampler(model, dims, args.batch_size, tau=args.tau)
    else:
        sampler = make_ancestral_sampler(model, dims, args.batch_size, tau=args.tau)
    rng = jax.random.PRNGKey(args.seed)

    for i in range(args.num_samples // args.batch_size):
        rng, sub = jax.random.split(rng)
        if has_cond_pool:
            cond_uuids = get_condition_uuids(db, args.level, args.batch_size)
            cond = jnp.asarray(get_conditions(db, args.level, cond_uuids))
            grids = sampler(state.params, sub, cond)
        else:
            cond_uuids = None
            grids = sampler(state.params, sub)
        add_samples(db, args.level, np.asarray(grids), cond_uuids)
        print(f"batch {i}: sampled {len(grids)} grids at level {args.level}")

    save_db(db, args.db_path, args.level)
    print(f"saved {len(db[args.level])} total level-{args.level} samples")


if __name__ == "__main__":
    main(parse_arguments())
