"""On-TPU stage-2 (prior) convergence smoke (VERDICT r4 #4): several
hundred real steps of the PUBLISHED top-prior config (PixelCNN 50 x 16d,
conditioned — slurm-jobs/train_pixelcnn_top.job:76-90, grid 128x128x32)
on structured synthetic code grids, logging loss/bits-per-dim/accuracy to
JSONL, with a checkpoint save + FRESH-PROCESS restore-resume.

The reference proves its priors train only implicitly (published prior
checkpoints, /root/reference/README.md:6-14; 1-day x 4-GPU jobs). This is
the explicit counterpart: bits/dim must fall well below log2(K)=7 and
teacher-forced accuracy must rise well above 1/128.

Synthetic codes: per-sample smooth random fields (low-res normal noise,
trilinearly upsampled) quantized into K bins by equal-probability
thresholds -> spatially-correlated grids a causal prior can actually
learn; the condition grid is the same field quantized at the coarse
resolution into K_cond bins, so conditioning carries real information.

Why not `cli.train_prior` directly: same reason as convergence_smoke.py —
the CLI path is exercised end-to-end by the verify pipeline and
tests/test_e2e_pipeline at smaller configs; this uses the same
make_prior_train_step the CLI jits.

Usage:
    python tools/prior_convergence_smoke.py --out /tmp/prior_conv \
        --steps 300            # leg 1: 0 -> 300, saves checkpoint
    python tools/prior_convergence_smoke.py --out /tmp/prior_conv \
        --resume-steps 200     # leg 2 (fresh process): 300 -> 500
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _upsample_np(lo: np.ndarray, dims) -> np.ndarray:
    """Cheap trilinear-ish upsample: np.repeat (nearest) + box smooth along
    each axis — smooth enough for spatial correlation, cheap on one core."""
    f = [dims[i] // lo.shape[i] for i in range(3)]
    up = lo
    for ax, fa in enumerate(f):
        up = np.repeat(up, fa, axis=ax)
    # one box-smoothing pass per axis (moving average, window = factor)
    for ax, fa in enumerate(f):
        if fa <= 1:
            continue
        kernel = np.ones(fa, np.float32) / fa
        up = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="same"), ax, up
        )
    return up[: dims[0], : dims[1], : dims[2]]


def synth_codes(seed: int, dims, k: int, cond_dims, k_cond: int):
    rng = np.random.default_rng(seed)
    lo = rng.normal(
        size=(max(dims[0] // 8, 1), max(dims[1] // 8, 1), max(dims[2] // 4, 1))
    ).astype(np.float32)
    field = _upsample_np(lo, dims) + 0.15 * rng.normal(size=dims).astype(
        np.float32
    )
    # equal-probability bins via per-sample quantiles
    qs = np.quantile(field, np.linspace(0, 1, k + 1)[1:-1])
    data = np.searchsorted(qs, field).astype(np.int32)
    cfield = field.reshape(
        cond_dims[0], dims[0] // cond_dims[0],
        cond_dims[1], dims[1] // cond_dims[1],
        cond_dims[2], dims[2] // cond_dims[2],
    ).mean(axis=(1, 3, 5))
    cqs = np.quantile(cfield, np.linspace(0, 1, k_cond + 1)[1:-1])
    cond = np.searchsorted(cqs, cfield).astype(np.int32)
    return data, cond


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/prior_conv")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--resume-steps", type=int, default=200)
    p.add_argument("--n-samples", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=50)
    args = p.parse_args()

    from vqvae3d_tpu.cli.common import MetricLogger, enable_compilation_cache
    from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
    from vqvae3d_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from vqvae3d_tpu.train.prior_train import (
        create_prior_train_state,
        make_prior_eval_step,
        make_prior_train_step,
    )

    enable_compilation_cache()
    dims, cond_dims = (128, 128, 32), (32, 32, 8)
    cfg = PixelCNNConfig(
        input_dim=128,
        condition_dim=256,
        model_dim=16,
        num_resblocks=50,
        dropout_prob=0.0,
        lr=args.lr,
        dtype=jnp.bfloat16,
    )
    model = PixelCNN(cfg)

    print(f"generating {args.n_samples} synthetic code samples...", flush=True)
    samples = [
        synth_codes(1000 + i, dims, cfg.input_dim, cond_dims, cfg.condition_dim)
        for i in range(args.n_samples)
    ]
    heldout = synth_codes(9999, dims, cfg.input_dim, cond_dims, cfg.condition_dim)

    state = create_prior_train_state(
        model, jax.random.PRNGKey(0),
        {"data": samples[0][0][None], "condition": samples[0][1][None]},
    )
    resumed = latest_step(args.out) is not None
    if resumed:
        state = restore_checkpoint(args.out, state)
        print(f"RESUMED from step {int(state.step)}", flush=True)

    train_step = make_prior_train_step(model, donate=False)
    eval_step = make_prior_eval_step(model)
    logger = MetricLogger(args.out)
    rng = jax.random.PRNGKey(7)

    target = int(state.step) + (args.resume_steps if resumed else args.steps)
    step = int(state.step)
    t0 = time.perf_counter()
    while step < target:
        data, cond = samples[step % len(samples)]
        batch = {
            "data": jnp.asarray(data[None]),
            "condition": jnp.asarray(cond[None]),
        }
        t_step = time.perf_counter()
        state, log = train_step(state, batch, rng)
        step = int(state.step)  # blocks on the step
        dt = time.perf_counter() - t_step
        if step % args.log_every == 0 or step == 1:
            flat = logger.log(step, log, prefix="train")
            flat["wall_step_ms"] = round(dt * 1e3, 1)
            print(
                f"[step {step}] loss={flat['train_loss_mean']:.4f} "
                f"bits/dim={flat['train_bits_per_dim']:.4f} ({dt:.2f}s)",
                flush=True,
            )
        if step % args.eval_every == 0 or step == target:
            ev = eval_step(
                state,
                {
                    "data": jnp.asarray(heldout[0][None]),
                    "condition": jnp.asarray(heldout[1][None]),
                },
            )
            flat = logger.log(step, ev, prefix="val")
            print(
                f"[step {step}] VAL bits/dim={flat['val_bits_per_dim']:.4f} "
                f"acc={flat['val_accuracy']:.4f} (chance {1/cfg.input_dim:.4f})",
                flush=True,
            )
    save_checkpoint(args.out, state, config=cfg, max_to_keep=2)
    print(
        f"done at step {step} in {time.perf_counter()-t0:.0f}s; "
        f"checkpoint saved to {args.out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
