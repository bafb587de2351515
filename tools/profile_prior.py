"""Profile a stage-2 (prior) train step and print the per-op breakdown.

Usage:
    python tools/profile_prior.py --config top            # PixelCNN 50x16d
    python tools/profile_prior.py --config mid|bottom     # PixelSNAIL
    python tools/profile_prior.py --config top --eval

Published configs mirror bench_prior.py (slurm-jobs/train_pixelcnn_top.job,
train_pixelsnail_mid.job, train_pixelsnail_bottom.job).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_step import analyze_xplane  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="top", choices=("top", "mid", "bottom"))
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-dir", type=str, default=None)
    return p.parse_args()


def build(config: str, batch: int | None):
    """Returns (model, grid, cond_grid, batch)."""
    if config == "top":
        from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig

        cfg = PixelCNNConfig(
            input_dim=128, condition_dim=256, model_dim=16,
            num_resblocks=50, dropout_prob=0.0, dtype=jnp.bfloat16,
        )
        return PixelCNN(cfg), (128, 128, 32), (32, 32, 8), batch or 1
    if config == "mid":
        from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig

        cfg = PixelSNAILConfig(
            input_dim=256, condition_dim=512, model_dim=256,
            num_blocks=8, num_layers_per_block=5, dtype=jnp.bfloat16,
        )
        return PixelSNAIL(cfg), (32, 32, 8), (8, 8, 2), batch or 1
    from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig

    cfg = PixelSNAILConfig(
        input_dim=512, condition_dim=0, model_dim=512,
        num_blocks=3, num_layers_per_block=5, mixup_alpha=0.4,
        dtype=jnp.bfloat16,
    )
    return PixelSNAIL(cfg), (8, 8, 2), None, batch or 6


def main():
    args = parse_args()
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from vqvae3d_tpu.train.prior_train import (
        create_prior_train_state,
        make_prior_eval_step,
        make_prior_train_step,
    )

    model, grid, cond_grid, batch = build(args.config, args.batch)
    cfg = model.config
    rng = np.random.default_rng(0)
    batch_d = {
        "data": jnp.asarray(rng.integers(0, cfg.input_dim, (batch, *grid)), jnp.int32)
    }
    if cfg.use_conditioning:
        batch_d["condition"] = jnp.asarray(
            rng.integers(0, cfg.condition_dim, (batch, *cond_grid)), jnp.int32
        )
    state = create_prior_train_state(model, jax.random.PRNGKey(0), batch_d)
    rng_j = jax.random.PRNGKey(1)

    if args.eval:
        step_fn = make_prior_eval_step(model)
        run = lambda s, b: step_fn(s, b)
    else:
        train_step = make_prior_train_step(model, donate=False)
        run = lambda s, b: train_step(s, b, rng_j)[0]

    t0 = time.perf_counter()
    out = run(state, batch_d)
    jax.block_until_ready(out)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    if args.eval:
        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                log = step_fn(state, batch_d)
                float(log["loss_mean"])
            return time.perf_counter() - t0
    else:
        def timed(n):
            s = state
            t0 = time.perf_counter()
            for _ in range(n):
                s, log = train_step(s, batch_d, rng_j)
            float(log["loss_mean"])
            return time.perf_counter() - t0

    timed(1)
    t_lo = timed(args.steps)
    t_hi = timed(3 * args.steps)
    dt = max((t_hi - t_lo) / (2 * args.steps), 1e-6)
    print(f"step time: {dt*1e3:.1f} ms (chained+readback slope)", flush=True)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        out = run(state, batch_d)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    analyze_xplane(trace_dir, args.top)
    print(f"\n(per-op totals cover 2 traced steps; trace: {trace_dir})")


if __name__ == "__main__":
    main()
