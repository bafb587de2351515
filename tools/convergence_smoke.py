"""On-TPU convergence smoke (VERDICT r3 #5): several hundred real steps
of the published downscaled 2-layer config on synthetic CT-like volumes,
logging loss + per-level codebook perplexity/utilization to JSONL, with a
mid-run checkpoint-save + restore-resume.

Why not `cli.train_vqvae` directly: this environment's remote compile
helper SIGKILLs (OOM) on the CLI's mesh-sharded formulation of the
150+150-block step (reproduced twice), while the mesh-free
`make_train_step(model)` formulation of the SAME model/config (the one
tools/profile_step.py compiles) builds reliably. The step semantics are
identical (vqvae_train.make_train_step); the CLI path itself is
exercised end-to-end by the verify pipeline and tests/test_e2e_pipeline
at smaller configs.

Usage:
    python tools/convergence_smoke.py --data /tmp/ct_conv \
        --out /tmp/conv_run --steps 300 --resume-steps 200
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/ct_conv")
    p.add_argument("--out", default="/tmp/conv_run")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--resume-steps", type=int, default=200)
    p.add_argument("--blocks", type=int, default=150)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--workers", type=int, default=5)
    args = p.parse_args()

    from vqvae3d_tpu.cli.common import MetricLogger, enable_compilation_cache
    from vqvae3d_tpu.data.ct_dataset import CTDataModule
    from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
    from vqvae3d_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from vqvae3d_tpu.train.state import create_vqvae_train_state
    from vqvae3d_tpu.train.vqvae_train import make_train_step

    enable_compilation_cache()
    cfg = VQVAEConfig(
        n_bottleneck_blocks=2,
        num_embeddings=(128, 256),
        n_pre_quantization_blocks=args.blocks,
        n_post_quantization_blocks=args.blocks,
        n_post_upscale_blocks=5,
        n_post_downscale_blocks=5,
        dtype=jnp.bfloat16,
        stem_space_to_depth=2,
        base_network_channels=8,
        base_lr=args.lr,
    )
    model = VQVAE(cfg)
    dm = CTDataModule(
        args.data,
        batch_size=1,
        train_frac=1.0,
        num_workers=args.workers,
        rescale_input=(256, 256, 128),
        size=(512, 512, None),
    )
    print(f"dataset: {dm.train_len} scans", flush=True)
    fold = cfg.stem_space_to_depth

    # init on the UNFOLDED logical shape (the model's init path applies
    # its internal s2d stem; train batches arrive pre-folded)
    state = create_vqvae_train_state(
        model, jax.random.PRNGKey(42),
        jnp.zeros((1, 256, 256, 128, 1), jnp.bfloat16),
    )
    if latest_step(args.out) is not None:
        state = restore_checkpoint(args.out, state)
        print(f"RESUMED from step {int(state.step)}", flush=True)

    # the mesh-free formulation profile_step.py proves compilable here
    train_step = make_train_step(model, donate=False)
    logger = MetricLogger(args.out)

    target = int(state.step) + (
        args.steps if int(state.step) == 0 else args.resume_steps
    )
    step = int(state.step)
    t0 = time.perf_counter()
    epoch = 0
    while step < target:
        for batch in dm.train_dataloader(epoch=epoch, fold=fold):
            batch = {
                "volume": jnp.asarray(batch["volume"], jnp.bfloat16),
                "num_valid_slices": jnp.asarray(batch["num_valid_slices"]),
            }
            t_step = time.perf_counter()
            state, log = train_step(state, batch)
            step = int(state.step)  # blocks on the step
            dt = time.perf_counter() - t_step
            if step % args.log_every == 0 or step == 1:
                flat = logger.log(step, log, prefix="train")
                flat["wall_step_ms"] = round(dt * 1e3, 1)
                keys = (
                    "train_loss", "train_recon_loss_mean",
                    "train_commitment_loss", "train_codebook_perplexity_0",
                    "train_codebook_perplexity_1", "train_codebook_util_0",
                    "train_codebook_util_1",
                )
                msg = " ".join(
                    f"{k.removeprefix('train_')}={flat[k]:.4g}"
                    for k in keys if k in flat
                )
                print(f"[step {step}] {msg} ({dt:.2f}s)", flush=True)
            if step >= target:
                break
        epoch += 1
    save_checkpoint(args.out, state, config=cfg, max_to_keep=2)
    print(
        f"done at step {step} in {time.perf_counter()-t0:.0f}s; "
        f"checkpoint saved to {args.out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
