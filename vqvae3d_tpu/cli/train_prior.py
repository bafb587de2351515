"""Stage-2 CLI: train a PixelCNN/PixelSNAIL prior on one code-grid level.

Mirrors /root/reference/pixel_model/train.py: two-phase parsing on
--use-model, level selection, num_embeddings = [input_dim, condition_dim]
read from the code store, checkpoint best-on-val_loss_mean + last.

Example:
    python -m vqvae3d_tpu.cli.train_prior codes/ 2 --use-model pixelcnn \
        --model-dim 512 --num-resblocks 50 --batch-size 16
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.cli.common import MetricLogger, add_dataclass_args, dataclass_from_args
from vqvae3d_tpu.data.code_store import CodeDataModule
from vqvae3d_tpu.models.pixelcnn import PixelCNN, PixelCNNConfig
from vqvae3d_tpu.models.pixelsnail import PixelSNAIL, PixelSNAILConfig
from vqvae3d_tpu.parallel.mesh import make_data_mesh
from vqvae3d_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from vqvae3d_tpu.train.prior_train import (
    create_prior_train_state,
    make_prior_eval_step,
    make_prior_train_step,
)
from vqvae3d_tpu.data.device_feed import device_prefetch
from vqvae3d_tpu.utils.profiling import StepTimer

MODELS = {
    "pixelcnn": (PixelCNN, PixelCNNConfig),
    "pixelsnail": (PixelSNAIL, PixelSNAILConfig),
}


def parse_arguments(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--use-model", choices=list(MODELS), default="pixelcnn")
    known, _ = pre.parse_known_args(argv)

    parser = argparse.ArgumentParser(description=__doc__, parents=[pre])
    _, cfg_cls = MODELS[known.use_model]
    parser = add_dataclass_args(
        parser, cfg_cls, skip=("dtype", "input_dim", "condition_dim")
    )
    parser.add_argument("dataset_path", type=Path)
    parser.add_argument("level", type=int, help="hierarchy level to train (0=finest)")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--max-steps", type=int, default=int(5e4))
    parser.add_argument("--val-every-steps", type=int, default=0)
    parser.add_argument("--log-every-n-steps", type=int, default=50)
    parser.add_argument("--ckpt-dir", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 10-15 here")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (one process per host)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port for --multihost")
    parser.add_argument("--use-conditioning", type=str, default="True")
    return parser.parse_args(argv)


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "multihost", False):
        from vqvae3d_tpu.parallel.multihost import initialize_multihost

        initialize_multihost(coordinator_address=args.coordinator)
    model_cls, cfg_cls = MODELS[args.use_model]
    dm = CodeDataModule(
        str(args.dataset_path),
        embedding_id=args.level,
        batch_size=args.batch_size,
        seed=args.seed,
    )
    input_dim, condition_dim = dm.num_embeddings
    use_cond = args.use_conditioning in ("True", "true", "1") and condition_dim > 0

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    config = dataclass_from_args(
        cfg_cls,
        args,
        overrides={
            "input_dim": input_dim,
            "condition_dim": condition_dim if use_cond else 0,
            "dtype": dtype,
        },
        skip=("dtype", "input_dim", "condition_dim"),
    )
    model = model_cls(config)

    ckpt_dir = args.ckpt_dir or f"ckpts/{args.use_model}_level{args.level}"
    mesh = make_data_mesh(args.batch_size)
    print(f"mesh: {mesh}; model: {args.use_model}; "
          f"input_dim={input_dim} condition_dim={config.condition_dim}")
    proc_kw = dict(
        process_index=jax.process_index(), process_count=jax.process_count()
    )
    assert args.batch_size % jax.process_count() == 0, (
        "global batch size must divide evenly over processes"
    )
    primary = jax.process_index() == 0

    sample = next(iter(dm.train_dataloader(**proc_kw)))
    if not use_cond:
        sample.pop("condition", None)
    state = create_prior_train_state(model, jax.random.PRNGKey(args.seed), sample)
    if args.resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"resumed from step {int(state.step)}")

    train_step = make_prior_train_step(model, mesh=mesh)
    eval_step = make_prior_eval_step(model, mesh=mesh)
    logger = MetricLogger(ckpt_dir)
    rng = jax.random.PRNGKey(args.seed + 1)

    val_every = args.val_every_steps or max(
        1, len(dm.train_indices) // (2 * args.batch_size)
    )
    best_val = float("inf")
    timer = StepTimer()
    step = int(state.step)
    epoch = 0

    def clean(batch):
        if not use_cond:
            batch.pop("condition", None)
        return batch

    with mesh:
        while step < args.max_steps:
            for batch in device_prefetch(
                dm.train_dataloader(epoch=epoch, **proc_kw), mesh=mesh
            ):
                with timer:
                    state, log = train_step(state, clean(batch), rng)
                step = int(state.step)
                if args.profile_dir and step == 10:
                    jax.profiler.start_trace(args.profile_dir)
                if args.profile_dir and step == 15:
                    jax.profiler.stop_trace()
                if primary and step % args.log_every_n_steps == 0:
                    flat = logger.log(step, log, prefix="train")
                    flat["step_ms"] = timer.mean_ms
                    logger.print(step, flat)
                if step % val_every == 0 or step >= args.max_steps:
                    val_logs = [
                        eval_step(state, clean(vb))
                        for vb in device_prefetch(
                            dm.val_dataloader(**proc_kw), mesh=mesh
                        )
                    ]
                    if val_logs:
                        mean_log = {
                            k: np.mean([float(v[k]) for v in val_logs])
                            for k in val_logs[0]
                        }
                        if primary:
                            flat = logger.log(step, mean_log, prefix="val")
                            logger.print(step, flat)
                        save_checkpoint(ckpt_dir, state, config=config, max_to_keep=1)
                        if mean_log["loss_mean"] < best_val:
                            best_val = mean_log["loss_mean"]
                            save_checkpoint(
                                Path(ckpt_dir) / "best", state,
                                config=config, max_to_keep=1,
                            )
                if step >= args.max_steps:
                    break
            epoch += 1

    save_checkpoint(ckpt_dir, state, config=config, max_to_keep=1)
    print(f"done at step {step}; best val_loss_mean={best_val:.5g}")
    return state


if __name__ == "__main__":
    main(parse_arguments())
