"""Stage-1 CLI: train the hierarchical 3D VQ-VAE on CT volumes.

TPU-native re-design of /root/reference/vqvae/train.py: same argparse
surface (model args + --rescale-input + --batch-size + dataset_path,
seed 42, checkpoint best-on-val_recon_loss_mean + last) with a jitted,
mesh-sharded train step instead of Lightning DDP.

Example:
    python -m vqvae3d_tpu.cli.train_vqvae /data/ct \
        --batch-size 1 --num-embeddings 128 256 512 \
        --n-pre-quantization-blocks 50 --n-post-quantization-blocks 50 \
        --n-post-upscale-blocks 3 --n-post-downscale-blocks 2 \
        --max-steps 100000 --ckpt-dir ckpts/vqvae
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.cli.common import MetricLogger, add_dataclass_args, dataclass_from_args
from vqvae3d_tpu.data.ct_dataset import CTDataModule
from vqvae3d_tpu.models.vqvae import VQVAE, VQVAEConfig
from vqvae3d_tpu.parallel.mesh import make_data_mesh, make_mesh
from vqvae3d_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from vqvae3d_tpu.train.state import create_vqvae_train_state
from vqvae3d_tpu.train.vqvae_train import make_eval_step, make_train_step
from vqvae3d_tpu.data.device_feed import device_prefetch
from vqvae3d_tpu.utils.profiling import StepTimer


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser = add_dataclass_args(parser, VQVAEConfig)
    parser.add_argument("dataset_path", type=Path)
    parser.add_argument("--rescale-input", type=int, nargs="+", default=None)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--max-steps", type=int, default=int(1e5))
    parser.add_argument("--val-every-steps", type=int, default=0,
                        help="0 = validate every half train epoch "
                             "(reference val_check_interval=0.5)")
    parser.add_argument("--log-every-n-steps", type=int, default=50)
    parser.add_argument("--ckpt-dir", type=str, default="ckpts/vqvae")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num-workers", type=int, default=5)
    parser.add_argument("--mesh-shape", type=int, nargs="+", default=None,
                        help="e.g. '4 2' for a (data, space) mesh; default 1-D data mesh")
    parser.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 10-15 here")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (one process per host)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port for --multihost")
    parser.add_argument("--scan-size", type=int, nargs=2, default=[512, 512],
                        help="expected (H, W) of input scans; others are dropped")
    parser.add_argument("--output-depth", type=int, default=128,
                        help="depth volumes are zero-padded/truncated to "
                             "(reference DepthPadAndCrop(128), "
                             "load_nrrd_dataset.py:27-44)")
    parser.add_argument("--volume-cache", type=str, default=None,
                        help="decode-once volume cache dir: preprocessed "
                             "(folded, normalized) volumes are written on "
                             "first read, later epochs pay only a raw read "
                             "— the TPU-native analog of the reference's "
                             "node-local scratch staging "
                             "(train_vqvae_3d.job:93-96). Also via "
                             "VQVAE3D_VOLUME_CACHE")
    return parser.parse_args(argv)


def main(args):
    from vqvae3d_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "multihost", False):
        from vqvae3d_tpu.parallel.multihost import initialize_multihost

        initialize_multihost(coordinator_address=args.coordinator)
    np.random.seed(args.seed)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    config = dataclass_from_args(VQVAEConfig, args, overrides={"dtype": dtype})
    model = VQVAE(config)

    dm = CTDataModule(
        str(args.dataset_path),
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        rescale_input=tuple(args.rescale_input) if args.rescale_input else None,
        seed=args.seed,
        size=(*args.scan_size, None),
        output_depth=args.output_depth,
        cache_dir=args.volume_cache,
    )
    print(f"dataset: {dm.train_len} train / {dm.val_len} val scans")
    assert dm.train_len >= args.batch_size, "not enough scans for one batch"
    # multi-process: each process decodes 1/process_count of every global
    # batch; shard_batch reassembles the logical global array (the per-rank
    # DistributedSampler + DDP of reference vqvae/train.py:27)
    proc_kw = dict(
        process_index=jax.process_index(), process_count=jax.process_count()
    )
    assert args.batch_size % jax.process_count() == 0, (
        "global batch size must divide evenly over processes"
    )
    primary = jax.process_index() == 0

    if args.mesh_shape and len(args.mesh_shape) == 2:
        mesh = make_mesh(tuple(args.mesh_shape), ("data", "space"))
    else:
        mesh = make_data_mesh(args.batch_size)
    print(f"mesh: {mesh}")

    sample = next(iter(dm.train_dataloader(**proc_kw)))
    state = create_vqvae_train_state(
        model, jax.random.PRNGKey(args.seed), jnp.zeros_like(sample["volume"])
    )
    if args.resume and latest_step(args.ckpt_dir) is not None:
        state = restore_checkpoint(args.ckpt_dir, state)
        print(f"resumed from step {int(state.step)}")

    train_step = make_train_step(model, mesh=mesh)
    eval_step = make_eval_step(model, mesh=mesh)
    logger = MetricLogger(args.ckpt_dir)

    val_every = args.val_every_steps or max(1, dm.train_len // (2 * args.batch_size))
    best_val = float("inf")
    timer = StepTimer()
    step = int(state.step)
    epoch = 0

    # pre-fold train batches to the stem's s2d layout on the decode threads
    # (the in-jit fold is a C=1-minor relayout costing ~19 ms/step at
    # 512-res); eval keeps full resolution (slice-SSIM needs it)
    fold = int(getattr(model.config, "stem_space_to_depth", 1) or 1)

    with mesh:
        while step < args.max_steps:
            for batch in device_prefetch(
                dm.train_dataloader(epoch=epoch, fold=fold, **proc_kw), mesh=mesh
            ):
                with timer:
                    state, log = train_step(state, batch)
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
                        eval_step(state, vb)
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
                        save_checkpoint(args.ckpt_dir, state, config=config, max_to_keep=1)
                        if mean_log["recon_loss_mean"] < best_val:
                            best_val = mean_log["recon_loss_mean"]
                            save_checkpoint(
                                Path(args.ckpt_dir) / "best", state,
                                config=config, max_to_keep=1,
                            )
                if step >= args.max_steps:
                    break
            epoch += 1

    save_checkpoint(args.ckpt_dir, state, config=config, max_to_keep=1)
    print(f"done at step {step}; best val_recon_loss_mean={best_val:.5g}")
    return state


if __name__ == "__main__":
    main(parse_arguments())
