#!/usr/bin/env bash
# Downscaled 2-level 256x256x128 VQ-VAE — published config of
# slurm-jobs/train_vqvae_3d_downscaled.job:74-88.
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(jax.device_count())')}"
LR="${LR:-$(python -c "print(1e-4 * ${BATCH} / 4)")}"
python -m vqvae3d_tpu.cli.train_vqvae "$DATASET_DIR" \
  --batch-size "$BATCH" \
  --input-channels 1 \
  --metric huber \
  --base-lr "$LR" \
  --n-bottleneck-blocks 2 \
  --num-embeddings 128 256 \
  --block-type pre-activation \
  --n-pre-quantization-blocks 150 \
  --n-post-quantization-blocks 150 \
  --n-post-upscale-blocks 5 \
  --n-post-downscale-blocks 5 \
  --rescale-input 256 256 128 \
  --ckpt-dir "$CKPT_ROOT/vqvae_downscaled" --resume \
  $MULTIHOST_ARGS "$@"
