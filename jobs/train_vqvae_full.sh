#!/usr/bin/env bash
# Full 3-level 512x512x128 VQ-VAE — published config of
# slurm-jobs/train_vqvae_3d.job:74-88 (6 nodes x 4 TitanRTX, batch 1/GPU,
# lr = N_nodes e-4 i.e. 1e-4 per 4-GPU node; huber loss).
# On TPU: batch 1 per chip; scale --base-lr with global batch / 4.
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(jax.device_count())')}"
LR="${LR:-$(python -c "print(1e-4 * ${BATCH} / 4)")}"
python -m vqvae3d_tpu.cli.train_vqvae "$DATASET_DIR" \
  --batch-size "$BATCH" \
  --input-channels 1 \
  --metric huber \
  --base-lr "$LR" \
  --num-embeddings 128 256 512 \
  --block-type pre-activation \
  --n-bottleneck-blocks 3 \
  --n-pre-quantization-blocks 50 \
  --n-post-quantization-blocks 50 \
  --n-post-upscale-blocks 3 \
  --n-post-downscale-blocks 2 \
  --stem-space-to-depth 2 --base-network-channels 8 \
  --ckpt-dir "$CKPT_ROOT/vqvae_full" --resume \
  $MULTIHOST_ARGS "$@"
# --stem-space-to-depth 2 / base 8 is the TPU-native stem: identical code
# grids/codebooks to the reference stem, but no <8-channel tensor at 512-res
# (XLA lane-padding pathology; see PERF.md). Pass
# --stem-space-to-depth 1 --base-network-channels 4 for the literal stem.
