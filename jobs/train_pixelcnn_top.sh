#!/usr/bin/env bash
# Level-0 (top/finest, 128x128x32 grid) PixelCNN —
# slurm-jobs/train_pixelcnn_top.job:76-90: 50 blocks x 16d, conditioned,
# dropout 0, batch 1/GPU, lr = 5e-5 per node (4 GPUs).
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(jax.device_count())')}"
LR="${LR:-$(python -c "print(5e-5 * ${BATCH} / 4)")}"
python -m vqvae3d_tpu.cli.train_prior "$CODES_DIR" 0 \
  --use-model pixelcnn \
  --batch-size "$BATCH" \
  --lr "$LR" \
  --num-resblocks 50 \
  --model-dim 16 \
  --dropout-prob 0 \
  --use-conditioning True \
  --bottleneck-divisor 4 \
  --use-concat-activation False \
  --ckpt-dir "$CKPT_ROOT/pixelcnn_top" --resume \
  $MULTIHOST_ARGS "$@"
