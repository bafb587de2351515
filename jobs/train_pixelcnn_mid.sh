#!/usr/bin/env bash
# Level-1 (mid, 32x32x8) PixelCNN — slurm-jobs/train_pixelcnn_mid.job:75-87:
# 45 blocks x 256d, conditioned, dropout 0.5, batch 2/GPU, lr = 1e-4/node.
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(2 * jax.device_count())')}"
LR="${LR:-$(python -c "print(1e-4 * ${BATCH} / 8)")}"
python -m vqvae3d_tpu.cli.train_prior "$CODES_DIR" 1 \
  --use-model pixelcnn \
  --batch-size "$BATCH" \
  --lr "$LR" \
  --num-resblocks 45 \
  --model-dim 256 \
  --dropout-prob 0.5 \
  --use-conditioning True \
  --bottleneck-divisor 4 \
  --ckpt-dir "$CKPT_ROOT/pixelcnn_mid" --resume \
  $MULTIHOST_ARGS "$@"
