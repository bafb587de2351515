#!/usr/bin/env bash
# Level-2 (bottom/coarsest, 8x8x2) PixelCNN —
# slurm-jobs/train_pixelcnn_bottom.job:76-90: 50 blocks x 512d,
# unconditional, dropout 0.5, batch 6/GPU, lr = 1e-5/node.
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(6 * jax.device_count())')}"
LR="${LR:-$(python -c "print(1e-5 * ${BATCH} / 24)")}"
python -m vqvae3d_tpu.cli.train_prior "$CODES_DIR" 2 \
  --use-model pixelcnn \
  --batch-size "$BATCH" \
  --lr "$LR" \
  --num-resblocks 50 \
  --model-dim 512 \
  --dropout-prob 0.5 \
  --use-conditioning False \
  --bottleneck-divisor 4 \
  --use-concat-activation False \
  --ckpt-dir "$CKPT_ROOT/pixelcnn_bottom" --resume \
  $MULTIHOST_ARGS "$@"
