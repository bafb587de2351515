#!/usr/bin/env bash
# Level-1 PixelSNAIL (downscaled pipeline) —
# slurm-jobs/train_pixelsnail_mid_downscaled.job:76-91: 8 blocks x 5 layers
# x 256d, unconditional, causal dropout 0.2, mixup 0.2, batch 1, lr 5e-5.
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(jax.device_count())')}"
LR="${LR:-$(python -c "print(5e-5 * ${BATCH} / 4)")}"
python -m vqvae3d_tpu.cli.train_prior "$CODES_DIR" 1 \
  --use-model pixelsnail \
  --batch-size "$BATCH" \
  --lr "$LR" \
  --model-dim 256 \
  --causal-dropout-prob 0.2 \
  --attention-dropout-prob 0.0 \
  --use-conditioning False \
  --num-layers-per-block 5 \
  --num-blocks 8 \
  --mixup-alpha 0.2 \
  --ckpt-dir "$CKPT_ROOT/pixelsnail_mid_downscaled" --resume \
  $MULTIHOST_ARGS "$@"
