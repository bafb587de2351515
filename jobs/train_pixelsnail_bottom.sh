#!/usr/bin/env bash
# Level-2 PixelSNAIL — slurm-jobs/train_pixelsnail_bottom.job:76-91:
# 3 blocks x 5 layers x 512d, unconditional, causal dropout 0.5,
# attention dropout 0, mixup alpha 0.4, batch 6/GPU, lr = 1e-4/node.
source "$(dirname "$0")/_common.sh"
BATCH="${BATCH:-$(python -c 'import jax; print(6 * jax.device_count())')}"
LR="${LR:-$(python -c "print(1e-4 * ${BATCH} / 24)")}"
python -m vqvae3d_tpu.cli.train_prior "$CODES_DIR" 2 \
  --use-model pixelsnail \
  --batch-size "$BATCH" \
  --lr "$LR" \
  --model-dim 512 \
  --causal-dropout-prob 0.5 \
  --attention-dropout-prob 0.0 \
  --use-conditioning False \
  --num-layers-per-block 5 \
  --num-blocks 3 \
  --mixup-alpha 0.4 \
  --ckpt-dir "$CKPT_ROOT/pixelsnail_bottom" --resume \
  $MULTIHOST_ARGS "$@"
