#!/usr/bin/env bash
# slurm-jobs/sample_embeddings_top.job: size 128 128 32, 1 sample, tau 0.1,
# conditioned on level-1 samples.
source "$(dirname "$0")/_common.sh"
PRIOR_CKPT="${PRIOR_CKPT:-$CKPT_ROOT/pixelcnn_top/best}"
python -m vqvae3d_tpu.cli.sample_embeddings \
  --model-checkpoint "$PRIOR_CKPT" \
  --db-path "$SAMPLE_DB" \
  --level 0 \
  --size 128 128 32 \
  --num-samples 1 \
  --batch-size 1 \
  --tau 0.1 "$@"
