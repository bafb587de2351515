#!/usr/bin/env bash
# slurm-jobs/sample_embeddings_mid.job: size 32 32 8, 10 samples, tau 0.1,
# conditioned on level-2 samples already in the DB.
source "$(dirname "$0")/_common.sh"
PRIOR_CKPT="${PRIOR_CKPT:-$CKPT_ROOT/pixelcnn_mid/best}"
python -m vqvae3d_tpu.cli.sample_embeddings \
  --model-checkpoint "$PRIOR_CKPT" \
  --db-path "$SAMPLE_DB" \
  --level 1 \
  --size 32 32 8 \
  --num-samples 10 \
  --batch-size 10 \
  --tau 0.1 "$@"
