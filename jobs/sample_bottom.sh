#!/usr/bin/env bash
# Ancestral sampling, coarsest level first —
# slurm-jobs/sample_embeddings_bottom.job: size 8 8 2, 20 samples, tau 0.1.
source "$(dirname "$0")/_common.sh"
PRIOR_CKPT="${PRIOR_CKPT:-$CKPT_ROOT/pixelcnn_bottom/best}"
python -m vqvae3d_tpu.cli.sample_embeddings \
  --model-checkpoint "$PRIOR_CKPT" \
  --db-path "$SAMPLE_DB" \
  --level 2 \
  --size 8 8 2 \
  --num-samples 20 \
  --batch-size 20 \
  --tau 0.1 "$@"
