#!/usr/bin/env bash
# Stage 2: dump per-level code grids to the LMDB-compatible code store
# (slurm-jobs/extract_embeddings.job; reference hard-codes
# rescale-input 256 256 128, extract_embeddings.py:54).
source "$(dirname "$0")/_common.sh"
VQVAE_CKPT="${VQVAE_CKPT:-$CKPT_ROOT/vqvae_full/best}"
python -m vqvae3d_tpu.cli.extract_embeddings \
  --checkpoint-path "$VQVAE_CKPT" \
  --dataset-path "$DATASET_DIR" \
  --output-path "$(dirname "$CODES_DIR")" \
  --output-name "$(basename "$CODES_DIR")" \
  --rescale-input 256 256 128 "$@"
