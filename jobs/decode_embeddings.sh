#!/usr/bin/env bash
# Final stage: sampled code grids -> decoder -> .nrrd CT volumes
# (reference vqvae/decode_embeddings.py; spacings (0.976, 0.976, 3)).
source "$(dirname "$0")/_common.sh"
VQVAE_CKPT="${VQVAE_CKPT:-$CKPT_ROOT/vqvae_full/best}"
OUT="${OUT:-$CKPT_ROOT/decoded/sample}"
mkdir -p "$(dirname "$OUT")"
python -m vqvae3d_tpu.cli.decode_embeddings \
  "$SAMPLE_DB" "$VQVAE_CKPT" "$OUT" \
  --volume-shape 512 512 128 "$@"
