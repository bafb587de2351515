# Shared env for all job recipes. Source from each script.
set -euo pipefail
DATASET_DIR="${DATASET_DIR:?set DATASET_DIR to the NRRD dataset root}"
CKPT_ROOT="${CKPT_ROOT:-./ckpts}"
CODES_DIR="${CODES_DIR:-$CKPT_ROOT/codes}"
SAMPLE_DB="${SAMPLE_DB:-$CKPT_ROOT/samples.db}"
# Multi-host pods: MULTIHOST=1 COORD=host:port (run one copy per host)
MULTIHOST_ARGS=""
if [ "${MULTIHOST:-0}" = "1" ]; then
  MULTIHOST_ARGS="--multihost --coordinator ${COORD:?set COORD=host:port}"
fi
