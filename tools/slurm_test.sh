#!/usr/bin/env bash
# Slurm eval launcher (CLI contract of reference tools/slurm_test.sh):
#   ./tools/slurm_test.sh PARTITION JOB_NAME CONFIG CKPT [EXTRA_ARGS...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CKPT=$4
shift 4

SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes=1 \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
