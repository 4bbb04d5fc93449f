#!/usr/bin/env bash
# Slurm launcher (CLI contract of reference tools/slurm_train.sh):
#   ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG [EXTRA_ARGS...]
# One task per host; JAX multi-host init reads the coordinator from the
# first node in the allocation.
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3

NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NODES" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS_PER_TASK" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    bash -c 'COORDINATOR_ADDRESS=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -1):8476 \
        NUM_PROCESSES=$SLURM_NTASKS PROCESS_ID=$SLURM_PROCID \
        python '"$(dirname "$0")"'/train.py '"$CONFIG"' --multihost '"$*"
