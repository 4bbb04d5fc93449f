#!/usr/bin/env bash
# CLI contract of the reference tools/dist_train.sh:
#   ./tools/dist_train.sh CONFIG CHIPS [--exp_name NAME ...]
# One JAX process drives all local chips (no per-device process spawn); the
# CHIPS argument bounds the device count used for the mesh. Multi-host runs
# set COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID and pass --multihost.
set -euo pipefail

CONFIG=$1
CHIPS=${2:-0}
shift 2 || shift 1

EXTRA=()
if [[ -n "${COORDINATOR_ADDRESS:-}" ]]; then
  EXTRA+=(--multihost)
fi

PNP_NUM_CHIPS="$CHIPS" python "$(dirname "$0")/train.py" "$CONFIG" "${EXTRA[@]}" "$@"
