#!/usr/bin/env bash
# CLI contract of the reference tools/dist_test.sh:
#   ./tools/dist_test.sh CONFIG CKPT CHIPS [--testdir_lr D --testdir_gt D --save-path P ...]
set -euo pipefail

CONFIG=$1
CKPT=$2
CHIPS=${3:-0}
shift 3 || shift 2

PNP_NUM_CHIPS="$CHIPS" python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
