#!/usr/bin/env bash
# Real-weight validation runbook: convert a checkpoint, check torch parity
# (HF format), re-measure the int8 modes' cosine error and audit the
# int8_static calibration margin. See scripts/validate_real_weights.py.
#
#   scripts/validate_real_weights.sh <checkpoint-or-dir> <model-name> [imgdir]
set -e
cd "$(dirname "$0")/.."
ARGS=()
[ -n "${3:-}" ] && ARGS=(--images "$3")
exec python scripts/validate_real_weights.py "$1" "$2" "${ARGS[@]}"
