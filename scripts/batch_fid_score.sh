#!/usr/bin/env bash
# Batch FID driver: score multiple runs x clip modes sequentially.
# Equivalent of the reference's scripts/batch_fid_score.sh:1-17, which
# backgrounds one GPU job per (run, clip) pair 5s apart; on TPU the chip is
# owned by one process, so jobs run back-to-back.
#
# Usage: scripts/batch_fid_score.sh <run_dir> [<run_dir> ...]

set -euo pipefail

for run in "$@"; do
  for clip in true false; do
    echo "=== FID for ${run} clip=${clip}"
    python -m probabilisticdeepdiffusionmodels_tpu.cli.fid_score "${run}" "${clip}"
  done
done
