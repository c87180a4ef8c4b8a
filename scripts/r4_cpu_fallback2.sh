#!/usr/bin/env bash
# Round-4 CPU fallback, stage 2 (run after scripts/r4_cpu_fallback.sh):
# converts the remaining blocked TPU evidence into CPU-scale measurements
# on the cpustudy_eps twin — Karras-vs-uniform spacing incl. the EDM Heun
# arms, the RePaint inpainting study, and a progressive-distillation round
# with its quality table.  Resumable / artifact-gated like stage 1.
#   bash scripts/r4_cpu_fallback2.sh > /tmp/r4cpu2.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

export PYTHONPATH=
export JAX_PLATFORMS=cpu

BASE=runs/cpustudy_eps
[ -f "$BASE/final_test.json" ] || { echo "stage-1 eps twin missing"; exit 1; }

# 1. Karras-vs-uniform spacing + Heun arms (CPU-scale karras_spacing.json)
if [ ! -f docs/results/cpustudy_karras.json ]; then
  echo "=== [karras+heun] $(date +%H:%M) ==="
  timeout 10800 python scripts/eval_reuse_distributional.py \
    "$BASE" 128 karras cpustudy_karras.json 2>&1 | grep -v WARNING | tail -16
fi

# 2. RePaint inpainting study (CPU scale).  eval_inpaint writes the fixed
# names inpaint_study.json / inpaint_grid.png — rename so the TPU queue's
# flagship run of the same script is not gated off by this fallback.
if [ ! -f docs/results/inpaint_study_cpustudy.json ]; then
  echo "=== [inpaint] $(date +%H:%M) ==="
  timeout 7200 python scripts/eval_inpaint.py "$BASE" 32 1 \
    2>&1 | grep -v WARNING | tail -15
  [ -f docs/results/inpaint_study.json ] \
    && mv docs/results/inpaint_study.json \
         docs/results/inpaint_study_cpustudy.json
  [ -f docs/results/inpaint_grid.png ] \
    && mv docs/results/inpaint_grid.png \
         docs/results/inpaint_grid_cpustudy.png
fi

# 3. Progressive distillation 1000 -> 500 -> 250 (2 rounds, CPU scale)
if [ ! -d runs/cpustudy_eps_distillT250/checkpoints ]; then
  echo "=== [distill] $(date +%H:%M) ==="
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.distill \
    run_dir="$BASE" rounds=2 epochs=8 lr=1e-4 out_dir=runs \
    2>&1 | grep -v WARNING | tail -8
fi

# 4. Distilled-student quality vs teacher (writes distill_T250.json — the
# TPU flagship item writes distill_T125.json, no collision)
if [ -d runs/cpustudy_eps_distillT250/checkpoints ] \
   && [ ! -f docs/results/distill_T250.json ]; then
  echo "=== [distill eval] $(date +%H:%M) ==="
  timeout 7200 python scripts/eval_distill.py "$BASE" \
    runs/cpustudy_eps_distillT250 128 2>&1 | grep -v WARNING | tail -10
fi

echo "=== r4 CPU fallback stage 2 complete $(date +%H:%M) ==="
