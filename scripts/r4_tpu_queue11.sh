#!/usr/bin/env bash
# Round-4 TPU queue, part 11: consistency distillation at FLAGSHIP scale —
# CD the flow flagship into a 1/few-step student and measure its 1/2/4-step
# envelope against the teacher's fewstep numbers (the third few-step family
# next to progressive distillation and reflow).  Waits for queue10.
#   bash scripts/r4_tpu_queue11.sh > /tmp/r4queue11.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue10.pid; do
  if [ -f "$PIDFILE" ]; then
    Q=$(cat "$PIDFILE")
    while kill -0 "$Q" 2>/dev/null; do
      echo "$PIDFILE ($Q) still running $(date +%H:%M); wait 120s"; sleep 120
    done
  fi
done

probe() {
  timeout 200 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128),jnp.bfloat16))))
" >/dev/null 2>&1
}
echo "=== probing TPU ==="
until probe; do echo "tpu unavailable $(date +%H:%M); retry in 300s"; sleep 300; done
echo "tpu up $(date +%H:%M)"

# 1. consistency-distill the flow flagship (exact continuous teacher
# denoiser; 60 passes over the 2048-image synthetic set = ~960 steps)
if [ ! -f runs/flagship_linear_T1000_flow_cd/final_test.json ] \
   && [ -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [1] flagship consistency distillation $(date +%H:%M) ==="
  rm -rf runs/flagship_linear_T1000_flow_cd
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.consistency \
    run_dir=runs/flagship_linear_T1000_flow epochs=60 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
fi

# 2. the student's native 1/2/4-step envelope (compare against
# docs/results/fewstep_flagship_teacher.json arm-for-arm)
if [ ! -f docs/results/cm_flagship.json ] \
   && [ -f runs/flagship_linear_T1000_flow_cd/final_test.json ]; then
  echo "=== [2] consistency student few-step envelope $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000_flow_cd 128 cm cm_flagship.json \
    2>&1 | grep -v WARNING | tail -6
fi

echo "=== r4 TPU queue 11 complete $(date +%H:%M) ==="
