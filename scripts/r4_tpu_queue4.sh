#!/usr/bin/env bash
# Round-4 TPU queue, part 4: perf envelope artifacts after the evidence
# queues finish (single TPU process rule — waits on queue3's pid).
#   bash scripts/r4_tpu_queue4.sh > /tmp/r4queue4.log 2>&1 &
# Resumable (artifact-gated), self-probing, strictly sequential.
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue2.pid /tmp/r4queue3.pid; do
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

# 1. serving envelope: batch x sampler img/s grid on the bench UNet
if [ ! -f docs/results/serving_envelope.json ]; then
  echo "=== [1] serving envelope $(date +%H:%M) ==="
  timeout 3600 python scripts/bench_serving_envelope.py 2>&1 | grep -v WARNING | tail -20
fi

# 2. training throughput + MFU from the retrained flagship's epoch times
if [ ! -f docs/results/train_throughput_flagship_r4.json ] \
   && [ -f runs/flagship_linear_T1000/final_test.json ]; then
  echo "=== [2] flagship train throughput $(date +%H:%M) ==="
  timeout 600 python scripts/extract_train_throughput.py \
    runs/flagship_linear_T1000 \
    > docs/results/train_throughput_flagship_r4.json \
    2> >(tail -5 >&2) || rm -f docs/results/train_throughput_flagship_r4.json
  tail -5 docs/results/train_throughput_flagship_r4.json 2>/dev/null
fi

echo "=== r4 TPU queue 4 complete $(date +%H:%M) ==="
