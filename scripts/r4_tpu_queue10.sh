#!/usr/bin/env bash
# Round-4 TPU queue, part 10: drive the consistency-model feature on the
# real chip (CT train + 1/2/4-step sampling + CD from an eps teacher).
# Waits for queue9.
#   bash scripts/r4_tpu_queue10.sh > /tmp/r4queue10.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue9.pid; do
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

if [ ! -f docs/results/drive_cm_tpu.ok ]; then
  echo "=== [1] consistency-model TPU drive $(date +%H:%M) ==="
  timeout 3600 python scripts/drive_cm_tpu.py 2>&1 | grep -v WARNING \
    | tee /tmp/drive_cm_tpu.out | tail -10
  if grep -q DRIVE_CM_TPU_OK /tmp/drive_cm_tpu.out; then
    cp /tmp/drive_cm_tpu.out docs/results/drive_cm_tpu.ok
  fi
fi

echo "=== r4 TPU queue 10 complete $(date +%H:%M) ==="
