#!/usr/bin/env bash
# Round-4 TPU queue, part 3: extend the NLL-vs-T study to T=4000, completing
# the reference's 4-point grid (notebooks/results_and_schedules.ipynb uses
# T in {50,200,1000,4000}; rounds 2-3 measured {50,200,1000}).
#   bash scripts/r4_tpu_queue3.sh > /tmp/r4queue3.log 2>&1 &
# Waits for r4_tpu_queue2 (single TPU process rule), resumable, self-probing.
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/r4queue2.pid ]; then
  Q2=$(cat /tmp/r4queue2.pid)
  while kill -0 "$Q2" 2>/dev/null; do
    echo "queue2 ($Q2) still running $(date +%H:%M); wait 120s"; sleep 120
  done
fi

probe() {
  timeout 200 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128),jnp.bfloat16))))
" >/dev/null 2>&1
}
echo "=== probing TPU ==="
until probe; do echo "tpu unavailable $(date +%H:%M); retry in 300s"; sleep 300; done
echo "tpu up $(date +%H:%M)"

COMMON="model=unet_small data=synthetic data.channels=3 data.n=2048 \
  data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
  engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
  trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
  trainer.limit_test_batches=4 visualization=none out_dir=runs"

for MODE in cosine linear; do
  if [ ! -f "runs/synstudy_${MODE}_T4000/final_test.json" ]; then
    echo "=== T=4000 mode=$MODE $(date +%H:%M) ==="
    rm -rf "runs/synstudy_${MODE}_T4000"
    timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
      $COMMON engine.diffusion_steps=4000 engine.mode="$MODE" \
      run_name="synstudy_${MODE}_T4000" 2>&1 | grep -v WARNING | tail -3
  fi
done

echo "NLL table (all synstudy runs):"
python - runs <<'EOF'
import json, sys
from pathlib import Path
for d in sorted(Path(sys.argv[1]).glob("synstudy_*")):
    f = d / "final_test.json"
    if f.exists():
        m = json.loads(f.read_text())
        print(d.name, {k: round(v, 4) for k, v in m.items()})
EOF
echo "=== r4 TPU queue 3 complete $(date +%H:%M) ==="
