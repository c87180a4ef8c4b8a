#!/usr/bin/env bash
# NLL-vs-T study on the synthetic dataset (the reference's only recorded
# results are NLL(T, schedule) tables — notebooks/results_and_schedules.ipynb;
# real MNIST/CIFAR are unavailable in a zero-egress sandbox, so the study
# reproduces the qualitative law — NLL in bits/dim falls as T grows, cosine
# beats linear at small T — on the procedural dataset).
#
# Runs 6 small-UNet trainings (T in {50,200,1000} x {cosine,linear}) on the
# TPU, each followed by the final-NLL eval, writing to runs/synstudy_*.
# Usage: bash scripts/train_synthetic_study.sh [out_dir]
set -euo pipefail
OUT=${1:-runs}
COMMON=(
  model=unet_small
  data=synthetic data.channels=3 data.n=2048 data.batch_size=128
  data.num_samples_per_epoch=2048
  engine=cifar10 engine.resolution=32 engine.ema=0.995
  engine.optimizer_config.lr=2e-4
  trainer.max_epochs=150 trainer.check_val_every_n_epoch=10
  trainer.limit_test_batches=4
  visualization=less visualization.run_every=150
  out_dir="$OUT"
)
for MODE in cosine linear; do
  for T in 50 200 1000; do
    echo "=== T=$T mode=$MODE ==="
    python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
      "${COMMON[@]}" \
      engine.diffusion_steps="$T" engine.mode="$MODE" \
      run_name="synstudy_${MODE}_T${T}"
  done
done
echo "done; NLL table:"
python - "$OUT" <<'EOF'
import json, sys
from pathlib import Path
for d in sorted(Path(sys.argv[1]).glob("synstudy_*")):
    f = d / "final_test.json"
    if f.exists():
        m = json.loads(f.read_text())
        print(d.name, {k: round(v, 4) for k, v in m.items()})
EOF
