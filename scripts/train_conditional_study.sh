#!/usr/bin/env bash
# Conditioning-path training study (VERDICT r2 next #4): the class-
# conditional UNet and the SuperResModel have been unit-tested since round
# 1 but never TRAINED.  This trains both to convergence on the synthetic
# dataset (whose labels now encode the channel-0 horizontal-frequency band,
# data/datasets.py:make_synthetic, so conditioning is learnable and its
# fidelity measurable), then scripts/eval_conditional.py produces the
# sample grids + fidelity metrics for docs/RESULTS.md.
#
# Reference capability being exercised: class embedding
# src/modules/unet.py:482-484, SuperRes concat conditioning unet.py:530-550.
# Usage: bash scripts/train_conditional_study.sh [out_dir]
set -euo pipefail
OUT=${1:-runs}
COMMON=(
  data=synthetic data.channels=3 data.n=2048 data.batch_size=128
  data.num_samples_per_epoch=2048
  engine=cifar10 engine.resolution=32 engine.ema=0.995
  engine.optimizer_config.lr=2e-4
  engine.diffusion_steps=1000 engine.mode=linear
  trainer.max_epochs=150 trainer.check_val_every_n_epoch=10
  trainer.limit_test_batches=4
  visualization=none
  out_dir="$OUT"
)

echo "=== class-conditional UNet ==="
python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
  "${COMMON[@]}" model=unet_small model.num_classes=10 \
  run_name=cond_class

echo "=== SuperResModel (factor 2) ==="
python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
  "${COMMON[@]}" model=unet_small model.name=superres \
  data.superres_factor=2 \
  run_name=cond_superres

echo "=== evaluation ==="
python scripts/eval_conditional.py "$OUT"
