#!/usr/bin/env bash
# Round-4 CPU-scale EDM twin (reset-insurance for r4_tpu_queue5): train
# engine.prediction_type=edm at the cpustudy scale (16x16 grey,
# unet_small_grey, same budget as the eps/v/min-snr twins) and run the
# "edm" distributional set — native sigma-space sampler vs the same
# model's table-driven eps-views.  CPU-only (never touches the TPU), so
# it can run alongside the TPU queues.
#   bash scripts/r4_cpu_fallback3.sh > /tmp/r4cpu3.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

export PYTHONPATH=
export JAX_PLATFORMS=cpu

COMMON="model=unet_small_grey data=synthetic data.channels=1 data.n=512
  data.batch_size=64 data.num_samples_per_epoch=512
  data.transformation_kwargs.normalize=mnist
  engine=cifar10 engine.resolution=16 engine.ema=0.995
  engine.diffusion_steps=1000 engine.mode=linear
  trainer.max_epochs=60 trainer.check_val_every_n_epoch=10
  trainer.limit_test_batches=4 visualization=none out_dir=runs"

if [ ! -f runs/cpustudy_edm/final_test.json ]; then
  echo "=== [train] cpustudy_edm $(date +%H:%M) ==="
  rm -rf runs/cpustudy_edm
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    $COMMON run_name=cpustudy_edm engine.prediction_type=edm \
    model.use_scale_shift_norm=true 2>&1 | grep -v WARNING | tail -2
fi

if [ ! -f docs/results/cpustudy_edm.json ] \
   && [ -f runs/cpustudy_edm/final_test.json ]; then
  echo "=== [eval] cpustudy_edm $(date +%H:%M) ==="
  timeout 7200 python scripts/eval_reuse_distributional.py \
    runs/cpustudy_edm 128 edm cpustudy_edm.json \
    2>&1 | grep -v WARNING | tail -12
fi

echo "=== r4 cpu fallback 3 complete $(date +%H:%M) ==="
