#!/usr/bin/env bash
# Round-4 CPU-scale flow-matching twin (reset-insurance for the TPU flow
# queue): train engine.prediction_type=flow at the cpustudy scale (16x16
# grey, unet_small_grey, same budget as the eps/v/min-snr/edm twins) and
# run the "flow" distributional set — native Euler/Heun ODE sampler vs
# the same model's table-driven eps-views.  CPU-only (never touches the
# TPU), so it can run alongside the TPU queues.
#   bash scripts/r4_cpu_fallback4.sh > /tmp/r4cpu4.log 2>&1 &
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

if [ ! -f runs/cpustudy_flow/final_test.json ]; then
  echo "=== [train] cpustudy_flow $(date +%H:%M) ==="
  rm -rf runs/cpustudy_flow
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    $COMMON run_name=cpustudy_flow engine.prediction_type=flow \
    model.use_scale_shift_norm=true 2>&1 | grep -v WARNING | tail -2
fi

if [ ! -f docs/results/cpustudy_flow.json ] \
   && [ -f runs/cpustudy_flow/final_test.json ]; then
  echo "=== [eval] cpustudy_flow $(date +%H:%M) ==="
  timeout 7200 python scripts/eval_reuse_distributional.py \
    runs/cpustudy_flow 128 flow cpustudy_flow.json \
    2>&1 | grep -v WARNING | tail -12
fi

echo "=== r4 cpu fallback 4 complete $(date +%H:%M) ==="
