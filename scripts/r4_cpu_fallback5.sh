#!/usr/bin/env bash
# Round-4 CPU-scale consistency study (reset-insurance for r4_tpu_queue11):
# train a flow twin at the cpustudy scale (16x16 grey, unet_small_grey),
# consistency-distill it (cli.consistency), and measure the student's
# native 1/2/4-step envelope against the teacher's fewstep arms — the
# small-scale version of the flagship CD story.  CPU-only (never touches
# the TPU), so it can run alongside the TPU queues.
#   bash scripts/r4_cpu_fallback5.sh > /tmp/r4cpu5.log 2>&1 &
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
  echo "=== [train] cpustudy_flow teacher $(date +%H:%M) ==="
  rm -rf runs/cpustudy_flow
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    $COMMON run_name=cpustudy_flow engine.prediction_type=flow \
    model.use_scale_shift_norm=true 2>&1 | grep -v WARNING | tail -2
fi

if [ ! -f docs/results/cpustudy_flow_fewstep.json ] \
   && [ -f runs/cpustudy_flow/final_test.json ]; then
  echo "=== [eval] teacher fewstep envelope $(date +%H:%M) ==="
  timeout 7200 python scripts/eval_reuse_distributional.py \
    runs/cpustudy_flow 128 fewstep cpustudy_flow_fewstep.json \
    2>&1 | grep -v WARNING | tail -9
fi

if [ ! -f runs/cpustudy_flow_cd/final_test.json ] \
   && [ -f runs/cpustudy_flow/final_test.json ]; then
  echo "=== [distill] cpustudy_flow -> consistency student $(date +%H:%M) ==="
  rm -rf runs/cpustudy_flow_cd
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.consistency \
    run_dir=runs/cpustudy_flow epochs=60 limit_test_batches=4 \
    out_dir=runs 2>&1 | grep -v WARNING | tail -3
fi

if [ ! -f docs/results/cpustudy_cm.json ] \
   && [ -f runs/cpustudy_flow_cd/final_test.json ]; then
  echo "=== [eval] consistency student 1/2/4-step $(date +%H:%M) ==="
  timeout 7200 python scripts/eval_reuse_distributional.py \
    runs/cpustudy_flow_cd 128 cm cpustudy_cm.json \
    2>&1 | grep -v WARNING | tail -6
fi

echo "=== r4 cpu fallback 5 complete $(date +%H:%M) ==="
