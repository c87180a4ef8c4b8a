#!/usr/bin/env bash
# Round-4 TPU queue, part 2: the sandbox reset between rounds deleted the
# r2/r3 trained checkpoints (runs/ is gitignored), so the flagship +
# eps-twin studies in r4_tpu_queue.sh steps 3-7 failed on missing run dirs.
# This queue retrains them and re-runs the dependent studies.
#   bash scripts/r4_tpu_queue2.sh > /tmp/r4queue2.log 2>&1 &
# Resumable (artifact-gated), self-probing, strictly sequential.
set -uo pipefail
cd "$(dirname "$0")/.."

probe() {
  timeout 200 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128),jnp.bfloat16))))
" >/dev/null 2>&1
}

echo "=== probing TPU ==="
until probe; do echo "tpu unavailable $(date +%H:%M); retry in 300s"; sleep 300; done
echo "tpu up $(date +%H:%M)"

SMALL_COMMON="model=unet_small data=synthetic data.channels=3 data.n=2048 \
  data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
  engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
  engine.diffusion_steps=1000 engine.mode=linear \
  trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
  trainer.limit_test_batches=4 visualization=none out_dir=runs"

# 1. eps twin retrain (comparison anchor for the v / min-snr twins).
# Skipped once its eval artifact exists: after a sandbox reset wipes runs/,
# retraining the twin serves nothing if docs/results/vstudy_eps.json is
# already committed.
if [ ! -f docs/results/vstudy_eps.json ] \
   && [ ! -f runs/synstudy_linear_T1000/final_test.json ]; then
  echo "=== [1] eps twin training $(date +%H:%M) ==="
  rm -rf runs/synstudy_linear_T1000
  timeout 5400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    $SMALL_COMMON run_name=synstudy_linear_T1000 2>&1 | grep -v WARNING | tail -3
fi

# 2. vstudy eval on the eps twin (v twin's vstudy_v.json already captured)
if [ ! -f docs/results/vstudy_eps.json ] \
   && [ -f runs/synstudy_linear_T1000/final_test.json ]; then
  echo "=== [2] vstudy eps eval $(date +%H:%M) ==="
  timeout 3600 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000 128 vstudy vstudy_eps.json 2>&1 | grep -v WARNING | tail -5
fi

# 3. vstudy eval on the min-snr twin (sample quality vs its worse NLL)
if [ ! -f docs/results/vstudy_minsnr.json ] \
   && [ -f runs/synstudy_linear_T1000_minsnr/final_test.json ]; then
  echo "=== [3] vstudy min-snr eval $(date +%H:%M) ==="
  timeout 3600 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000_minsnr 128 vstudy vstudy_minsnr.json 2>&1 | grep -v WARNING | tail -5
fi

# 4. flagship retrain (bench architecture: 128ch CIFAR UNet, linear T=1000;
# r2 run early-stopped at epoch 179/300, best val 0.00544, NLL 2.554)
if [ ! -f runs/flagship_linear_T1000/final_test.json ]; then
  echo "=== [4] flagship training $(date +%H:%M) ==="
  rm -rf runs/flagship_linear_T1000
  timeout 14400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear \
    trainer.max_epochs=300 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=flagship_linear_T1000 2>&1 | grep -v WARNING | tail -3
fi

# 5. Karras-vs-uniform spacing quality on the flagship (incl. heun arms)
if [ ! -f docs/results/karras_spacing.json ] \
   && [ -f runs/flagship_linear_T1000/final_test.json ]; then
  echo "=== [5] karras spacing study $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000 128 karras karras_spacing.json 2>&1 | grep -v WARNING | tail -12
fi

# 6. Inpainting study on the flagship
if [ ! -f docs/results/inpaint_study.json ] \
   && [ -f runs/flagship_linear_T1000/final_test.json ]; then
  echo "=== [6] inpaint study $(date +%H:%M) ==="
  timeout 3600 python scripts/eval_inpaint.py runs/flagship_linear_T1000 64 1 \
    2>&1 | grep -v WARNING | tail -15
fi

# 7. Progressive distillation of the flagship: 1000 -> 500 -> 250 -> 125
if [ ! -d runs/flagship_linear_T1000_distillT125/checkpoints ] \
   && [ -f runs/flagship_linear_T1000/final_test.json ]; then
  echo "=== [7] flagship distillation (3 rounds) $(date +%H:%M) ==="
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.distill \
    run_dir=runs/flagship_linear_T1000 rounds=3 epochs=12 lr=1e-4 \
    out_dir=runs 2>&1 | grep -v WARNING | tail -10
fi

# 8. Distilled-student quality vs teacher at matched NFE
if [ ! -f docs/results/distill_T125.json ] \
   && [ -d runs/flagship_linear_T1000_distillT125/checkpoints ]; then
  echo "=== [8] distilled quality table $(date +%H:%M) ==="
  timeout 3600 python scripts/eval_distill.py runs/flagship_linear_T1000 \
    runs/flagship_linear_T1000_distillT125 128 2>&1 | grep -v WARNING | tail -10
fi

echo "=== r4 TPU queue 2 complete $(date +%H:%M) ==="
