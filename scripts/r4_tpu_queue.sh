#!/usr/bin/env bash
# Round-4 TPU evidence queue (VERDICT r3 next #2/#3), in priority order,
# resumable: each step skips itself if its artifact already exists.
#   bash scripts/r4_tpu_queue.sh > /tmp/r4queue.log 2>&1 &
# (single TPU process at a time — strictly sequential; self-probing so the
# axon outage just delays rather than kills the queue).
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

# 0. Headline bench recapture post-outage (VERDICT r3 next #3) — cheapest
# high-value artifact, run it first in case the backend flakes again
if [ ! -f docs/results/bench_r4_recapture.json ]; then
  echo "=== [0] bench recapture ==="
  timeout 3600 python bench.py 2>&1 | grep -v WARNING | grep '^{' | tail -1 \
    > docs/results/bench_r4_recapture.json
  [ -s docs/results/bench_r4_recapture.json ] \
    && cat docs/results/bench_r4_recapture.json \
    || rm -f docs/results/bench_r4_recapture.json
fi

# 1. TPU drive of the round-3 features (verify artifact)
if [ ! -f docs/results/r3_tpu_drive.ok ]; then
  echo "=== [1] TPU drive of min-snr/x0/karras/inpaint ==="
  timeout 2700 python scripts/drive_r3_features.py 2>&1 | grep -v WARNING \
    && touch docs/results/r3_tpu_drive.ok
fi

# 2. v-prediction twin training (~35 min)
if [ ! -f runs/synstudy_linear_T1000_v/final_test.json ]; then
  echo "=== [2] v-twin training ==="
  rm -rf runs/synstudy_linear_T1000_v
  timeout 5400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet_small data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear engine.prediction_type=v \
    trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=synstudy_linear_T1000_v 2>&1 | grep -v WARNING | tail -3
fi

# 3. vstudy Frechet on the eps run and the v twin
if [ ! -f docs/results/vstudy_v.json ]; then
  echo "=== [3] vstudy evals ==="
  timeout 3600 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000 128 vstudy vstudy_eps.json 2>&1 | grep -v WARNING | tail -5
  timeout 3600 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000_v 128 vstudy vstudy_v.json 2>&1 | grep -v WARNING | tail -5
fi

# 4. Karras-vs-uniform spacing quality on the flagship
if [ ! -f docs/results/karras_spacing.json ]; then
  echo "=== [4] karras spacing study ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000 128 karras karras_spacing.json 2>&1 | grep -v WARNING | tail -10
fi

# 5. Inpainting study on the flagship
if [ ! -f docs/results/inpaint_study.json ]; then
  echo "=== [5] inpaint study ==="
  timeout 3600 python scripts/eval_inpaint.py runs/flagship_linear_T1000 64 1 \
    2>&1 | grep -v WARNING | tail -15
fi

# 6. Progressive distillation of the flagship: 1000 -> 500 -> 250 -> 125
# (cli.distill writes checkpoints/, not final_test.json — gate on the dir)
if [ ! -d runs/flagship_linear_T1000_distillT125/checkpoints ]; then
  echo "=== [6] flagship distillation (3 rounds) ==="
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.distill \
    run_dir=runs/flagship_linear_T1000 rounds=3 epochs=12 lr=1e-4 \
    out_dir=runs 2>&1 | grep -v WARNING | tail -10
fi

# 7. Distilled-student quality vs teacher at matched NFE
if [ ! -f docs/results/distill_T125.json ] \
   && [ -d runs/flagship_linear_T1000_distillT125/checkpoints ]; then
  echo "=== [7] distilled quality table ==="
  timeout 3600 python scripts/eval_distill.py runs/flagship_linear_T1000 \
    runs/flagship_linear_T1000_distillT125 128 2>&1 | grep -v WARNING | tail -10
fi

# 8. min-SNR trained twin (optional, CLAUDE.md pending #5)
if [ ! -f runs/synstudy_linear_T1000_minsnr/final_test.json ]; then
  echo "=== [8] min-snr twin training ==="
  rm -rf runs/synstudy_linear_T1000_minsnr
  timeout 5400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet_small data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear \
    engine.loss_weighting=min_snr engine.snr_gamma=5.0 \
    trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=synstudy_linear_T1000_minsnr 2>&1 | grep -v WARNING | tail -3
fi

echo "=== r4 TPU queue complete ==="
