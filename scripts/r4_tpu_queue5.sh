#!/usr/bin/env bash
# Round-4 TPU queue, part 5: the EDM continuous-sigma feature's trained
# evidence (engine prediction_type=edm, arXiv:2206.00364) — train an EDM
# twin of the synstudy family on the real chip, then run the "edm"
# distributional set (native sigma-space sampler at several grids +
# churn vs the same model's table-driven eps-views).
#   bash scripts/r4_tpu_queue5.sh > /tmp/r4queue5.log 2>&1 &
# Waits for queue4 (single TPU process rule), resumable, self-probing.
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue2.pid /tmp/r4queue3.pid /tmp/r4queue4.pid; do
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

# 1. EDM twin: same data/model/optimizer/epoch budget as the eps/v/min-snr
# twins (diffusion_steps only sizes the NLL/eps-view tables for EDM)
if [ ! -f runs/synstudy_linear_T1000_edm/final_test.json ]; then
  echo "=== [1] edm twin training $(date +%H:%M) ==="
  rm -rf runs/synstudy_linear_T1000_edm
  timeout 5400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet_small data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear \
    engine.prediction_type=edm model.use_scale_shift_norm=true \
    trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=synstudy_linear_T1000_edm 2>&1 | grep -v WARNING | tail -3
fi

# 2. distributional eval: native EDM sampler vs eps-views of the same model
if [ ! -f docs/results/edm_study.json ] \
   && [ -f runs/synstudy_linear_T1000_edm/final_test.json ]; then
  echo "=== [2] edm distributional study $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000_edm 128 edm edm_study.json \
    2>&1 | grep -v WARNING | tail -12
fi

# 3. v-trained flagship twin: the karras study on the eps flagship showed
# every few-step ODE arm capped by the eps parameterization's high-t
# conditioning; the twins table says v fixes exactly that.  Train the
# flagship at prediction_type=v and re-run the karras set to measure the
# best-known fast-sampling config (v + heun_k10) at flagship scale.
if [ ! -f runs/flagship_linear_T1000_v/final_test.json ]; then
  echo "=== [3] v flagship training $(date +%H:%M) ==="
  rm -rf runs/flagship_linear_T1000_v
  timeout 14400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear \
    engine.prediction_type=v \
    trainer.max_epochs=300 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=flagship_linear_T1000_v 2>&1 | grep -v WARNING | tail -3
fi

# 4. karras set on the v flagship
if [ ! -f docs/results/karras_spacing_v.json ] \
   && [ -f runs/flagship_linear_T1000_v/final_test.json ]; then
  echo "=== [4] v-flagship karras study $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000_v 128 karras karras_spacing_v.json \
    2>&1 | grep -v WARNING | tail -14
fi

echo "=== r4 TPU queue 5 complete $(date +%H:%M) ==="
