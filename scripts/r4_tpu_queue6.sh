#!/usr/bin/env bash
# Round-4 TPU queue, part 6: the flow-matching feature's trained evidence
# (engine prediction_type=flow, arXiv:2210.02747 / 2209.03003) — train a
# flow twin of the synstudy family on the real chip, run the "flow"
# distributional set (native Euler/Heun ODE at several step counts +
# SD3 shift vs the same model's table-driven eps-views), then a serving
# micro-bench of the native flow sampler at 10/25 steps.
#   bash scripts/r4_tpu_queue6.sh > /tmp/r4queue6.log 2>&1 &
# Waits for earlier queues (single TPU process rule), resumable,
# self-probing.
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue2.pid /tmp/r4queue3.pid /tmp/r4queue4.pid \
               /tmp/r4queue5.pid /tmp/r4queue5b.pid; do
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

# 1. flow twin: same data/model/optimizer/epoch budget as the
# eps/v/min-snr/edm twins (diffusion_steps only sizes the NLL/eps-view
# tables for flow)
if [ ! -f runs/synstudy_linear_T1000_flow/final_test.json ]; then
  echo "=== [1] flow twin training $(date +%H:%M) ==="
  rm -rf runs/synstudy_linear_T1000_flow
  timeout 5400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet_small data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear \
    engine.prediction_type=flow model.use_scale_shift_norm=true \
    trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=synstudy_linear_T1000_flow 2>&1 | grep -v WARNING | tail -3
fi

# 2. distributional eval: native flow ODE vs eps-views of the same model
if [ ! -f docs/results/flow_study.json ] \
   && [ -f runs/synstudy_linear_T1000_flow/final_test.json ]; then
  echo "=== [2] flow distributional study $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000_flow 128 flow flow_study.json \
    2>&1 | grep -v WARNING | tail -12
fi

echo "=== r4 TPU queue 6 complete $(date +%H:%M) ==="
