#!/usr/bin/env bash
# Round-4 TPU queue, part 8: the flow/reflow story at FLAGSHIP scale
# (128ch CIFAR UNet) — does flow's step-robustness hold at the bench
# model's size, and does reflow buy the same 1-2 step win?  Plus the
# serving envelope re-capture with the native flow_1/2/4 arms.
#   bash scripts/r4_tpu_queue8.sh > /tmp/r4queue8.log 2>&1 &
# Resumable, self-probing, waits for queue7.
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue7.pid; do
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

# 1. flow flagship: same budget as the eps/v flagships
if [ ! -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [1] flow flagship training $(date +%H:%M) ==="
  rm -rf runs/flagship_linear_T1000_flow
  timeout 14400 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
    model=unet data=synthetic data.channels=3 data.n=2048 \
    data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
    engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
    engine.diffusion_steps=1000 engine.mode=linear \
    engine.prediction_type=flow \
    trainer.max_epochs=300 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs \
    run_name=flagship_linear_T1000_flow 2>&1 | grep -v WARNING | tail -3
fi

# 2. flow set (native vs eps-view) + few-step envelope on the flagship
if [ ! -f docs/results/flow_flagship.json ] \
   && [ -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [2] flow flagship distributional study $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000_flow 128 flow flow_flagship.json \
    2>&1 | grep -v WARNING | tail -12
fi
if [ ! -f docs/results/fewstep_flagship_teacher.json ] \
   && [ -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [3] flagship teacher few-step envelope $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000_flow 128 fewstep \
    fewstep_flagship_teacher.json 2>&1 | grep -v WARNING | tail -9
fi

# 4. reflow the flagship
if [ ! -f runs/flagship_linear_T1000_flow_reflow/final_test.json ] \
   && [ -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [4] flagship reflow round $(date +%H:%M) ==="
  rm -rf runs/flagship_linear_T1000_flow_reflow
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.reflow \
    run_dir=runs/flagship_linear_T1000_flow n_couplings=4096 \
    batch_size=128 epochs=8 minibatch_gen=128 gen_steps=50 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
fi

# 5. few-step envelope on the reflowed flagship
if [ ! -f docs/results/fewstep_flagship_reflow.json ] \
   && [ -f runs/flagship_linear_T1000_flow_reflow/final_test.json ]; then
  echo "=== [5] flagship reflow few-step envelope $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000_flow_reflow 128 fewstep \
    fewstep_flagship_reflow.json 2>&1 | grep -v WARNING | tail -9
fi

# 6. serving envelope re-capture with the flow_1/2/4 arms
if ! grep -q flow_1 docs/results/serving_envelope.json 2>/dev/null; then
  echo "=== [6] serving envelope with flow arms $(date +%H:%M) ==="
  timeout 5400 python scripts/bench_serving_envelope.py \
    2>&1 | grep -v WARNING | tail -24
fi

echo "=== r4 TPU queue 8 complete $(date +%H:%M) ==="
