#!/usr/bin/env bash
# Round-4 TPU queue, part 7: the reflow/2-rectification feature's trained
# evidence (train/reflow.py, arXiv:2209.03003) — rectify the queue-6 flow
# twin on its own ODE couplings, then measure the few-step native-Euler
# envelope (1/2/4/10/25 steps) on BOTH the teacher and the reflowed
# student: reflow should flatten the envelope toward the 1-step end.
#   bash scripts/r4_tpu_queue7.sh > /tmp/r4queue7.log 2>&1 &
# Resumable, self-probing, waits for earlier queues.
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue6.pid; do
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

# 0. the flow twin must exist (queue 6); retrain it if a sandbox reset
# wiped runs/
if [ ! -f runs/synstudy_linear_T1000_flow/final_test.json ]; then
  echo "=== [0] flow twin retrain $(date +%H:%M) ==="
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

# 1. reflow: 4096 native-ODE couplings (50-step Euler), 8 passes
if [ ! -f runs/synstudy_linear_T1000_flow_reflow/final_test.json ] \
   && [ -f runs/synstudy_linear_T1000_flow/final_test.json ]; then
  echo "=== [1] reflow round $(date +%H:%M) ==="
  rm -rf runs/synstudy_linear_T1000_flow_reflow
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.reflow \
    run_dir=runs/synstudy_linear_T1000_flow n_couplings=4096 \
    batch_size=128 epochs=8 minibatch_gen=128 gen_steps=50 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
fi

# 2. few-step envelope on the teacher
if [ ! -f docs/results/fewstep_teacher.json ] \
   && [ -f runs/synstudy_linear_T1000_flow/final_test.json ]; then
  echo "=== [2] teacher few-step envelope $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000_flow 128 fewstep fewstep_teacher.json \
    2>&1 | grep -v WARNING | tail -9
fi

# 3. few-step envelope on the reflowed student
if [ ! -f docs/results/fewstep_reflow.json ] \
   && [ -f runs/synstudy_linear_T1000_flow_reflow/final_test.json ]; then
  echo "=== [3] reflow few-step envelope $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/synstudy_linear_T1000_flow_reflow 128 fewstep fewstep_reflow.json \
    2>&1 | grep -v WARNING | tail -9
fi

echo "=== r4 TPU queue 7 complete $(date +%H:%M) ==="
