#!/usr/bin/env bash
# Round-4 TPU queue, part 12: the EDM exact-likelihood datapoint — retrain
# the synstudy EDM twin (wiped by the Aug-19 sandbox reset) and run the
# continuous sigma-space ODE NLL (evals/ode_nll.py::edm_ode_nll) next to
# its eps-view VLB, completing the exact-likelihood story for BOTH
# continuous families (flow: queue 9).  Waits for queue11.
#   bash scripts/r4_tpu_queue12.sh > /tmp/r4queue12.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue11.pid; do
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

# 1. EDM twin (same budget as the queue-5 run the reset deleted)
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

# 2. exact sigma-space ODE NLL at two grids (convergence check) next to
# the eps-view VLB columns
if [ ! -f docs/results/ode_nll_edm_twin.json ] \
   && [ -f runs/synstudy_linear_T1000_edm/final_test.json ]; then
  echo "=== [2] edm twin ODE NLL $(date +%H:%M) ==="
  timeout 3600 python - <<'EOF' 2>&1 | grep -v WARNING | tail -4
import json, sys
sys.path.insert(0, ".")
from probabilisticdeepdiffusionmodels_tpu.cli.eval import main as eval_main

out = {}
for steps in (50, 100):
    r = eval_main([
        "run_dir=runs/synstudy_linear_T1000_edm",
        "trainer.limit_test_batches=4",
        "ode_nll=true", f"ode_steps={steps}",
    ])
    out[f"ode_{steps}"] = {
        "test_nll": r["test_nll"], "test_ode_nll": r["test_ode_nll"],
    }
with open("docs/results/ode_nll_edm_twin.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/results/ode_nll_edm_twin.json", out)
EOF
fi

echo "=== r4 TPU queue 12 complete $(date +%H:%M) ==="
