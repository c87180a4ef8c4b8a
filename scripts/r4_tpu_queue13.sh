#!/usr/bin/env bash
# Round-4 TPU queue, part 13: re-run everything the Aug-20 sandbox reset
# erased before queues 11/12 could execute.  Order: the short EDM-twin
# exact-likelihood datapoint first (completes the continuous-family ODE-NLL
# story), then the flagship flow retrain feeding consistency distillation
# at flagship scale (the third few-step family at flagship scale).
# Artifact-gated: safe to relaunch, done steps skip.
#   bash scripts/r4_tpu_queue13.sh > /tmp/r4queue13.log 2>&1 &
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

# ---- A. EDM twin + sigma-space ODE NLL (former queue 12) ----
if [ ! -f runs/synstudy_linear_T1000_edm/final_test.json ]; then
  echo "=== [A1] edm twin training $(date +%H:%M) ==="
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

if [ ! -f docs/results/ode_nll_edm_twin.json ] \
   && [ -f runs/synstudy_linear_T1000_edm/final_test.json ]; then
  echo "=== [A2] edm twin ODE NLL $(date +%H:%M) ==="
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

# ---- B. flagship flow retrain (wiped; queue-8 recipe verbatim) ----
if [ ! -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [B1] flow flagship training $(date +%H:%M) ==="
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

# ---- C. flagship consistency distillation + cm eval (former queue 11) ----
if [ ! -f runs/flagship_linear_T1000_flow_cd/final_test.json ] \
   && [ -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [C1] flagship consistency distillation $(date +%H:%M) ==="
  rm -rf runs/flagship_linear_T1000_flow_cd
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.consistency \
    run_dir=runs/flagship_linear_T1000_flow epochs=60 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
fi

if [ ! -f docs/results/cm_flagship.json ] \
   && [ -f runs/flagship_linear_T1000_flow_cd/final_test.json ]; then
  echo "=== [C2] cm flagship few-step envelope $(date +%H:%M) ==="
  timeout 5400 python scripts/eval_reuse_distributional.py \
    runs/flagship_linear_T1000_flow_cd 128 cm cm_flagship.json \
    2>&1 | grep -v WARNING | tail -8
fi

echo "=== r4 TPU queue 13 complete $(date +%H:%M) ==="
