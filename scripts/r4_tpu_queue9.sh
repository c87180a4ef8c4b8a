#!/usr/bin/env bash
# Round-4 TPU queue, part 9: exact continuous-time ODE likelihood
# (evals/ode_nll.py) on the flow flagship — the likelihood twin of the
# discrete VLB, measured on the real chip.  Waits for queue8.
#   bash scripts/r4_tpu_queue9.sh > /tmp/r4queue9.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

for PIDFILE in /tmp/r4queue8.pid; do
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

# ODE NLL on the flow flagship: VLB columns + exact continuous NLL at
# two grids (convergence check) — the quantitative SD3 likelihood trade.
if [ ! -f docs/results/ode_nll_flagship.json ] \
   && [ -f runs/flagship_linear_T1000_flow/final_test.json ]; then
  echo "=== [1] flow flagship ODE NLL $(date +%H:%M) ==="
  timeout 5400 python - <<'EOF' 2>&1 | grep -v WARNING | tail -8
import json
from probabilisticdeepdiffusionmodels_tpu.cli.eval import main as eval_main

out = {}
for steps in (50, 100):
    r = eval_main([
        "run_dir=runs/flagship_linear_T1000_flow", "use_train_data=false",
        "trainer.limit_test_batches=2", "ode_nll=true",
        f"ode_steps={steps}", "ode_probes=1",
    ])
    out[f"ode_{steps}"] = {k: v for k, v in r.items() if "nll" in k or "ode" in k}
    print(steps, out[f"ode_{steps}"])
with open("docs/results/ode_nll_flagship.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/results/ode_nll_flagship.json")
EOF
fi

echo "=== r4 TPU queue 9 complete $(date +%H:%M) ==="
