#!/usr/bin/env bash
# Round-4 CPU-scale fallback for the TPU evidence queue (VERDICT r3 next
# #2) — the axon TPU outage has blocked scripts/r4_tpu_queue.sh for >24 h,
# so this produces reduced-scale TRAINED evidence for the round-3/4 feature
# claims on the host CPU instead: eps-vs-v prediction twins, a min-SNR
# twin, and distributional evals.  16x16 grey, unet_small_grey, T=1000
# linear — ~25 min/run on this host.  Resumable: each step skips itself if
# its artifact exists.  Never touches the TPU (JAX_PLATFORMS=cpu,
# PYTHONPATH= skips the axon plugin), so it can run alongside the TPU
# queue's probing.
#   bash scripts/r4_cpu_fallback.sh > /tmp/r4cpu.log 2>&1 &
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

train() {  # $1 = run_name, rest = extra overrides
  local name=$1; shift
  if [ ! -f "runs/$name/final_test.json" ]; then
    echo "=== [train] $name $(date +%H:%M) ==="
    rm -rf "runs/$name"
    timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
      $COMMON run_name="$name" "$@" 2>&1 | grep -v WARNING | tail -2
  fi
}

# 1+2. eps twin and v twin (prediction-parameterization study at CPU scale)
train cpustudy_eps
train cpustudy_v engine.prediction_type=v

# 3. min-SNR twin (arXiv:2303.09556 weighting vs the simple loss)
train cpustudy_minsnr engine.loss_weighting=min_snr engine.snr_gamma=5.0

# 4. distributional eval (Frechet + P&R per sampler arm) on each twin
for name in cpustudy_eps cpustudy_v cpustudy_minsnr; do
  if [ -f "runs/$name/final_test.json" ] \
     && [ ! -f "docs/results/${name}.json" ]; then
    echo "=== [eval] $name $(date +%H:%M) ==="
    timeout 7200 python scripts/eval_reuse_distributional.py \
      "runs/$name" 128 vstudy "${name}.json" 2>&1 \
      | grep -v WARNING | tail -6
  fi
done

# 5. NLL summary table across the twins
if [ ! -f docs/results/cpustudy_nll.json ]; then
  python - <<'EOF'
import json, pathlib
out = {}
for name in ("cpustudy_eps", "cpustudy_v", "cpustudy_minsnr"):
    p = pathlib.Path("runs") / name / "final_test.json"
    if p.exists():
        out[name] = json.loads(p.read_text())
if len(out) == 3:
    path = pathlib.Path("docs/results/cpustudy_nll.json")
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)
else:
    print("incomplete:", sorted(out))
EOF
fi

echo "=== r4 CPU fallback complete $(date +%H:%M) ==="
