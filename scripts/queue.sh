#!/usr/bin/env bash
# THE evidence queue (VERDICT r4 next #6): one parameterized, resumable,
# self-probing runner replacing the 14 ad-hoc r3/r4_tpu_queue*.sh scripts.
#
#   bash scripts/queue.sh --list             # show steps + skip/run status
#   bash scripts/queue.sh > /tmp/queue.log 2>&1 &   # run everything pending
#   bash scripts/queue.sh karras_eps cm_flagship    # run named steps only
#
# Every step is ARTIFACT-GATED: it is skipped when its output (a
# docs/results/*.json study or a runs/*/final_test.json checkpoint) already
# exists, so after a sandbox reset wipes runs/ and /tmp the single command
# `bash scripts/queue.sh` re-creates exactly the missing evidence in
# dependency order — training steps come before the studies that consume
# them, and studies re-check their run-dir dependency at run time.
# The TPU is probed (tiny jit matmul, 200 s timeout) before each step and
# the queue blocks until the chip answers (axon outages last hours).
# One TPU process at a time: the runner takes /tmp/pddm_queue.lock.
set -uo pipefail
cd "$(dirname "$0")/.."

# ---------- infrastructure ----------------------------------------------
probe() {
  timeout 200 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128),jnp.bfloat16))))
" >/dev/null 2>&1
}

wait_tpu() {
  until probe; do echo "tpu unavailable $(date +%H:%M); retry in 300s"; sleep 300; done
}

TRAIN="python -m probabilisticdeepdiffusionmodels_tpu.cli.train"
STUDY="python scripts/eval_reuse_distributional.py"
RES=docs/results

# synstudy twins: 16ch small UNet, 32x32 synthetic, 150-epoch budget
SMALL="model=unet_small data=synthetic data.channels=3 data.n=2048 \
  data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
  engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
  trainer.max_epochs=150 trainer.check_val_every_n_epoch=10 \
  trainer.limit_test_batches=4 visualization=none out_dir=runs"
# flagship: the bench 128ch CIFAR UNet, 300-epoch budget
FLAG="model=unet data=synthetic data.channels=3 data.n=2048 \
  data.batch_size=128 data.num_samples_per_epoch=2048 engine=cifar10 \
  engine.resolution=32 engine.ema=0.995 engine.optimizer_config.lr=2e-4 \
  trainer.max_epochs=300 trainer.check_val_every_n_epoch=10 \
  trainer.limit_test_batches=4 visualization=none out_dir=runs"

# train <run_name> <timeout_s> <extra overrides...>
train_run() {
  local name=$1 tmo=$2; shift 2
  rm -rf "runs/$name"
  timeout "$tmo" $TRAIN "$@" run_name="$name" 2>&1 | grep -v WARNING | tail -3
}

# study <run_name> <set> <out_json> [timeout]
study_run() {
  local run=$1 set=$2 out=$3 tmo=${4:-5400}
  timeout "$tmo" $STUDY "runs/$run" 128 "$set" "$out" 2>&1 \
    | grep -v WARNING | tail -14
}

# ---------- step registry -----------------------------------------------
# step <name> <artifact> <run-dir dep ("" = none)> [skipif]
# skipif: a committed study artifact that makes this step unnecessary —
# a wiped runs/ checkpoint is NOT retrained when everything it feeds is
# already captured (sandbox resets delete runs/, which is gitignored).
STEPS=()
declare -A ART DEP SKIPIF FN
step() { STEPS+=("$1"); ART[$1]=$2; DEP[$1]=${3:-}; SKIPIF[$1]=${4:-}; FN[$1]=s_$1; }

# --- perf / driver-gate material (cheapest first: bench before studies) --
step bench            $RES/bench_r5_recapture.json ""
s_bench() {
  timeout 3600 python bench.py 2>&1 | grep -v WARNING | grep '^{' | tail -1 \
    > $RES/bench_r5_recapture.json
  [ -s $RES/bench_r5_recapture.json ] && cat $RES/bench_r5_recapture.json \
    || rm -f $RES/bench_r5_recapture.json
}

step train_sweep      $RES/train_batch_sweep.json ""
s_train_sweep() {  # training-step img/s at batch 128/256/512 (VERDICT #2)
  timeout 3600 python scripts/bench_train.py --json $RES/train_batch_sweep.json \
    2>&1 | grep -v WARNING | tail -8
}

# --- twins (small UNet, one per objective family) ------------------------
step eps_twin    runs/synstudy_linear_T1000/final_test.json "" $RES/vstudy_eps.json
s_eps_twin()    { train_run synstudy_linear_T1000 5400 $SMALL \
                    engine.diffusion_steps=1000 engine.mode=linear; }
step v_twin      runs/synstudy_linear_T1000_v/final_test.json "" $RES/vstudy_v.json
s_v_twin()      { train_run synstudy_linear_T1000_v 5400 $SMALL \
                    engine.diffusion_steps=1000 engine.mode=linear \
                    engine.prediction_type=v; }
step minsnr_twin runs/synstudy_linear_T1000_minsnr/final_test.json "" $RES/vstudy_minsnr.json
s_minsnr_twin() { train_run synstudy_linear_T1000_minsnr 5400 $SMALL \
                    engine.diffusion_steps=1000 engine.mode=linear \
                    engine.loss_weighting=min_snr; }
step edm_twin    runs/synstudy_linear_T1000_edm/final_test.json ""
s_edm_twin()    { train_run synstudy_linear_T1000_edm 5400 $SMALL \
                    engine.diffusion_steps=1000 engine.mode=linear \
                    engine.prediction_type=edm model.use_scale_shift_norm=true; }
step flow_twin   runs/synstudy_linear_T1000_flow/final_test.json "" $RES/flow_study.json
s_flow_twin()   { train_run synstudy_linear_T1000_flow 5400 $SMALL \
                    engine.diffusion_steps=1000 engine.mode=linear \
                    engine.prediction_type=flow model.use_scale_shift_norm=true; }

# --- T-grid completion (reference notebook's 4-point NLL grid) -----------
step t4000_cosine runs/synstudy_cosine_T4000/final_test.json "" $RES/nll_vs_T4000.json
s_t4000_cosine() { train_run synstudy_cosine_T4000 10800 $SMALL \
                     engine.diffusion_steps=4000 engine.mode=cosine; }
step t4000_linear runs/synstudy_linear_T4000/final_test.json "" $RES/nll_vs_T4000.json
s_t4000_linear() { train_run synstudy_linear_T4000 10800 $SMALL \
                     engine.diffusion_steps=4000 engine.mode=linear; }

# --- flagships -----------------------------------------------------------
step flagship      runs/flagship_linear_T1000/final_test.json "" $RES/karras_spacing.json
s_flagship()      { train_run flagship_linear_T1000 14400 $FLAG \
                      engine.diffusion_steps=1000 engine.mode=linear; }
step flagship_v    runs/flagship_linear_T1000_v/final_test.json "" $RES/karras_spacing_v.json
s_flagship_v()    { train_run flagship_linear_T1000_v 14400 $FLAG \
                      engine.diffusion_steps=1000 engine.mode=linear \
                      engine.prediction_type=v; }
step flagship_flow runs/flagship_linear_T1000_flow/final_test.json ""
s_flagship_flow() { train_run flagship_linear_T1000_flow 14400 $FLAG \
                      engine.diffusion_steps=1000 engine.mode=linear \
                      engine.prediction_type=flow; }

# --- CelebA-HQ 64 arm (BASELINE config #4 at synthetic-substitute scale;
# ema overridden 0.9999->0.995: the config's EMA horizon is matched to
# ~500k real-data steps and would freeze the average at init in a ~4k-step
# synthetic run) --------------------------------------------------------
step celebahq64    runs/celebahq64_synthetic/final_test.json ""
s_celebahq64() {
  train_run celebahq64_synthetic 21600 \
    model=unet_celebahq64 data=synthetic data.channels=3 data.n=1024 \
    data.batch_size=32 data.num_samples_per_epoch=1024 \
    engine=celebahq64 engine.ema=0.995 \
    trainer.max_epochs=120 trainer.check_val_every_n_epoch=10 \
    trainer.limit_test_batches=4 visualization=none out_dir=runs
}
step celebahq64_study $RES/celebahq64_study.json runs/celebahq64_synthetic/final_test.json
s_celebahq64_study() { study_run celebahq64_synthetic vstudy celebahq64_study.json; }

# --- bf16 train-path perf arm (VERDICT r4 next #2) -----------------------
# The r4 flagship trained at compute_dtype=float32 (the default): its
# measured 34% MFU-vs-bf16-peak is ~100% of the f32 (bf16x3-pass) ceiling,
# i.e. the f32 train step is already at speed-of-light and the MFU lever
# is the dtype.  This arm trains the SAME flagship with bf16 compute
# (f32 params/EMA/Adam), giving both the throughput artifact and the
# NLL-parity check against runs/flagship_linear_T1000.
step flagship_bf16 runs/flagship_linear_T1000_bf16/final_test.json ""
s_flagship_bf16() { train_run flagship_linear_T1000_bf16 14400 $FLAG \
                      engine.diffusion_steps=1000 engine.mode=linear \
                      model.compute_dtype=bfloat16; }
step train_tput_bf16 $RES/train_throughput_flagship_bf16.json runs/flagship_linear_T1000_bf16/final_test.json
s_train_tput_bf16() {
  timeout 600 python scripts/extract_train_throughput.py \
    runs/flagship_linear_T1000_bf16 > $RES/train_throughput_flagship_bf16.json \
    2> >(tail -5 >&2) || rm -f $RES/train_throughput_flagship_bf16.json
  tail -5 $RES/train_throughput_flagship_bf16.json 2>/dev/null
}

# --- twin studies (distributional sampler sets) --------------------------
step vstudy_eps    $RES/vstudy_eps.json    runs/synstudy_linear_T1000/final_test.json
s_vstudy_eps()    { study_run synstudy_linear_T1000 vstudy vstudy_eps.json 3600; }
step vstudy_v      $RES/vstudy_v.json      runs/synstudy_linear_T1000_v/final_test.json
s_vstudy_v()      { study_run synstudy_linear_T1000_v vstudy vstudy_v.json 3600; }
step vstudy_minsnr $RES/vstudy_minsnr.json runs/synstudy_linear_T1000_minsnr/final_test.json
s_vstudy_minsnr() { study_run synstudy_linear_T1000_minsnr vstudy vstudy_minsnr.json 3600; }
step edm_study     $RES/edm_study.json     runs/synstudy_linear_T1000_edm/final_test.json
s_edm_study()     { study_run synstudy_linear_T1000_edm edm edm_study.json; }
step flow_study    $RES/flow_study.json    runs/synstudy_linear_T1000_flow/final_test.json
s_flow_study()    { study_run synstudy_linear_T1000_flow flow flow_study.json; }

# --- flagship studies ----------------------------------------------------
step karras_eps    $RES/karras_spacing.json   runs/flagship_linear_T1000/final_test.json
s_karras_eps()    { study_run flagship_linear_T1000 karras karras_spacing.json; }
step karras_v      $RES/karras_spacing_v.json runs/flagship_linear_T1000_v/final_test.json
s_karras_v()      { study_run flagship_linear_T1000_v karras karras_spacing_v.json; }
step flow_flagship $RES/flow_flagship.json    runs/flagship_linear_T1000_flow/final_test.json
s_flow_flagship() { study_run flagship_linear_T1000_flow flow flow_flagship.json; }
step inpaint       $RES/inpaint_study.json    runs/flagship_linear_T1000/final_test.json
s_inpaint() {
  timeout 3600 python scripts/eval_inpaint.py runs/flagship_linear_T1000 64 1 \
    2>&1 | grep -v WARNING | tail -15
}

# --- few-step families: progressive distillation / reflow / consistency --
step distill       runs/flagship_linear_T1000_distillT125/checkpoints runs/flagship_linear_T1000/final_test.json $RES/distill_T125.json
s_distill() {
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.distill \
    run_dir=runs/flagship_linear_T1000 rounds=3 epochs=12 lr=1e-4 \
    out_dir=runs 2>&1 | grep -v WARNING | tail -10
}
step distill_eval  $RES/distill_T125.json runs/flagship_linear_T1000_distillT125/checkpoints
s_distill_eval() {
  timeout 3600 python scripts/eval_distill.py runs/flagship_linear_T1000 \
    runs/flagship_linear_T1000_distillT125 128 2>&1 | grep -v WARNING | tail -10
}
step reflow        runs/synstudy_linear_T1000_flow_reflow/final_test.json runs/synstudy_linear_T1000_flow/final_test.json $RES/fewstep_reflow.json
s_reflow() {
  rm -rf runs/synstudy_linear_T1000_flow_reflow
  timeout 7200 python -m probabilisticdeepdiffusionmodels_tpu.cli.reflow \
    run_dir=runs/synstudy_linear_T1000_flow n_couplings=4096 \
    batch_size=128 epochs=8 minibatch_gen=128 gen_steps=50 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
}
step fewstep_teacher $RES/fewstep_teacher.json runs/synstudy_linear_T1000_flow/final_test.json
s_fewstep_teacher() { study_run synstudy_linear_T1000_flow fewstep fewstep_teacher.json; }
step fewstep_reflow  $RES/fewstep_reflow.json runs/synstudy_linear_T1000_flow_reflow/final_test.json
s_fewstep_reflow()  { study_run synstudy_linear_T1000_flow_reflow fewstep fewstep_reflow.json; }
step flagship_reflow runs/flagship_linear_T1000_flow_reflow/final_test.json runs/flagship_linear_T1000_flow/final_test.json $RES/fewstep_flagship_reflow.json
s_flagship_reflow() {
  rm -rf runs/flagship_linear_T1000_flow_reflow
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.reflow \
    run_dir=runs/flagship_linear_T1000_flow n_couplings=4096 \
    batch_size=128 epochs=8 minibatch_gen=128 gen_steps=50 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
}
step fewstep_flag_teacher $RES/fewstep_flagship_teacher.json runs/flagship_linear_T1000_flow/final_test.json
s_fewstep_flag_teacher() { study_run flagship_linear_T1000_flow fewstep fewstep_flagship_teacher.json; }
step fewstep_flag_reflow  $RES/fewstep_flagship_reflow.json runs/flagship_linear_T1000_flow_reflow/final_test.json
s_fewstep_flag_reflow()  { study_run flagship_linear_T1000_flow_reflow fewstep fewstep_flagship_reflow.json; }
step cd_flagship   runs/flagship_linear_T1000_flow_cd/final_test.json runs/flagship_linear_T1000_flow/final_test.json
s_cd_flagship() {
  rm -rf runs/flagship_linear_T1000_flow_cd
  timeout 10800 python -m probabilisticdeepdiffusionmodels_tpu.cli.consistency \
    run_dir=runs/flagship_linear_T1000_flow epochs=60 \
    limit_test_batches=4 out_dir=runs 2>&1 | grep -v WARNING | tail -4
}
step cm_flagship   $RES/cm_flagship.json runs/flagship_linear_T1000_flow_cd/final_test.json
s_cm_flagship()   { study_run flagship_linear_T1000_flow_cd cm cm_flagship.json; }

# --- exact likelihood ----------------------------------------------------
step ode_nll_flow  $RES/ode_nll_flagship.json runs/flagship_linear_T1000_flow/final_test.json
s_ode_nll_flow() {
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
}
step ode_nll_edm   $RES/ode_nll_edm_twin.json runs/synstudy_linear_T1000_edm/final_test.json
s_ode_nll_edm() {
  timeout 3600 python - <<'EOF' 2>&1 | grep -v WARNING | tail -4
import json
from probabilisticdeepdiffusionmodels_tpu.cli.eval import main as eval_main
out = {}
for steps in (50, 100):
    r = eval_main([
        "run_dir=runs/synstudy_linear_T1000_edm",
        "trainer.limit_test_batches=4", "ode_nll=true", f"ode_steps={steps}",
    ])
    out[f"ode_{steps}"] = {"test_nll": r["test_nll"], "test_ode_nll": r["test_ode_nll"]}
with open("docs/results/ode_nll_edm_twin.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/results/ode_nll_edm_twin.json", out)
EOF
}

# --- serving / training envelopes (after studies: cheap-chip-time last) --
step serving       $RES/serving_envelope.json ""
s_serving() {
  timeout 5400 python scripts/bench_serving_envelope.py 2>&1 \
    | grep -v WARNING | tail -24
}
step train_tput    $RES/train_throughput_flagship_r4.json runs/flagship_linear_T1000/final_test.json
s_train_tput() {
  timeout 600 python scripts/extract_train_throughput.py \
    runs/flagship_linear_T1000 > $RES/train_throughput_flagship_r4.json \
    2> >(tail -5 >&2) || rm -f $RES/train_throughput_flagship_r4.json
  tail -5 $RES/train_throughput_flagship_r4.json 2>/dev/null
}

# ---------- driver -------------------------------------------------------
# A producer whose SKIPIF study is committed must STILL run when some
# pending step depends on its artifact (review r5: otherwise a wiped
# runs/ checkpoint starves every downstream step into "SKIPPED: missing
# dep" and the queue's re-create-missing-evidence contract breaks).
dep_needed() {
  local art=$1 t
  for t in "${STEPS[@]}"; do
    [ "${DEP[$t]}" = "$art" ] || continue
    [ -e "${ART[$t]}" ] && continue
    if [ -n "${SKIPIF[$t]}" ] && [ -e "${SKIPIF[$t]}" ]; then continue; fi
    return 0
  done
  return 1
}

list_steps() {
  for s in "${STEPS[@]}"; do
    if [ -e "${ART[$s]}" ]; then st=SKIP
    elif [ -n "${SKIPIF[$s]}" ] && [ -e "${SKIPIF[$s]}" ] \
         && ! dep_needed "${ART[$s]}"; then st="SKIP(captured: ${SKIPIF[$s]})"
    elif [ -n "${DEP[$s]}" ] && [ ! -e "${DEP[$s]}" ]; then st="WAIT(${DEP[$s]})"
    else st=RUN; fi
    printf "%-22s %-55s %s\n" "$s" "${ART[$s]}" "$st"
  done
}

if [ "${1:-}" = "--list" ]; then list_steps; exit 0; fi

SELECT=("$@")
want() {
  [ ${#SELECT[@]} -eq 0 ] && return 0
  for w in "${SELECT[@]}"; do [ "$w" = "$1" ] && return 0; done
  return 1
}

LOCK=/tmp/pddm_queue.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "another queue.sh holds $LOCK; refusing to run two TPU queues"; exit 1
fi
echo $$ > /tmp/pddm_queue.pid

for s in "${STEPS[@]}"; do
  want "$s" || continue
  if [ -e "${ART[$s]}" ]; then continue; fi
  if [ -n "${SKIPIF[$s]}" ] && [ -e "${SKIPIF[$s]}" ] \
     && ! dep_needed "${ART[$s]}"; then continue; fi
  if [ -n "${DEP[$s]}" ] && [ ! -e "${DEP[$s]}" ]; then
    echo "=== $s SKIPPED: missing dep ${DEP[$s]} $(date +%H:%M) ==="; continue
  fi
  echo "=== $s start $(date +%H:%M) ==="
  wait_tpu
  ${FN[$s]}
  if [ -e "${ART[$s]}" ]; then
    echo "=== $s done $(date +%H:%M) ==="
  else
    echo "=== $s FAILED (no artifact) $(date +%H:%M) ==="
  fi
done
echo "=== queue complete $(date +%H:%M) ==="
