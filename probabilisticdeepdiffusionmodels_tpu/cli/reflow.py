"""Reflow / rectification entry point (beyond the reference).

Straighten a trained run's generative ODE (Liu et al., arXiv:2209.03003
§3.2): generate deterministic (z, x) couplings from the teacher, then
train a flow-matching student on them so 1-4 Euler steps sample well.

    python -m probabilisticdeepdiffusionmodels_tpu.cli.reflow \
        run_dir=runs/synstudy_linear_T1000_flow n_couplings=4096 epochs=8

Works on flow teachers (native-ODE couplings) AND eps/v/x0/edm teachers
(eps-view DDIM / DPM++ couplings) — see train/reflow.py.  Writes a full
run directory (`<teacher>_reflow`): config + checkpoint + final NLL —
loadable by cli.sample / cli.eval / cli.fid_score exactly like a trained
run (the student is a self-contained flow engine over the teacher's
schedule tables).
"""

from __future__ import annotations

import json
import sys

import jax
import numpy as np

from ..config import load_config
from ..logging.sink import MetricLogger, RunDir
from ..train.checkpoint import CheckpointManager
from ..train.reflow import reflow_round, reflow_student
from .sample import load_engine_from_run
from .train import build_loaders

__all__ = ["run_reflow", "main"]


def run_reflow(cfg) -> dict:
    assert cfg.get("run_dir"), "pass run_dir=<path to the trained teacher>"
    teacher, run_cfg = load_engine_from_run(cfg["run_dir"])
    _, val_loader = build_loaders(run_cfg)
    out_dir = cfg.get("out_dir", "./runs")
    use_ema_teacher = bool(cfg.get("use_ema_teacher", True))

    student = reflow_student(
        teacher,
        lr=(float(cfg["lr"]) if cfg.get("lr") else None),
        ema=float(cfg.get("ema", 0.995)),
        use_ema_teacher=use_ema_teacher,
        warm_start=bool(cfg.get("warm_start", True)),
    )

    gen_sampler = cfg.get("gen_sampler")
    sampler_kwargs = None
    if gen_sampler is not None:
        steps = int(cfg.get("gen_steps", 50))
        sampler_kwargs = {
            "flow": dict(flow=True, num_sample_steps=steps),
            "ddim": dict(ddim=True, num_sample_steps=steps),
            "dpmpp": dict(dpm_solver=True, num_sample_steps=steps),
        }[gen_sampler]

    base_name = str(cfg["run_dir"]).rstrip("/").rsplit("/", 1)[-1]
    run = RunDir(out_dir, f"{base_name}_reflow")
    from .distill import student_run_config

    run.save_config(student_run_config(student, run_cfg))
    logger = MetricLogger(run)
    print(f"[reflow] teacher {cfg['run_dir']} "
          f"({teacher.prediction_type}) -> flow student {run.path}")

    n_couplings = int(cfg.get("n_couplings", 4096))
    # conditional teachers need labels for the coupling generation (the
    # student then rectifies the per-class ODEs); cycle the classes so
    # every class is covered evenly
    y = None
    num_classes = int(getattr(teacher.model, "num_classes", 0) or 0)
    if num_classes:
        y = np.arange(n_couplings) % num_classes

    last = reflow_round(
        student, teacher, jax.random.PRNGKey(int(cfg.get("seed", 0))),
        n_couplings=n_couplings,
        batch_size=int(cfg.get("batch_size", 64)),
        epochs=int(cfg.get("epochs", 8)),
        minibatch_gen=int(cfg.get("minibatch_gen", 64)),
        sampler_kwargs=sampler_kwargs,
        use_ema_teacher=use_ema_teacher,
        y=y,
        log_every=int(cfg.get("log_every", 50)),
        log=lambda m: print(m, flush=True),
    )
    logger.log(last, step=int(student.state.step))

    ckpt = CheckpointManager(run.checkpoint_dir())
    ckpt.save(student.state, int(student.state.step),
              metrics={"val_loss": last.get("loss", 0.0)})
    ckpt.close()

    # final NLL through the student's eps-view (comparable to the
    # teacher's final_test.json)
    limit = int(cfg.get("limit_test_batches", 4))
    nlls = []
    for i, (x, y) in enumerate(val_loader):
        if i >= limit:
            break
        nlls.append(student.test_step(x, seed=i, y=y))
    test = {k: float(np.mean([m[k] for m in nlls])) for k in nlls[0]}
    (run.path / "final_test.json").write_text(
        json.dumps({**last, **test}, default=float)
    )
    print(f"[reflow] done: {last} test: {test}")
    return {**last, **test}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("reflow", argv)
    return run_reflow(cfg)


if __name__ == "__main__":
    main()
