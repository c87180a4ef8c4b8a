"""Consistency-distillation entry point (beyond the reference).

Distill a trained run into a consistency model for 1/few-step sampling
(Song et al., arXiv:2303.01469, with the iCT training choices,
arXiv:2310.14189): the student's f(x, sigma) learns to map any point of
the teacher's PF-ODE trajectories straight to their endpoint, supervised
by single teacher Heun steps between adjacent Karras-grid sigmas.

    python -m probabilisticdeepdiffusionmodels_tpu.cli.consistency \
        run_dir=runs/flagship_linear_T1000_v epochs=20

Works on eps/v/x0 teachers (eps-view denoiser at the nearest table
timestep) and edm/flow teachers (exact continuous-sigma denoiser) — see
train/consistency.py.  Writes a full run directory (`<teacher>_cd`):
config + checkpoint + the CT validation loss — loadable by cli.sample
(sampler=consistency) exactly like a trained run.  Teacher-free
consistency TRAINING is the engine's own prediction_type="consistency"
train step, reachable via cli.train.
"""

from __future__ import annotations

import json
import sys

import jax
import numpy as np

from ..config import load_config
from ..logging.sink import MetricLogger, RunDir
from ..train.checkpoint import CheckpointManager
from ..train.consistency import consistency_distill_round, consistency_student
from .sample import load_engine_from_run
from .train import build_loaders

__all__ = ["run_consistency_distillation", "main"]


def run_consistency_distillation(cfg) -> dict:
    assert cfg.get("run_dir"), "pass run_dir=<path to the trained teacher>"
    teacher, run_cfg = load_engine_from_run(cfg["run_dir"])
    train_loader, val_loader = build_loaders(run_cfg)
    out_dir = cfg.get("out_dir", "./runs")
    epochs = int(cfg.get("epochs", 10))
    use_ema_teacher = bool(cfg.get("use_ema_teacher", True))

    cm_cfg = {
        k: cfg[k]
        for k in ("sigma_data", "sigma_min", "sigma_max", "rho",
                  "grid_size", "metric", "huber_c", "weighting", "target")
        if cfg.get(k) is not None
    } or None
    student = consistency_student(
        teacher,
        lr=(float(cfg["lr"]) if cfg.get("lr") else None),
        ema=float(cfg.get("ema", 0.995)),
        consistency_config=cm_cfg,
        use_ema_teacher=use_ema_teacher,
        warm_start=bool(cfg.get("warm_start", True)),
    )

    base_name = str(cfg["run_dir"]).rstrip("/").rsplit("/", 1)[-1]
    run = RunDir(out_dir, f"{base_name}_cd")
    from .distill import student_run_config

    run.save_config(student_run_config(student, run_cfg))
    logger = MetricLogger(run)
    print(f"[consistency] teacher {cfg['run_dir']} "
          f"({teacher.prediction_type}) -> consistency student {run.path}")

    cond = bool(getattr(teacher.model, "num_classes", None))

    def batches():
        for _ in range(epochs):
            for x0, y in train_loader:
                # labels thread only into conditional models (an
                # unconditional UNet rejects y)
                yield x0, (y if cond else None)

    last = consistency_distill_round(
        student, teacher, batches(),
        log_every=int(cfg.get("log_every", 50)),
        log=lambda m: print(m, flush=True),
        use_ema_teacher=use_ema_teacher,
    )
    logger.log(last, step=int(student.state.step))

    ckpt = CheckpointManager(run.checkpoint_dir())
    ckpt.save(student.state, int(student.state.step),
              metrics={"val_loss": last.get("loss", 0.0)})
    ckpt.close()

    # the student has no eps-view (it predicts the ODE endpoint, not the
    # score), so the discrete VLB is undefined; record the CT validation
    # loss as the comparable final metric
    limit = int(cfg.get("limit_test_batches", 4))
    losses = []
    for i, (x, y) in enumerate(val_loader):
        if i >= limit:
            break
        out = student.validation_step(
            x, rng=jax.random.PRNGKey(i), y=(y if cond else None)
        )
        losses.append(float(out["val_loss"]))
    test = {"test_ct_loss": float(np.mean(losses))}
    (run.path / "final_test.json").write_text(
        json.dumps({**last, **test}, default=float)
    )
    print(f"[consistency] done: {last} test: {test}")
    return {**last, **test, "run_dir": str(run.path)}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("consistency", argv)
    return run_consistency_distillation(cfg)


if __name__ == "__main__":
    main()
