"""Progressive-distillation entry point (beyond the reference).

Halve a trained run's sampling chain K times (Salimans & Ho,
arXiv:2202.00512 §3): each round trains a v-parameterized student over the
respaced half-chain to match two teacher DDIM steps with one, then the
student becomes the next round's teacher.

    python -m probabilisticdeepdiffusionmodels_tpu.cli.distill \
        run_dir=runs/flagship_linear_T1000 rounds=3 epochs=20

Each round writes a full run directory (`<teacher>_distillT<T>`): config +
checkpoint + final NLL — loadable by cli.sample / cli.eval / cli.fid_score
exactly like a trained run (the student is a self-contained engine over
its own T/2-step schedule).
"""

from __future__ import annotations

import json
import sys

import numpy as np

from ..config import load_config
from ..logging.sink import MetricLogger, RunDir
from ..train.checkpoint import CheckpointManager
from ..train.distill import distill_round, halved_student
from .sample import load_engine_from_run
from .train import build_loaders

__all__ = ["run_distillation", "student_run_config", "main"]


def student_run_config(student, run_cfg) -> dict:
    """A config that rebuilds a student engine verbatim (betas list rides
    in the engine section), with the teacher's data/model groups so the
    sample/eval/fid CLIs work on the student run.  Shared by cli.distill
    and cli.reflow — the hparams exclusion list must stay in ONE place
    (keys here are trainer/loop-owned and not engine-constructor
    kwargs)."""
    scfg = dict(run_cfg)
    eng_cfg = {
        k: v for k, v in student.hparams.items()
        if k not in ("model_config", "optimizer_config",
                     "scheduler_name", "scheduler_kwargs", "seed",
                     "accumulate_grad_batches", "grad_clip")
    }
    eng_cfg["optimizer_config"] = student.hparams["optimizer_config"]
    scfg["engine"] = eng_cfg
    scfg["model"] = dict(student.hparams["model_config"])
    scfg["scheduler"] = {}
    return scfg


def run_distillation(cfg) -> dict:
    assert cfg.get("run_dir"), "pass run_dir=<path to the trained teacher>"
    teacher, run_cfg = load_engine_from_run(cfg["run_dir"])
    train_loader, val_loader = build_loaders(run_cfg)
    out_dir = cfg.get("out_dir", "./runs")
    rounds = int(cfg.get("rounds", 1))
    epochs = int(cfg.get("epochs", 10))
    lr = cfg.get("lr")
    results = {}

    base_name = str(cfg["run_dir"]).rstrip("/").rsplit("/", 1)[-1]
    for r in range(rounds):
        use_ema_teacher = bool(cfg.get("use_ema_teacher", True))
        student = halved_student(
            teacher, lr=(float(lr) if lr else None),
            ema=float(cfg.get("ema", 0.995)),
            use_ema_teacher=use_ema_teacher,
        )
        T_s = student.diffusion_steps
        run = RunDir(out_dir, f"{base_name}_distillT{T_s}")
        run.save_config(student_run_config(student, run_cfg))
        logger = MetricLogger(run)
        print(f"[distill] round {r + 1}/{rounds}: T {teacher.diffusion_steps}"
              f" -> {T_s}, {epochs} epochs -> {run.path}")

        cond = bool(getattr(teacher.model, "num_classes", None))

        def batches():
            for _ in range(epochs):
                for x0, y in train_loader:
                    # labels thread only into conditional models (an
                    # unconditional UNet rejects y)
                    yield x0, (y if cond else None)

        last = distill_round(
            student, teacher, batches(),
            log_every=int(cfg.get("log_every", 50)),
            log=lambda m: print(m, flush=True),
            guidance_scale=cfg.get("guidance_scale"),
            use_ema_teacher=use_ema_teacher,
        )
        logger.log(last, step=int(student.state.step))

        ckpt = CheckpointManager(run.checkpoint_dir())
        ckpt.save(student.state, int(student.state.step),
                  metrics={"val_loss": last.get("loss", 0.0)})
        ckpt.close()

        # final NLL of the distilled chain (comparable to the teacher's
        # final_test.json)
        limit = int(cfg.get("limit_test_batches", 4))
        nlls = []
        for i, (x, y) in enumerate(val_loader):
            if i >= limit:
                break
            m = student.test_step(x, seed=i, y=y)
            nlls.append(m)
        test = {k: float(np.mean([m[k] for m in nlls])) for k in nlls[0]}
        (run.path / "final_test.json").write_text(
            json.dumps({**last, **test}, default=float)
        )
        print(f"[distill] T={T_s} done: {last} test: {test}")
        results[T_s] = {**last, **test}
        teacher = student  # next round halves again

    return results


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("distill", argv)
    return run_distillation(cfg)


if __name__ == "__main__":
    main()
