"""NLL evaluation entry point (bits/dim test suite).

Reference surface: scripts/eval.py:20-83 — seed, load checkpoint, run the
trainer.test NLL suite on the train-or-val loader with limit_test_batches.

    python -m probabilisticdeepdiffusionmodels_tpu.cli.eval \
        run_dir=runs/run-xyz use_train_data=false trainer.limit_test_batches=10
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import load_config
from .sample import load_engine_from_run
from .train import build_loaders

__all__ = ["run_eval", "main"]


def run_eval(cfg) -> dict:
    assert cfg.get("run_dir"), "pass run_dir=<path to a training run>"
    engine, run_cfg = load_engine_from_run(cfg["run_dir"])

    use_train = bool(cfg.get("use_train_data", True))
    train_loader, val_loader = build_loaders(run_cfg)
    loader = train_loader if use_train else val_loader

    limit = (cfg.get("trainer") or {}).get("limit_test_batches")
    seed = int(cfg.get("seed", 0) or 0)

    # ode_nll=true on a flow/edm run adds the EXACT continuous-time
    # likelihood (evals/ode_nll.py) next to the discrete VLB columns
    ode = bool(cfg.get("ode_nll", False))
    if ode and engine.prediction_type not in ("flow", "edm"):
        raise ValueError(
            'ode_nll=true needs a prediction_type="flow" or "edm" run'
        )

    agg: dict = {}
    for i, (x, y) in enumerate(loader):
        if limit is not None and i >= int(limit):
            break
        m = engine.test_step(x, seed=seed + i, y=y)
        if ode:
            o = engine.calculate_ode_likelihood(
                x, seed=seed + i, y=y,
                n_steps=int(cfg.get("ode_steps", 100)),
                n_probes=int(cfg.get("ode_probes", 1)),
            )
            m["test_ode_nll"] = float(np.mean(o["nll_bits_per_dim"]))
        for k, v in m.items():
            agg.setdefault(k, []).append(v)
    result = {k: float(np.mean(v)) for k, v in agg.items()}
    print(f"[eval] {result}")
    return result


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("eval", argv)
    return run_eval(cfg)


if __name__ == "__main__":
    main()
