"""Profiling entry point (beyond the reference, whose only profiling is a
thop FLOP hook — src/modules/unet.py:258-279).

Captures a TensorBoard-loadable XLA trace of the training step and/or the
sampling chain of a trained run, plus wall-clock timings and the analytic
FLOP/MFU estimate from utils.profiling:

    python -m probabilisticdeepdiffusionmodels_tpu.cli.profile \
        run_dir=runs/<name> steps=5 sample_steps=50

Writes <run_dir>/profile/ with the trace directories and a timings.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax

from ..config import load_config
from ..utils.profiling import trace, unet_flops

__all__ = ["run_profile", "main"]


def run_profile(cfg) -> dict:
    assert cfg.get("run_dir"), "pass run_dir=<path to a training run>"
    from .sample import load_engine_from_run

    engine, run_cfg = load_engine_from_run(cfg["run_dir"])
    out = Path(cfg["run_dir"]) / "profile"
    out.mkdir(exist_ok=True)

    res = engine.resolution
    b = int(cfg.get("batch_size", 8))
    steps = int(cfg.get("steps", 3))
    sample_steps = cfg.get("sample_steps")
    x = np.random.default_rng(0).normal(
        size=(b, res, res, engine.in_channels)
    ).astype(np.float32)

    timings = {"batch_size": b}
    mc = dict(run_cfg["model"])
    try:
        flops = unet_flops(
            res, engine.in_channels, mc["model_channels"],
            mc["num_res_blocks"], mc.get("attention_resolutions", []),
            mc["channel_mult"], mc.get("num_heads", 1),
        )
        timings["fwd_gflops"] = round(flops / 1e9, 2)
    except (KeyError, TypeError):
        pass

    # conditional runs need a conditioning batch or engine._cond raises:
    # synthesize zero labels (class) / a downsampled batch (superres)
    y = None
    if engine.cond_kind == "class":
        y = np.zeros((b,), np.int64)
    elif engine.cond_kind == "superres":
        low = max(1, res // 2)
        y = np.random.default_rng(1).normal(
            size=(b, *(low,) * engine.dims, engine.in_channels)
        ).astype(np.float32)

    if steps:
        # warm the jit OUTSIDE the trace so it records steady-state
        # programs, not compilation
        engine.training_step(x, y)
        t0 = time.perf_counter()
        with trace(str(out / "train_trace")):
            for _ in range(steps):
                m = engine.training_step(x, y)
            jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        timings["train_step_ms"] = round(1e3 * dt / steps, 3)
        timings["train_img_per_sec"] = round(b * steps / dt, 2)

    if sample_steps is not None:
        engine.generate_images(n=b, minibatch=b, seed=0,
                               num_sample_steps=sample_steps, y=y)
        t0 = time.perf_counter()
        with trace(str(out / "sample_trace")):
            imgs = engine.generate_images(
                n=b, minibatch=b, seed=1, num_sample_steps=sample_steps, y=y
            )
            jax.block_until_ready(imgs)
        dt = time.perf_counter() - t0
        timings["sample_chain_s"] = round(dt, 3)
        timings["sample_img_per_sec"] = round(b / dt, 2)

    (out / "timings.json").write_text(json.dumps(timings, indent=1))
    print(f"[profile] {timings}")
    print(f"[profile] traces in {out} (load with TensorBoard)")
    return timings


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("profile", argv)
    return run_profile(cfg)


if __name__ == "__main__":
    main()
