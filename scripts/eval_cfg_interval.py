"""Guidance-interval study on the trained cfg_class run (round 3).

"Applying Guidance in a Limited Interval Improves Sample and Distribution
Quality" (Kynkäänniemi et al., arXiv:2404.07724) — we measure its two
claims on the trained synthetic class-conditional model:

  1. fidelity: a mid-chain guidance window recovers (or beats) the
     full-chain guided accuracy;
  2. cost: off-window steps run ONE plain forward (lax.cond), so a narrow
     window approaches unguided throughput while keeping guided fidelity.

Fixed guidance_scale=2 (the measured fidelity peak, docs/results/
cfg_study.json); sweeps windows over the T=1000 ancestral chain.  Writes
docs/results/cfg_interval_study.json.  Usage:
    python scripts/eval_cfg_interval.py [run_dir]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from eval_conditional import class_band_range, dominant_band  # noqa: E402

SCALE = 2.0
WINDOWS = [None, (1, 1000), (100, 700), (200, 600), (300, 500), (400, 500)]


def main():
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.data.transforms import unnormalize

    run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/cfg_class")
    engine, cfg = load_engine_from_run(run_dir)
    normalize = (cfg["data"].get("transformation_kwargs") or {}).get("normalize")

    n_per_class = 64
    results = {}
    for win in WINDOWS:
        kw = {} if win is None else dict(
            guidance_scale=SCALE, guidance_interval=win
        )
        if win is None:
            name = "unguided"
        elif win == (1, 1000):
            name = "full"
        else:
            name = f"{win[0]}-{win[1]}"
        correct = total = 0
        elapsed = 0.0
        for cls in range(10):
            y = np.full((n_per_class,), cls, np.int32)
            t0 = time.perf_counter()
            imgs = engine.generate_images(
                n=n_per_class, minibatch=64, seed=300 + cls, y=y, **kw
            )
            if cls > 0:  # first class pays the compile
                elapsed += time.perf_counter() - t0
            imgs01 = unnormalize(imgs, normalize=normalize, clip=True)
            dom = dominant_band(imgs01)
            lo, hi = class_band_range(cls)
            correct += int(np.sum((dom >= lo) & (dom < hi)))
            total += len(dom)
        guided_steps = 0 if win is None else min(win[1], 1000) - max(win[0], 1) + 1
        results[name] = dict(
            window=list(win) if win else None,
            guided_steps=guided_steps,
            band_in_class_bin_acc=correct / total,
            img_per_s=round(9 * n_per_class / elapsed, 2),
        )
        print(f"{name}: acc={results[name]['band_in_class_bin_acc']:.3f} "
              f"{results[name]['img_per_s']} img/s "
              f"({guided_steps} guided steps)", flush=True)

    out = dict(
        scale=SCALE,
        windows=results,
        n_per_class=n_per_class,
        note=(
            "trained cfg_class run, ancestral T=1000; acc = dominant-band-"
            "in-class-bin (eval_conditional.py); img/s excludes the "
            "compile (first class per config)"
        ),
    )
    dest = REPO / "docs" / "results" / "cfg_interval_study.json"
    dest.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
