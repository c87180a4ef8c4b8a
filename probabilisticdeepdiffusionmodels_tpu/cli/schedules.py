"""Schedule analysis tool — the reference's results/schedules notebook as a CLI.

The reference records its only results in notebooks
(notebooks/results_and_schedules.ipynb: NLL-vs-T tables and beta/alpha-bar
shape studies incl. the mixed and capped-cosine variants).  This CLI
reproduces the schedule-shape studies as reproducible artifacts:

    python -m probabilisticdeepdiffusionmodels_tpu.cli.schedules \
        --steps 1000 --out schedules.png
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..core.schedules import NoiseSchedule

REFERENCE_NLL = {
    # bits/dim from notebooks/results_and_schedules.ipynb cells 1-2
    ("cifar10", "cosine"): {50: 5.431, 200: 4.34, 1000: 3.869, 4000: 3.496},
    ("cifar10", "linear"): {50: 5.623, 200: 4.641, 1000: 3.924, 4000: 3.568},
    ("mnist", "cosine"): {50: 2.39, 200: 2.024, 1000: 1.605, 4000: 1.39},
    ("mnist", "linear"): {50: 2.796, 200: 2.229, 1000: 1.74, 4000: 1.399},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--out", type=str, default="schedules.png")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for mode in ("linear", "cosine", "mixed"):
        s = NoiseSchedule.create(diffusion_steps=args.steps, mode=mode)
        t = np.arange(1, args.steps + 1)
        axes[0].plot(t, s.betas, label=mode)
        axes[1].plot(t, s.alphas_hat, label=mode)
        axes[2].plot(t, np.sqrt(s.posterior_variance), label=mode)
    axes[0].set_title("beta_t")
    axes[1].set_title("alpha-bar_t")
    axes[2].set_title("sqrt(posterior variance)")
    for ax in axes:
        ax.legend()
        ax.set_xlabel("t")
    fig.savefig(args.out, bbox_inches="tight", dpi=120)
    print(f"[schedules] wrote {args.out}")

    print("\nReference NLL (bits/dim) to beat "
          "(notebooks/results_and_schedules.ipynb):")
    for (ds, mode), vals in REFERENCE_NLL.items():
        print(f"  {ds:8s} {mode:7s} " +
              "  ".join(f"T={k}: {v}" for k, v in vals.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
