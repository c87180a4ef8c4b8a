"""Trained-model evidence for RePaint inpainting (arXiv:2201.09865).

Masks the right half of held-out synthetic images, inpaints with the
trained flagship, and reports:

  * known-RMSE  — must be 0.0 exactly (the loop re-imposes x0);
  * fill-RMSE   — inpainted vs ground-truth unknown half.  The synthetic
    plaids are global sinusoids, so a model that learned the distribution
    can genuinely extrapolate the hidden half from the visible one; RMSE
    against the true continuation measures that;
  * seam-grad   — mean |x-gradient| across the mask boundary column vs the
    dataset's own mean |x-gradient| (a seam artifact shows up as a spike);
  * a random-fill yardstick: the same metrics when the hidden half is an
    UNCONDITIONED sample (mask ignored), i.e. what "no conditioning" looks
    like.

Writes docs/results/inpaint_study.json and an 8-image before/masked/after
grid to docs/results/inpaint_grid.png.

Usage: python scripts/eval_inpaint.py [run_dir] [n] [resample_steps]
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/flagship_linear_T1000"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    resample = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax.numpy as jnp

    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.data.datasets import (
        make_synthetic,
    )

    engine, cfg = load_engine_from_run(run_dir)
    dcfg = cfg.get("data", {})
    res = int(cfg["engine"]["resolution"])
    ds = make_synthetic(
        resolution=res, channels=int(dcfg.get("channels", 3)),
        n=int(dcfg.get("n", 2048)),
    )
    data = ds.images.astype(np.float32) / 255.0 * 2.0 - 1.0
    rng = np.random.default_rng(0)
    x0 = data[rng.choice(len(data), n, replace=False)]

    mask = np.zeros((res, res, 1), np.float32)
    mask[:, : res // 2] = 1.0  # left half known, right half filled
    hidden = np.broadcast_to(mask == 0, x0.shape)

    out = np.asarray(
        engine.inpaint(jnp.asarray(x0), jnp.asarray(mask), seed=7,
                       resample_steps=resample)
    )
    uncond = np.asarray(engine.generate_images(n=n, minibatch=n, seed=7))

    def seam_grad(x):
        c = res // 2
        return float(np.abs(x[:, :, c, :] - x[:, :, c - 1, :]).mean())

    data_grad = float(np.abs(np.diff(data, axis=2)).mean())
    report = {
        "run": run_dir, "n": n, "resample_steps": resample,
        "known_rmse": float(
            np.sqrt(((out - x0)[~hidden] ** 2).mean())
        ),
        "fill_rmse": float(np.sqrt(((out - x0)[hidden] ** 2).mean())),
        "uncond_fill_rmse_yardstick": float(
            np.sqrt(((uncond - x0)[hidden] ** 2).mean())
        ),
        "seam_grad": seam_grad(out),
        "data_grad_mean": data_grad,
        "fill_std": float(out[hidden].std()),
        "data_std": float(x0[hidden].std()),
    }
    print(json.dumps(report, indent=1), flush=True)

    dest = Path("docs/results")
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "inpaint_study.json").write_text(json.dumps(report, indent=1))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    k = min(8, n)
    fig, axes = plt.subplots(3, k, figsize=(2 * k, 6), squeeze=False)
    masked = x0 * mask + (-1.0) * (1 - mask)
    for j in range(k):
        for i, (img, name) in enumerate(
            [(x0[j], "original"), (masked[j], "masked"), (out[j], "inpainted")]
        ):
            ax = axes[i, j]
            ax.imshow(((img + 1) / 2).clip(0, 1))
            ax.set_axis_off()
            if j == 0:
                ax.set_title(name, loc="left", fontsize=9)
    fig.tight_layout()
    fig.savefig(dest / "inpaint_grid.png", dpi=110)
    print("wrote", dest / "inpaint_grid.png")


if __name__ == "__main__":
    main()
