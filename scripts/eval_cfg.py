"""Classifier-free guidance study on a TRAINED model (round 3).

Requires a run trained with ``model.cfg_null_class=true`` and
``engine.class_dropout_prob>0`` (scripts: the cfg_class run below mirrors
train_conditional_study.sh's class-conditional arm plus dropout):

    python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
      data=synthetic ... model=unet_small model.num_classes=10 \
      model.cfg_null_class=true model.use_scale_shift_norm=true \
      engine.class_dropout_prob=0.1 run_name=cfg_class

Sweeps guidance_scale in {0, 1, 2, 4, 7} and measures, per scale:
  * conditioning fidelity — the synthetic labels encode the channel-0
    horizontal-frequency band (data/datasets.py:make_synthetic), so
    dominant-band-in-class-bin accuracy is a direct conditional-fidelity
    metric (same metric as scripts/eval_conditional.py);
  * sample diversity — per-class std of the dominant band and global
    pixel std (CFG's known fidelity<->diversity tradeoff: scale up =>
    sharper conditioning, narrower distribution);
  * s=0 is the unconditional marginal the null token learned (accuracy
    should be ~chance), s=1 is plain conditional sampling.

Writes docs/results/cfg_study.json and a per-scale sample grid into the
run's media dir.  Usage: python scripts/eval_cfg.py [run_dir]
"""

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from eval_conditional import class_band_range, dominant_band  # noqa: E402

SCALES = (0.0, 1.0, 2.0, 4.0, 7.0)


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
    grid = {}  # scale -> one row of 10 imgs (one per class)
    for s in SCALES:
        correct = near = total = 0
        band_std = []
        pix_std = []
        row = []
        for cls in range(10):
            y = np.full((n_per_class,), cls, np.int32)
            imgs = engine.generate_images(
                n=n_per_class, minibatch=64, seed=200 + cls, y=y,
                guidance_scale=float(s),
            )
            imgs01 = unnormalize(imgs, normalize=normalize, clip=True)
            dom = dominant_band(imgs01)
            lo, hi = class_band_range(cls)
            correct += int(np.sum((dom >= lo) & (dom < hi)))
            near += int(np.sum((dom >= lo - 0.3) & (dom < hi + 0.3)))
            total += len(dom)
            band_std.append(float(dom.std()))
            pix_std.append(float(imgs01.std()))
            row.append(imgs01[0])
        results[s] = dict(
            band_in_class_bin_acc=correct / total,
            band_within1_acc=near / total,
            mean_band_std=float(np.mean(band_std)),
            mean_pixel_std=float(np.mean(pix_std)),
        )
        grid[s] = row
        print(f"s={s}: acc={results[s]['band_in_class_bin_acc']:.3f} "
              f"(+-1 {results[s]['band_within1_acc']:.3f}) "
              f"band_std={results[s]['mean_band_std']:.3f} "
              f"pix_std={results[s]['mean_pixel_std']:.3f}", flush=True)

    fig, axes = plt.subplots(len(SCALES), 10, figsize=(15, 1.6 * len(SCALES)))
    for r, s in enumerate(SCALES):
        for c in range(10):
            axes[r, c].imshow(np.clip(grid[s][c], 0, 1))
            axes[r, c].axis("off")
        axes[r, 0].set_ylabel(f"s={s:g}", fontsize=9)
    fig.suptitle("classifier-free guidance sweep (rows = scale, cols = class)")
    media = run_dir / "media"
    media.mkdir(exist_ok=True)
    path = media / "cfg_sweep_grid.png"
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    print(f"wrote {path}")

    out = dict(
        scales={str(k): v for k, v in results.items()},
        n_per_class=n_per_class,
        note=(
            "unet_small +scale_shift_norm, synthetic labeled data, "
            "class_dropout_prob=0.1, 150 epochs; metric = dominant "
            "horizontal-frequency band vs the class's bin "
            "(eval_conditional.py)"
        ),
    )
    dest = REPO / "docs" / "results" / "cfg_study.json"
    dest.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
