"""Evaluate the TRAINED conditioning paths (VERDICT r2 next #4).

Class-conditional run (runs/cond_class): generate n samples per class and
measure conditioning fidelity — the synthetic labels encode the channel-0
horizontal-frequency band (data/datasets.py:make_synthetic), so the
dominant rFFT band of each generated image, compared to the band its
requested class implies, is a direct measure of whether the label embedding
learned anything.  Reported: per-class mean dominant band, the
band-vs-class Spearman-style rank correlation, and top-1/±1 accuracy
against the class's frequency bin.  Also writes a rows=classes sample grid.

SuperRes run (runs/cond_superres): take held-out val images, downsample by
the trained factor, sample reconstructions conditioned on the low-res
input, and measure PSNR / per-image correlation of the reconstruction to
the ground-truth high-res (plus the bilinear-upsample baseline the
reference's conditioning input itself provides, src/modules/unet.py:544).
Writes a [ground truth | low-res | bilinear | 2 samples] grid.

Writes docs/results/conditional_study.json + PNG grids into each run's
media dir.  Usage: python scripts/eval_conditional.py [runs_root]
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


def dominant_band(imgs01, pad=8):
    """Dominant horizontal frequency (cycles/image, sub-bin resolution via
    ``pad``x zero-padded rFFT) of channel 0.  The synthetic classes are 0.3-
    cycle-wide bins over f in [1, 4), so integer FFT bins (resolution 1
    cycle) cannot separate them; at pad=8 the resolution is 1/8 cycle."""
    x = imgs01[..., 0] - imgs01[..., 0].mean(axis=(1, 2), keepdims=True)
    w = x.shape[2]
    spec = np.abs(np.fft.rfft(x, n=pad * w, axis=2)).mean(axis=1)
    lo_bin = pad // 2  # ignore DC leakage below 0.5 cycles
    return (spec[:, lo_bin:].argmax(axis=1) + lo_bin) / pad


def class_band_range(label, resolution=32):
    """The frequency bin a class implies: f in [1 + 0.3 l, 1 + 0.3 (l+1))."""
    lo = 1.0 + 0.3 * label
    return lo, lo + 0.3


def eval_class_conditional(run_dir: Path, n_per_class=64, minibatch=64):
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.data.transforms import unnormalize

    engine, cfg = load_engine_from_run(run_dir)
    normalize = (cfg["data"].get("transformation_kwargs") or {}).get("normalize")
    per_class = {}
    grid_rows = []
    correct, near, total = 0, 0, 0
    for cls in range(10):
        y = np.full((n_per_class,), cls, np.int32)
        imgs = engine.generate_images(
            n=n_per_class, minibatch=minibatch, seed=100 + cls, y=y
        )
        imgs01 = unnormalize(imgs, normalize=normalize, clip=True)
        dom = dominant_band(imgs01)
        lo, hi = class_band_range(cls)
        # dominant frequency in cycles/image ~ f directly (unit square)
        correct += int(np.sum((dom >= lo) & (dom < hi)))
        near += int(np.sum((dom >= lo - 0.3) & (dom < hi + 0.3)))
        total += len(dom)
        per_class[cls] = dict(
            mean_dominant_band=float(dom.mean()),
            std_dominant_band=float(dom.std()),
            implied_f=[lo, hi],
        )
        grid_rows.append(imgs01[:8])

    classes = np.arange(10)
    means = np.array([per_class[c]["mean_dominant_band"] for c in classes])
    corr = float(np.corrcoef(classes, means)[0, 1])

    fig, axes = plt.subplots(10, 8, figsize=(12, 15))
    for r in range(10):
        for c in range(8):
            axes[r, c].imshow(np.clip(grid_rows[r][c], 0, 1))
            axes[r, c].axis("off")
        axes[r, 0].set_ylabel(f"y={r}")
    path = run_dir / "media" / "class_conditional_grid.png"
    fig.suptitle("class-conditional samples (rows = requested class)")
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    print(f"wrote {path}")

    return dict(
        per_class=per_class,
        band_vs_class_corr=corr,
        band_in_class_bin_acc=correct / total,
        band_within1_acc=near / total,
        n_per_class=n_per_class,
    )


def eval_superres(run_dir: Path, n=64, minibatch=64):
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.cli.train import build_loaders
    from probabilisticdeepdiffusionmodels_tpu.data.transforms import unnormalize

    engine, cfg = load_engine_from_run(run_dir)
    normalize = (cfg["data"].get("transformation_kwargs") or {}).get("normalize")
    _, val_loader = build_loaders(cfg)
    x, low = next(iter(val_loader))
    x, low = x[:n], low[:n]

    recon = engine.generate_images(n=len(x), minibatch=minibatch, seed=7, y=low)
    x01 = unnormalize(np.asarray(x), normalize=normalize, clip=True)
    r01 = unnormalize(np.asarray(recon), normalize=normalize, clip=True)

    f = int(x.shape[1] // low.shape[1])
    bil = np.asarray(low).repeat(f, axis=1).repeat(f, axis=2)
    bil01 = unnormalize(bil, normalize=normalize, clip=True)

    def psnr(a, b):
        mse = np.mean((a - b) ** 2, axis=(1, 2, 3))
        return float(np.mean(10 * np.log10(1.0 / np.maximum(mse, 1e-12))))

    def mean_corr(a, b):
        va = a.reshape(len(a), -1) - a.reshape(len(a), -1).mean(1, keepdims=True)
        vb = b.reshape(len(b), -1) - b.reshape(len(b), -1).mean(1, keepdims=True)
        num = (va * vb).sum(1)
        den = np.sqrt((va**2).sum(1) * (vb**2).sum(1)) + 1e-12
        return float(np.mean(num / den))

    metrics = dict(
        psnr_recon=psnr(r01, x01),
        psnr_nearest_baseline=psnr(bil01, x01),
        corr_recon=mean_corr(r01, x01),
        corr_nearest_baseline=mean_corr(bil01, x01),
        n=int(len(x)),
        factor=f,
    )

    fig, axes = plt.subplots(6, 5, figsize=(9, 11))
    titles = ["ground truth", "low-res", "nearest-up", "sample A", "sample B"]
    recon2 = engine.generate_images(n=6, minibatch=6, seed=8, y=low[:6])
    r201 = unnormalize(np.asarray(recon2), normalize=normalize, clip=True)
    low01 = unnormalize(np.asarray(low), normalize=normalize, clip=True)
    for i in range(6):
        panels = [x01[i], low01[i], bil01[i], r01[i], r201[i]]
        for j, img in enumerate(panels):
            axes[i, j].imshow(np.clip(img, 0, 1))
            axes[i, j].axis("off")
            if i == 0:
                axes[i, j].set_title(titles[j], fontsize=9)
    path = run_dir / "media" / "superres_grid.png"
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    print(f"wrote {path}")
    return metrics


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "runs")
    out = {}
    cls_dir = root / "cond_class"
    sr_dir = root / "cond_superres"
    if cls_dir.exists():
        out["class_conditional"] = eval_class_conditional(cls_dir)
        print(json.dumps(out["class_conditional"], indent=2, default=float)[:2000])
    if sr_dir.exists():
        out["superres"] = eval_superres(sr_dir)
        print(json.dumps(out["superres"], indent=2, default=float))
    for name in ("cond_class", "cond_superres"):
        f = root / name / "final_test.json"
        if f.exists():
            out.setdefault("final_test", {})[name] = json.loads(f.read_text())
    dest = REPO / "docs" / "results" / "conditional_study.json"
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
