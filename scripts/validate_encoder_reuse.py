"""Quality validation for encoder-reuse sampling on a TRAINED model.

Samples the same noise through the exact sampler (encoder_reuse=1) and the
accelerated ones (k in {2,3,5}), reports RMSE/PSNR between the exact and
accelerated outputs in [-1,1] data space, and writes a side-by-side grid.
This is the evidence backing bench.py's encoder_reuse default: the Faster
Diffusion approximation (arXiv:2312.09608) must stay visually and
numerically close to the exact 250-step chain on a converged model, not
just on random weights.

Usage: python scripts/validate_encoder_reuse.py <run_dir> [n_images]
"""

import json
import sys
from pathlib import Path

import numpy as np


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/synstudy_cosine_T1000"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )

    engine, cfg = load_engine_from_run(run_dir)
    out = {}
    samples = {}
    for k in (1, 2, 3, 5):
        # identical seed => identical x_T draw and z stream across k
        samples[k] = engine.generate_images(
            n=n, minibatch=n, seed=123, encoder_reuse=k
        )
        assert np.isfinite(samples[k]).all(), f"non-finite samples at k={k}"
    ref = samples[1]
    dyn = ref.max() - ref.min()
    for k in (2, 3, 5):
        err = samples[k] - ref
        rmse = float(np.sqrt(np.mean(err**2)))
        psnr = float(20 * np.log10(dyn / max(rmse, 1e-12)))
        out[f"k{k}"] = {
            "rmse_vs_exact": round(rmse, 5),
            "psnr_db": round(psnr, 2),
            "max_abs": round(float(np.abs(err).max()), 5),
        }
        print(f"k={k}: rmse={rmse:.5f} psnr={psnr:.2f}dB", flush=True)

    # side-by-side grid: rows = k in {1,2,3,5}, cols = first 8 images
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncol = min(8, n)
    fig, axes = plt.subplots(4, ncol, figsize=(1.3 * ncol, 5.4))
    for r, k in enumerate((1, 2, 3, 5)):
        for c in range(ncol):
            img = (samples[k][c] - samples[k][c].min()) / max(
                samples[k][c].ptp(), 1e-9
            )
            axes[r, c].imshow(img.squeeze(), cmap=None)
            axes[r, c].set_xticks([]), axes[r, c].set_yticks([])
        axes[r, 0].set_ylabel(f"k={k}", fontsize=9)
    dest = Path("docs/results")
    dest.mkdir(parents=True, exist_ok=True)
    fig.suptitle("encoder_reuse: exact (k=1) vs accelerated, same noise")
    fig.savefig(dest / "encoder_reuse_quality.png", dpi=110,
                bbox_inches="tight")
    (dest / "encoder_reuse_quality.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
