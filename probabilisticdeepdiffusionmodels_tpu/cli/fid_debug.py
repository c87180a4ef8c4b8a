"""FID floor check: train-vs-val FID of the real dataset.

Reference surface: scripts/fid_debug.py:31-74 — validates the FID pipeline
itself by scoring the two real splits against each other (the achievable
lower bound).

    python -m probabilisticdeepdiffusionmodels_tpu.cli.fid_debug data=cifar10
"""

from __future__ import annotations

import sys

from ..config import load_config
from ..evals.fid import compute_fid_for_loaders
from .train import build_loaders

__all__ = ["main"]


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("default", argv)
    train_loader, val_loader = build_loaders(cfg)
    normalize = (cfg["data"].get("transformation_kwargs") or {}).get("normalize")
    fid = compute_fid_for_loaders(train_loader, val_loader, normalize=normalize)
    print(f"FID floor (train vs val): {fid}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
