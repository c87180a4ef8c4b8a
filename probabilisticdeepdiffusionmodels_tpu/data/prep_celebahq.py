"""CelebA-HQ offline preparation tools.

Ports of the reference's prep scripts (all paths passed explicitly instead
of hard-coded — reference hard-codes /scratch paths at
scripts/prepare_celeba_hq.py:8-9 and resize_images.py:5-7):
  * build_metadata: join the CelebAMask-HQ -> CelebA mapping with the
    original eval partition, carve an extra 3k validation split out of train
    (seed 0, split id 3), join the 40 attributes, write metadata.csv
    (reference scripts/prepare_celeba_hq.py:11-36)
  * resize_images: 1024 -> 256 bilinear into img256/
    (reference scripts/resize_images.py:5-16)
  * copy_splits: materialize train/val directories
    (reference scripts/copy_splits.py:11-27)

Run as:
    python -m probabilisticdeepdiffusionmodels_tpu.data.prep_celebahq \
        build-metadata <celebahq_root> <celeba_anno_dir>
    python -m probabilisticdeepdiffusionmodels_tpu.data.prep_celebahq \
        resize <celebahq_root> [--size 256]
    python -m probabilisticdeepdiffusionmodels_tpu.data.prep_celebahq \
        copy-splits <celebahq_root> <out_dir>
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np

__all__ = ["build_metadata", "resize_images", "copy_splits"]

N_EXTRA_VAL = 3000
EXTRA_VAL_SPLIT_ID = 3
EXTRA_VAL_SEED = 0


def build_metadata(celebahq_root: str, celeba_anno_dir: str) -> Path:
    """Write metadata.csv with columns file_name, orig_file, split, + attrs.

    split: 0=train, 1=val, 2=test (from the original CelebA partition),
    3=extra 3k validation carved from train with seed 0 (reference
    prepare_celeba_hq.py:20-27).
    """
    import pandas as pd

    root = Path(celebahq_root)
    anno = Path(celeba_anno_dir)

    mapping = pd.read_csv(
        root / "CelebA-HQ-to-CelebA-mapping.txt", sep=r"\s+"
    )
    mapping = mapping.rename(columns={"orig_file": "orig_file", "idx": "idx"})
    mapping["file_name"] = mapping["idx"].astype(int).astype(str) + ".jpg"

    part = pd.read_csv(
        anno / "list_eval_partition.txt", sep=r"\s+", header=None,
        names=["orig_file", "split"],
    )
    df = mapping.merge(part, on="orig_file", how="left")

    # carve extra validation out of train (seed 0, split id 3)
    rng = np.random.RandomState(EXTRA_VAL_SEED)
    train_idx = df.index[df["split"] == 0].to_numpy()
    extra = rng.choice(train_idx, size=min(N_EXTRA_VAL, len(train_idx)),
                       replace=False)
    df.loc[extra, "split"] = EXTRA_VAL_SPLIT_ID

    attr_path = anno / "list_attr_celeba.txt"
    if attr_path.exists():
        attrs = pd.read_csv(attr_path, sep=r"\s+", header=1)
        attrs = attrs.reset_index().rename(columns={"index": "orig_file"})
        df = df.merge(attrs, on="orig_file", how="left")

    out = root / "metadata.csv"
    df.to_csv(out, index=False)
    print(f"[prep] wrote {out} ({len(df)} rows)")
    return out


def resize_images(celebahq_root: str, size: int = 256) -> Path:
    """1024 -> size bilinear resize into img{size}/ (reference
    resize_images.py:5-16)."""
    from PIL import Image

    root = Path(celebahq_root)
    src = root / "CelebA-HQ-img"
    dst = root / f"img{size}"
    dst.mkdir(exist_ok=True)
    files = sorted(src.glob("*.jpg")) + sorted(src.glob("*.png"))
    for i, f in enumerate(files):
        out = dst / f.name
        if out.exists():
            continue
        Image.open(f).convert("RGB").resize((size, size), Image.BILINEAR).save(out)
        if i % 1000 == 0:
            print(f"[prep] resized {i}/{len(files)}")
    print(f"[prep] wrote {dst}")
    return dst


def copy_splits(celebahq_root: str, out_dir: str, resolution: int = 256) -> None:
    """Materialize train/ and val/ dirs from metadata.csv (reference
    copy_splits.py:11-27; train={0,3}, val={1,2} matching celebahq.py:33)."""
    import csv

    root = Path(celebahq_root)
    img_dir = root / (f"img{resolution}" if resolution != 1024 else "CelebA-HQ-img")
    out = Path(out_dir)
    (out / "train").mkdir(parents=True, exist_ok=True)
    (out / "val").mkdir(parents=True, exist_ok=True)
    with open(root / "metadata.csv") as f:
        for row in csv.DictReader(f):
            split = "train" if int(row["split"]) in (0, 3) else "val"
            src = img_dir / row["file_name"]
            if src.exists():
                shutil.copy(src, out / split / row["file_name"])
    print(f"[prep] split dirs in {out}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd = argv[0]
    if cmd == "build-metadata":
        build_metadata(argv[1], argv[2])
    elif cmd == "resize":
        size = int(argv[argv.index("--size") + 1]) if "--size" in argv else 256
        resize_images(argv[1], size)
    elif cmd == "copy-splits":
        copy_splits(argv[1], argv[2])
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
