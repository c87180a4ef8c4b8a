"""CelebA-HQ prep tools on a tiny synthetic dataset tree
(reference scripts/prepare_celeba_hq.py / resize_images.py / copy_splits.py)."""

import csv
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from probabilisticdeepdiffusionmodels_tpu.data.prep_celebahq import (
    build_metadata,
    copy_splits,
    resize_images,
)


@pytest.fixture()
def fake_celebahq(tmp_path):
    root = tmp_path / "CelebAMask-HQ"
    (root / "CelebA-HQ-img").mkdir(parents=True)
    anno = tmp_path / "anno"
    anno.mkdir()

    rng = np.random.default_rng(0)
    n = 20
    with open(root / "CelebA-HQ-to-CelebA-mapping.txt", "w") as f:
        f.write("idx orig_idx orig_file\n")
        for i in range(n):
            f.write(f"{i} {i} {i:06d}.jpg\n")
    with open(anno / "list_eval_partition.txt", "w") as f:
        for i in range(n):
            split = 0 if i < 14 else (1 if i < 17 else 2)
            f.write(f"{i:06d}.jpg {split}\n")
    for i in range(n):
        img = Image.fromarray(
            rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        )
        img.save(root / "CelebA-HQ-img" / f"{i}.jpg")
    return root, anno


def test_build_metadata_and_splits(fake_celebahq, tmp_path, monkeypatch):
    root, anno = fake_celebahq
    import probabilisticdeepdiffusionmodels_tpu.data.prep_celebahq as prep

    monkeypatch.setattr(prep, "N_EXTRA_VAL", 3)
    out = build_metadata(str(root), str(anno))
    assert out.exists()
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 20
    splits = [int(r["split"]) for r in rows]
    # 3 of the original train rows were carved into split id 3
    assert splits.count(3) == 3
    assert splits.count(0) == 14 - 3

    # resize 64 -> 32
    dst = resize_images(str(root), size=32)
    assert len(list(dst.glob("*.jpg"))) == 20
    assert Image.open(next(dst.glob("*.jpg"))).size == (32, 32)

    # materialize split dirs from the resized set
    outdir = tmp_path / "splits"
    copy_splits(str(root), str(outdir), resolution=32)
    n_train = len(list((outdir / "train").iterdir()))
    n_val = len(list((outdir / "val").iterdir()))
    assert n_train == 14  # split 0 + carved 3s
    assert n_val == 6     # 1s and 2s


def test_loader_reads_prepped_tree(fake_celebahq, monkeypatch):
    """The CelebAHQ dataset reader consumes the prep output directly
    (reference celebahq.py:25-36 layout)."""
    root, anno = fake_celebahq
    import probabilisticdeepdiffusionmodels_tpu.data.prep_celebahq as prep

    monkeypatch.setattr(prep, "N_EXTRA_VAL", 3)
    build_metadata(str(root), str(anno))
    resize_images(str(root), size=256)

    from probabilisticdeepdiffusionmodels_tpu.data.datasets import load_celebahq

    train = load_celebahq(root, train=True, resolution=256)
    val = load_celebahq(root, train=False, resolution=256)
    assert len(train) == 14 and len(val) == 6
    batch = train.load([0, 1])
    assert batch.shape == (2, 256, 256, 3) and batch.dtype == np.uint8
