"""Data layer + config system tests."""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.config import load_config
from probabilisticdeepdiffusionmodels_tpu.data import (
    DataLoader,
    Transform,
    get_dataset,
    unnormalize,
)


def test_synthetic_dataset_and_loader():
    ds = get_dataset("synthetic", resolution=16, n=64)
    assert ds.images.shape == (64, 16, 16, 3) and ds.images.dtype == np.uint8
    loader = DataLoader(
        ds, batch_size=16, train=True,
        transformation_kwargs=dict(normalize="oneone", flip=True),
    )
    assert len(loader) == 4
    batches = list(loader)
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (16, 16, 16, 3) and x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0  # oneone -> [-1, 1]


def test_num_samples_per_epoch():
    """Fixed-size with-replacement epochs (reference data.py:60-66)."""
    ds = get_dataset("synthetic", resolution=8, n=10)
    loader = DataLoader(
        ds, batch_size=5, train=True, num_samples_per_epoch=20,
    )
    assert len(loader) == 4
    assert sum(1 for _ in loader) == 4


def test_normalize_roundtrip():
    """unnormalize inverts Normalize (reference data.py:108-128)."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    tf = Transform(train=False, normalize="oneone")
    x = tf(raw, rng)
    back = unnormalize(x, normalize="oneone", clip=True)
    np.testing.assert_allclose(back, raw.astype(np.float32) / 255.0, atol=1e-6)


def test_transform_crop_and_flip_shapes():
    rng = np.random.default_rng(0)
    raw = np.zeros((4, 28, 28, 1), np.uint8)
    tf = Transform(train=True, crop=True, crop_size=28, crop_padding=4,
                   flip=True, normalize="mnist")
    out = tf(raw, rng)
    assert out.shape == (4, 28, 28, 1)
    # mnist normalization maps 0 -> -1
    np.testing.assert_allclose(out.min(), -1.0)


def test_transform_bad_normalize():
    with pytest.raises(ValueError):
        Transform(normalize="bogus")(np.zeros((1, 4, 4, 1), np.uint8),
                                     np.random.default_rng(0))


def test_config_composition_and_overrides():
    cfg = load_config("default", [
        "model=unet_small", "data=cifar10", "engine.mode=cosine",
        "trainer.max_epochs=3", "engine.ema=0.999", "run_name=x",
    ])
    assert cfg["model"]["model_channels"] == 32
    assert cfg["data"]["name"] == "CIFAR10"
    assert cfg["engine"]["mode"] == "cosine"
    assert cfg["trainer"]["max_epochs"] == 3
    assert cfg["engine"]["ema"] == 0.999
    assert cfg["run_name"] == "x"
    assert cfg["_choices"]["model"] == "unet_small"


def test_config_null_and_defaults():
    cfg = load_config("default", ["cont_run=null"])
    assert cfg["cont_run"] is None
    # group defaults from default.yaml:13-18 equivalents
    assert cfg["model"]["name"] == "unet"
    assert cfg["data"]["name"] == "MNIST"
    assert cfg["scheduler"]["scheduler_name"] is None


def test_all_reference_config_groups_exist():
    """Every group file from the reference config tree has an equivalent."""
    from probabilisticdeepdiffusionmodels_tpu.config import CONFIG_DIR

    expected = {
        "model": ["unet", "unet_celeba", "unet_celebahq", "unet_grey",
                  "unet_small", "unet_small_grey", "dense"],
        "data": ["mnist", "cifar10", "celeba", "celebahq"],
        "engine": ["mnist", "cifar10", "celeba", "celebahq"],
        "scheduler": ["none", "cosine_annealing"],
        "visualization": ["more", "less"],
    }
    for group, names in expected.items():
        for n in names:
            assert (CONFIG_DIR / group / f"{n}.yaml").exists(), f"{group}/{n}"
    for root in ("default", "sample", "eval"):
        assert (CONFIG_DIR / f"{root}.yaml").exists()


def test_multihost_shards_partition_epoch_exactly():
    """shard_id/num_shards loaders on identically-seeded hosts must (a) draw
    the same global epoch order and (b) take pairwise-disjoint slices whose
    union is the whole epoch — the DCN-side contract of the SPMD input
    pipeline (SURVEY.md §5.8; VERDICT r1 next #9)."""
    import numpy as np

    from probabilisticdeepdiffusionmodels_tpu.data.datasets import (
        ArrayDataset,
        DataLoader,
    )

    n = 64
    images = np.zeros((n, 8, 8, 1), np.uint8)
    labels = np.arange(n, dtype=np.int32)  # unique ids to track identity
    ds = ArrayDataset(images, labels)

    num_shards = 4
    shard_ids = []
    for shard in range(num_shards):
        loader = DataLoader(
            ds, batch_size=4, train=True, seed=5,
            shard_id=shard, num_shards=num_shards, drop_last=False,
        )
        got = np.concatenate([y for _, y in loader])
        assert len(got) == n // num_shards  # exact equal split
        shard_ids.append(got)

    all_ids = np.concatenate(shard_ids)
    assert len(all_ids) == n
    assert set(all_ids.tolist()) == set(range(n))  # disjoint + exhaustive

    # identically-seeded re-run of one shard draws the same slice
    again = np.concatenate([
        y for _, y in DataLoader(
            ds, batch_size=4, train=True, seed=5,
            shard_id=2, num_shards=num_shards, drop_last=False,
        )
    ])
    np.testing.assert_array_equal(again, shard_ids[2])


def _write_idx(path, arr):
    """Minimal IDX ubyte writer (the MNIST wire format: >I magic with the
    rank in the low byte, >I dims, raw uint8 payload)."""
    import struct

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x0800 | arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def test_mnist_idx_loader_roundtrip(tmp_path):
    """load_mnist reads synthesized IDX ubyte files (plain and .gz) through
    the same path real MNIST downloads take (reference: torchvision MNIST via
    data.py:46-55; here data/datasets.py:64-87)."""
    import gzip

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(12, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(12,), dtype=np.uint8)
    timgs = rng.integers(0, 256, size=(5, 28, 28), dtype=np.uint8)
    tlabels = rng.integers(0, 10, size=(5,), dtype=np.uint8)

    root = tmp_path / "MNIST" / "raw"
    root.mkdir(parents=True)
    _write_idx(root / "train-images-idx3-ubyte", imgs)
    _write_idx(root / "train-labels-idx1-ubyte", labels)
    # test split stored gzipped to cover the .gz branch
    for name, arr in (("t10k-images-idx3-ubyte", timgs),
                      ("t10k-labels-idx1-ubyte", tlabels)):
        plain = root / name
        _write_idx(plain, arr)
        with open(plain, "rb") as f, gzip.open(f"{plain}.gz", "wb") as g:
            g.write(f.read())
        plain.unlink()

    train = get_dataset("mnist", train=True, root=tmp_path)
    test = get_dataset("mnist", train=False, root=tmp_path)
    assert train.images.shape == (12, 28, 28, 1)
    np.testing.assert_array_equal(train.images[..., 0], imgs)
    np.testing.assert_array_equal(train.labels, labels.astype(np.int32))
    assert test.images.shape == (5, 28, 28, 1)
    np.testing.assert_array_equal(test.images[..., 0], timgs)

    # and it drives the full loader/transform path
    loader = DataLoader(
        train, batch_size=4, train=True,
        transformation_kwargs=dict(normalize="mnist"),
    )
    x, y = next(iter(loader))
    assert x.shape == (4, 28, 28, 1) and x.dtype == np.float32


def test_superres_loader_yields_low_res_pairs():
    """data.superres_factor=f makes the loader yield (high, low) with low =
    factor-f area downsample of the transformed image — the SuperResModel
    training pipeline (reference src/modules/unet.py:530-550 consumes
    low_res; its loader half doesn't exist in the reference)."""
    from probabilisticdeepdiffusionmodels_tpu.data.datasets import (
        DataLoader,
        make_synthetic,
    )

    ds = make_synthetic(resolution=16, channels=3, n=32)
    loader = DataLoader(
        ds, batch_size=8, train=False, superres_factor=2,
        transformation_kwargs={"normalize": "oneone"}, seed=0,
    )
    x, low = next(iter(loader))
    assert x.shape == (8, 16, 16, 3) and low.shape == (8, 8, 8, 3)
    expect = x.reshape(8, 8, 2, 8, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(low, expect, rtol=1e-6)


def test_synthetic_labels_are_informative():
    """Synthetic labels encode the channel-0 horizontal frequency band, so
    class-conditional training is learnable (VERDICT r2 next #4): the
    dominant FFT frequency of channel 0 must increase with the label."""
    from probabilisticdeepdiffusionmodels_tpu.data.datasets import make_synthetic

    ds = make_synthetic(resolution=32, channels=1, n=512)
    labels = np.asarray(ds.labels)
    assert len(np.unique(labels)) >= 8  # classes populated
    imgs = ds.images[..., 0].astype(np.float32) / 255.0
    # dominant nonzero horizontal frequency per image (mean over rows)
    spec = np.abs(np.fft.rfft(imgs - imgs.mean(axis=(1, 2), keepdims=True),
                              axis=2)).mean(axis=1)
    dom = spec[:, 1:].argmax(axis=1) + 1
    lo = dom[labels <= 2].mean()
    hi = dom[labels >= 7].mean()
    assert hi > lo + 0.5, (lo, hi)


def test_get_dataset_rejects_unknown_kwargs():
    """A top-level data key no dataset consumes must fail loudly at load
    time — a silently dropped `data.normalize=...` used to resurface as an
    opaque channel-broadcast error inside the transform."""
    with pytest.raises(TypeError, match="transformation_kwargs"):
        get_dataset("synthetic", resolution=8, n=8, normalize="mnist")
    with pytest.raises(TypeError, match="unsupported kwargs"):
        get_dataset("synthetic", resolution=8, n=8, bogus_key=1)
