"""data/download.py — offline-testable acquisition tooling (VERDICT r3
next #5).  Everything here runs without network: verify-only mode, checksum
logic, extraction, and a mocked fetch."""

import gzip
import hashlib
import tarfile

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.data import download as dl
from probabilisticdeepdiffusionmodels_tpu.data.datasets import load_cifar10


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


def test_verify_checksum_match_and_mismatch(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    assert dl.verify(p, "md5:" + _md5(b"hello"))
    assert dl.verify(p, "sha256:" + hashlib.sha256(b"hello").hexdigest())
    assert not dl.verify(p, "md5:" + _md5(b"other"))
    assert not dl.verify(tmp_path / "absent", "md5:" + _md5(b"hello"))
    assert dl.verify(p, None)  # existence-only


def test_verify_only_reports_missing(tmp_path, capsys):
    ok = dl.download("mnist", root=tmp_path, verify_only=True)
    assert not ok
    out = capsys.readouterr().out
    assert "missing" in out and "train-images-idx3-ubyte.gz" in out


def test_verify_only_passes_on_good_files(tmp_path):
    # build fake MNIST gz files and point the manifest checksums at them
    files = {}
    for rf in dl.MANIFEST["mnist"]:
        dest = tmp_path / rf.relpath
        dest.parent.mkdir(parents=True, exist_ok=True)
        payload = rf.relpath.encode()
        dest.write_bytes(gzip.compress(payload))
        files[rf.relpath] = "md5:" + _md5(dest.read_bytes())
    patched = [rf._replace(checksum=files[rf.relpath])
               for rf in dl.MANIFEST["mnist"]]
    orig = dl.MANIFEST["mnist"]
    dl.MANIFEST["mnist"] = patched
    try:
        assert dl.download("mnist", root=tmp_path, verify_only=True)
    finally:
        dl.MANIFEST["mnist"] = orig


def test_mocked_fetch_checksums_and_extracts_to_loader_layout(
    tmp_path, monkeypatch
):
    """A mocked 'download' of cifar10 lands a tar.gz that extracts into
    the exact cifar-10-batches-py/ layout data/datasets.py reads."""
    import pickle

    rng = np.random.default_rng(0)
    batches = tmp_path / "src" / "cifar-10-batches-py"
    batches.mkdir(parents=True)
    for n in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, (4, 3 * 32 * 32), dtype=np.uint8)
        with open(batches / n, "wb") as f:
            pickle.dump({b"data": data, b"labels": [0, 1, 2, 3]}, f)
    tar = tmp_path / "src" / "cifar-10-python.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        tf.add(batches, arcname="cifar-10-batches-py")
    blob = tar.read_bytes()

    def fake_fetch(urls, dest):
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(blob)

    monkeypatch.setattr(dl, "_fetch", fake_fetch)
    patched = [dl.MANIFEST["cifar10"][0]._replace(
        checksum="md5:" + _md5(blob))]
    monkeypatch.setitem(dl.MANIFEST, "cifar10", patched)

    root = tmp_path / "data"
    assert dl.download("cifar10", root=root)
    ds = load_cifar10(root, train=True)
    assert ds.images.shape == (20, 32, 32, 3)
    # second call: verified in place, no re-fetch
    monkeypatch.setattr(
        dl, "_fetch",
        lambda *a: (_ for _ in ()).throw(AssertionError("re-fetched")),
    )
    assert dl.download("cifar10", root=root)


def test_checksum_mismatch_after_download_raises_and_removes(
    tmp_path, monkeypatch
):
    def fake_fetch(urls, dest):
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(b"corrupt")

    monkeypatch.setattr(dl, "_fetch", fake_fetch)
    patched = [dl.MANIFEST["svhn"][0]._replace(
        checksum="md5:" + _md5(b"expected"))]
    monkeypatch.setitem(dl.MANIFEST, "svhn", patched)
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        dl.download("svhn", root=tmp_path)
    assert not (tmp_path / "train_32x32.mat").exists()


def test_manual_and_unknown_datasets(tmp_path, capsys):
    assert dl.download("celeba", root=tmp_path, verify_only=True) is False
    assert "manual acquisition" in capsys.readouterr().out
    with pytest.raises(KeyError):
        dl.download("imagenet", root=tmp_path)


def test_cli_verify_only(tmp_path):
    rc = dl.main(["--verify-only", f"--root={tmp_path}", "mnist"])
    assert rc == 1  # nothing present yet
