"""Visualization suite tests with a tiny real engine (CPU)."""

from pathlib import Path

import numpy as np
import pytest

import jax

from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.viz.hooks import VisualizationCallback

T = 10


@pytest.fixture(scope="module")
def engine():
    return DiffusionEngine(
        model_config=dict(name="dense", in_channels=1, num_hidden=[32]),
        optimizer_config={"lr": 1e-3},
        diffusion_steps=T,
        resolution=8,
        ema=0.9,
        seed=0,
    )


def make_vis(tmp_path, labels=None, **kw):
    rng = np.random.default_rng(0)
    val_batch = rng.standard_normal((8, 8, 8, 1)).astype(np.float32).clip(-1, 1)
    return VisualizationCallback(
        val_batch=val_batch,
        ts=[2, 5, 8],
        media_dir=tmp_path,
        normalize="mnist",
        n_images=2,
        n_random=2,
        n_interpolation_steps=3,
        n_interpolation_pairs=2,
        labels=labels,
        **kw,
    )


def test_full_suite_writes_all_pngs(tmp_path, engine):
    vis = make_vis(tmp_path)
    vis(engine, epoch=3)
    names = {p.name for p in Path(tmp_path).glob("*.png")}
    assert "random_grid_epoch3.png" in names
    assert any(n.startswith("interpolation_t5") for n in names)
    assert "reconstructions_epoch3.png" in names
    assert "single_recon_std_epoch3.png" in names


def test_final_tag(tmp_path, engine):
    vis = make_vis(tmp_path)
    vis.visualize_random_grid(engine, "final")
    assert (Path(tmp_path) / "random_grid_final.png").exists()


def test_same_class_pairs(tmp_path, engine):
    labels = np.asarray([0, 1, 0, 1, 2, 2, 0, 1])
    vis = make_vis(tmp_path, labels=labels)
    pairs = vis._interpolation_pairs(3)
    for a, b in pairs:
        assert labels[a] == labels[b]
    # unlabeled: consecutive pairing
    vis2 = make_vis(tmp_path)
    assert vis2._interpolation_pairs(2) == [(0, 1), (2, 3)]
