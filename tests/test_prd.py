"""Improved precision & recall (arXiv:1904.06991) — fidelity/coverage
metrics complementing FID (the reference's only distributional metric)."""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.evals import knn_precision_recall


def test_identical_distributions_score_high():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(256, 8))
    gen = rng.normal(size=(256, 8))
    m = knn_precision_recall(real, gen, k=3)
    # finite-sample k-NN manifolds undercover slightly (paper fig. 2):
    # ~0.88 at N=256, k=3 for matched 8-D gaussians
    assert m["precision"] > 0.8 and m["recall"] > 0.8


def test_disjoint_distributions_score_zero():
    rng = np.random.default_rng(1)
    real = rng.normal(size=(128, 8))
    gen = rng.normal(size=(128, 8)) + 100.0
    m = knn_precision_recall(real, gen, k=3)
    assert m["precision"] == 0.0 and m["recall"] == 0.0


def test_mode_collapse_separates_precision_from_recall():
    """A generator emitting one tight real-looking cluster has high
    precision (samples are on the data manifold) and low recall (most of
    the data manifold is uncovered) — the separation FID cannot express."""
    rng = np.random.default_rng(2)
    real = rng.normal(size=(512, 4))
    gen = real[7] + 0.01 * rng.normal(size=(256, 4))
    m = knn_precision_recall(real, gen, k=3)
    assert m["precision"] > 0.9
    assert m["recall"] < 0.2
    # and the mirrored case: gen covering real but also far-off junk has
    # high recall, low precision
    junk = np.concatenate([real + 0.01 * rng.normal(size=real.shape),
                           rng.normal(size=(512, 4)) + 50.0])
    m2 = knn_precision_recall(real, junk, k=3)
    assert m2["recall"] > 0.9
    assert m2["precision"] < 0.6


def test_input_validation():
    with pytest.raises(AssertionError):
        knn_precision_recall(np.zeros((2, 3)), np.zeros((10, 3)), k=3)
