"""Kernel Inception Distance (evals/kid.py, arXiv:1801.01401)."""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.evals import (
    kernel_inception_distance,
    polynomial_mmd2,
)


def _naive_mmd2(x, y):
    """O(n^2) loop restatement of the unbiased estimator."""
    d = x.shape[1]
    k = lambda a, b: (float(a @ b) / d + 1.0) ** 3
    n, m = len(x), len(y)
    s_xx = sum(k(x[i], x[j]) for i in range(n) for j in range(n) if i != j)
    s_yy = sum(k(y[i], y[j]) for i in range(m) for j in range(m) if i != j)
    s_xy = sum(k(x[i], y[j]) for i in range(n) for j in range(m))
    return s_xx / (n * (n - 1)) + s_yy / (m * (m - 1)) - 2 * s_xy / (n * m)


def test_mmd2_matches_naive_loop():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5))
    y = rng.normal(size=(6, 5)) + 0.3
    assert polynomial_mmd2(x, y) == pytest.approx(_naive_mmd2(x, y), rel=1e-9)


def test_kid_near_zero_for_same_distribution():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(600, 16))
    r = kernel_inception_distance(
        feats[:300], feats[300:], subset_size=150, n_subsets=30, seed=0
    )
    # unbiased estimator: mean ~ 0 within its own spread
    assert abs(r["kid_mean"]) < max(4 * r["kid_std"], 1e-3)
    assert r["kid_subset_size"] == 150


def test_kid_separates_shifted_distribution():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(300, 16))
    fake = rng.normal(size=(300, 16)) + 1.0
    same = kernel_inception_distance(real[:150], real[150:],
                                     subset_size=100, n_subsets=20)
    diff = kernel_inception_distance(real, fake,
                                     subset_size=100, n_subsets=20)
    assert diff["kid_mean"] > 10 * abs(same["kid_mean"])
    assert diff["kid_mean"] > 0


def test_kid_degenerate_subsets_compute_once():
    """Both pools <= subset_size: every draw would be a permutation of the
    same full sets, so KID computes the (permutation-invariant) MMD^2 once
    and reports n_subsets=1 / std=0 instead of 100 identical passes."""
    rng = np.random.default_rng(5)
    real = rng.normal(size=(50, 8))
    fake = rng.normal(size=(50, 8)) + 0.5
    r = kernel_inception_distance(real, fake, subset_size=100, n_subsets=100)
    assert r["kid_n_subsets"] == 1 and r["kid_std"] == 0.0
    assert r["kid_subset_size"] == 50
    assert r["kid_mean"] == pytest.approx(polynomial_mmd2(real, fake))
    # one side still larger than the subset: the spread is real, keep it
    fake2 = rng.normal(size=(80, 8)) + 0.5
    r2 = kernel_inception_distance(real, fake2, subset_size=100, n_subsets=10)
    assert r2["kid_n_subsets"] == 10


def test_kid_subset_clamp_and_validation():
    rng = np.random.default_rng(3)
    r = kernel_inception_distance(
        rng.normal(size=(40, 8)), rng.normal(size=(25, 8)),
        subset_size=1000, n_subsets=5,
    )
    assert r["kid_subset_size"] == 25  # clamped to the smaller side
    with pytest.raises(ValueError, match="feature matrices"):
        kernel_inception_distance(
            rng.normal(size=(10, 8)), rng.normal(size=(10, 9))
        )
    with pytest.raises(ValueError, match=">=2 rows"):
        polynomial_mmd2(rng.normal(size=(1, 8)), rng.normal(size=(10, 8)))


def test_fid_from_engine_kid_wiring():
    """with_kid=True on the engine FID path returns the kid fields from the
    same teed feature rows as P&R (synthetic-weights Inception; tiny n)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from probabilisticdeepdiffusionmodels_tpu.evals.fid import (
        compute_fid_from_engine,
    )

    class FakeEngine:
        mesh = None

        def generate_images(self, n, minibatch, mean_only=False, seed=0,
                            num_sample_steps=None, ddim=False):
            rng = np.random.default_rng(seed)
            return jnp.asarray(
                rng.uniform(-1, 1, size=(n, 8, 8, 3)).astype(np.float32)
            )

    rng = np.random.default_rng(0)
    real = [
        (rng.uniform(-1, 1, size=(8, 8, 8, 3)).astype(np.float32), None)
        for _ in range(2)
    ]
    feat_dim = 12

    def fake_feature_fn(x01):
        # deterministic projection standing in for Inception
        flat = x01.reshape((x01.shape[0], -1))
        w = jnp.asarray(
            np.random.default_rng(7).normal(size=(flat.shape[1], feat_dim))
        ).astype(jnp.float32)
        return flat @ w

    import probabilisticdeepdiffusionmodels_tpu.evals.fid as fid_mod

    orig = fid_mod._make_feature_fn
    fid_mod._make_feature_fn = lambda p: fake_feature_fn
    try:
        m = compute_fid_from_engine(
            FakeEngine(), real, n_samples=16, minibatch=8,
            inception_params={}, with_precision_recall=False, with_kid=True,
        )
    finally:
        fid_mod._make_feature_fn = orig
    assert set(m) >= {"fid", "kid_mean", "kid_std"}
    assert np.isfinite(m["fid"]) and np.isfinite(m["kid_mean"])
