"""Inception Score (evals/is_score.py, arXiv:1606.03498)."""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.evals import (
    inception_score_from_features,
    inception_score_from_logits,
)


def test_is_uniform_predictions_score_one():
    # identical (hence uniform-marginal-equal) predictions: KL = 0, IS = 1
    logits = np.zeros((64, 10))
    r = inception_score_from_logits(logits, splits=4)
    assert r["is_mean"] == pytest.approx(1.0, abs=1e-12)
    assert r["is_std"] == pytest.approx(0.0, abs=1e-12)
    assert r["is_splits"] == 4


def test_is_confident_diverse_predictions_score_num_classes():
    # perfectly confident and perfectly diverse: IS -> n_classes
    n_classes = 8
    logits = np.eye(n_classes)[np.tile(np.arange(n_classes), 16)] * 50.0
    r = inception_score_from_logits(logits, splits=2)
    assert r["is_mean"] == pytest.approx(n_classes, rel=1e-3)


def test_is_confident_but_collapsed_scores_one():
    # mode collapse: every sample predicted as class 3 -> marginal == each
    # conditional -> IS = 1 despite full confidence
    logits = np.zeros((40, 10))
    logits[:, 3] = 50.0
    r = inception_score_from_logits(logits, splits=4)
    assert r["is_mean"] == pytest.approx(1.0, abs=1e-9)


def test_is_survives_saturated_logits():
    """Logit margins past float exp underflow (softmax rows containing
    exact 0.0) must not produce NaN (0*log 0); a collapsed saturated
    predictor still scores exactly 1."""
    logits = np.eye(4)[np.zeros(8, int)] * 800.0
    r = inception_score_from_logits(logits, splits=2)
    assert np.isfinite(r["is_mean"])
    assert r["is_mean"] == pytest.approx(1.0, abs=1e-9)


def test_is_split_clamp_and_validation():
    r = inception_score_from_logits(np.zeros((5, 4)), splits=10)
    assert r["is_splits"] == 2  # clamped to n // 2
    with pytest.raises(ValueError, match="logits"):
        inception_score_from_logits(np.zeros((4,)))
    with pytest.raises(ValueError, match=">=2"):
        inception_score_from_logits(np.zeros((1, 4)))


def test_is_from_features_matches_manual_fc():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(30, 12))
    w = rng.normal(size=(12, 6))
    b = rng.normal(size=(6,))
    params = {"fc": {"w": w, "b": b}}
    r = inception_score_from_features(feats, params, splits=3)
    expect = inception_score_from_logits(feats @ w + b, splits=3)
    assert r == expect
    with pytest.raises(ValueError, match="fc"):
        inception_score_from_features(feats, {})


def test_inception_logits_shape_and_fc_roundtrip():
    """random_params now carries an fc head; inception_logits == fc applied
    to pool features (the identity the host-side IS path relies on)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from probabilisticdeepdiffusionmodels_tpu.evals.inception import (
        NUM_CLASSES,
        inception_logits,
        inception_pool_features,
        random_params,
    )

    params = random_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 299, 299, 3), jnp.float32)
    logits = inception_logits(params, x)
    assert logits.shape == (2, NUM_CLASSES)
    feats = inception_pool_features(params, x)
    manual = feats @ params["fc"]["w"] + params["fc"]["b"]
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(manual), rtol=1e-6, atol=1e-6
    )


def test_fid_from_engine_is_wiring():
    """with_inception_score=True returns is_* fields computed from the teed
    fake features through the provided params' fc head."""
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
        flat = x01.reshape((x01.shape[0], -1))
        w = jnp.asarray(
            np.random.default_rng(7).normal(size=(flat.shape[1], feat_dim))
        ).astype(jnp.float32)
        return flat @ w

    fake_params = {
        "fc": {
            "w": rng.normal(size=(feat_dim, 5)),
            "b": np.zeros((5,)),
        }
    }

    import probabilisticdeepdiffusionmodels_tpu.evals.fid as fid_mod

    orig = fid_mod._make_feature_fn
    fid_mod._make_feature_fn = lambda p: fake_feature_fn
    try:
        m = compute_fid_from_engine(
            FakeEngine(), real, n_samples=16, minibatch=8,
            inception_params=fake_params, with_precision_recall=False,
            with_inception_score=True,
        )
    finally:
        fid_mod._make_feature_fn = orig
    assert set(m) >= {"fid", "is_mean", "is_std", "is_splits"}
    assert np.isfinite(m["is_mean"]) and m["is_mean"] >= 1.0 - 1e-9
    # IS-only: the real side must NOT be teed (no extra Inception pass)
    assert m["extras_n_fake"] == 16 and "extras_n_real" not in m


def test_fid_from_engine_is_requires_fc_before_sampling():
    """A param tree without the fc head fails BEFORE any sampling work."""
    from probabilisticdeepdiffusionmodels_tpu.evals.fid import (
        compute_fid_from_engine,
    )

    class ExplodingEngine:
        mesh = None

        def generate_images(self, *a, **kw):
            raise AssertionError("sampling ran before the fc validation")

    with pytest.raises(ValueError, match="fc"):
        compute_fid_from_engine(
            ExplodingEngine(), [], n_samples=4, minibatch=4,
            inception_params={}, with_inception_score=True,
        )
