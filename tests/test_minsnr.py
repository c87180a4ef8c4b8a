"""Min-SNR-gamma loss weighting (Hang et al., arXiv:2303.09556) —
beyond-reference objective reweighting: per-sample MSE is scaled by
min(SNR(t), gamma)/SNR(t) (eps target) or min(SNR(t), gamma)/(SNR(t)+1)
(v target), damping the late low-t steps that otherwise dominate the
gradient.  The reference trains with the uniform "simple" weighting only
(src/engine.py:263-277).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core import (
    DiffusionTables,
    NoiseSchedule,
)
from probabilisticdeepdiffusionmodels_tpu.core import diffusion as D
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine

T = 12


@pytest.fixture(scope="module")
def tables():
    return DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )


def test_weight_formula_golden(tables):
    """Weight matches the paper's formulas computed directly in numpy."""
    t = jnp.arange(1, T + 1, dtype=jnp.int32)
    ab = np.asarray(tables.alphas_hat, np.float64)
    snr = ab / (1.0 - ab)
    gamma = 5.0
    w_eps = np.asarray(D.min_snr_weight(tables, t, gamma, "epsilon"))
    w_v = np.asarray(D.min_snr_weight(tables, t, gamma, "v"))
    w_x0 = np.asarray(D.min_snr_weight(tables, t, gamma, "x0"))
    np.testing.assert_allclose(w_eps, np.minimum(snr, gamma) / snr,
                               rtol=1e-5)
    np.testing.assert_allclose(w_v, np.minimum(snr, gamma) / (snr + 1.0),
                               rtol=1e-5)
    np.testing.assert_allclose(w_x0, np.minimum(snr, gamma), rtol=1e-5)
    # clamp only bites where SNR > gamma (early chain / low t)
    assert (w_eps <= 1.0 + 1e-6).all()
    assert w_eps[np.argmax(snr)] < 1.0
    np.testing.assert_allclose(w_eps[snr <= gamma], 1.0, rtol=1e-6)


def test_weight_validates_prediction_type(tables):
    t = jnp.asarray([1], jnp.int32)
    with pytest.raises(ValueError, match="prediction_type"):
        D.min_snr_weight(tables, t, 5.0, "score")


MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
)


def make_engine(**kw):
    cfg = dict(
        model_config=MODEL_CFG,
        optimizer_config={"lr": 1e-3},
        diffusion_steps=T,
        mode="cosine",
        resolution=8,
        seed=0,
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


def test_gamma_above_max_snr_is_identity_for_eps():
    """For eps prediction a gamma >= max(SNR) makes every weight exactly
    1.0, so the weighted loss equals the unweighted loss bitwise."""
    sched = NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    max_snr = float(np.max(sched.alphas_hat / (1.0 - sched.alphas_hat)))
    eng_w = make_engine(loss_weighting="min_snr", snr_gamma=max_snr * 2)
    eng_0 = make_engine()
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    lw = float(eng_w.training_step(x)["loss"])
    l0 = float(eng_0.training_step(x)["loss"])
    assert lw == l0


def test_min_snr_changes_the_objective():
    """With a binding gamma the loss differs and training still works."""
    eng_w = make_engine(loss_weighting="min_snr", snr_gamma=1.0)
    eng_0 = make_engine()
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    lw = float(eng_w.training_step(x)["loss"])
    l0 = float(eng_0.training_step(x)["loss"])
    assert abs(lw - l0) > 1e-8
    # gamma=1 downweights most steps hard, so per-step loss is noisy
    # (t is resampled every step) — check training progresses on average
    losses = [float(eng_w.training_step(x)["loss"]) for _ in range(12)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    # val loss is weighted with the same objective (comparable to train)
    val = eng_w.validation_step(x)
    assert np.isfinite(val["val_loss"])


def test_min_snr_composes_with_v_and_importance():
    eng = make_engine(
        loss_weighting="min_snr", snr_gamma=5.0, prediction_type="v",
        sampling="importance",
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 1))
    for _ in range(3):
        m = eng.training_step(x)
    assert np.isfinite(float(m["loss"]))
    imgs = eng.generate_images(n=2, minibatch=2, seed=1)
    assert imgs.shape == (2, 8, 8, 1) and np.isfinite(imgs).all()


def test_loss_weighting_validated():
    with pytest.raises(ValueError, match="loss_weighting"):
        make_engine(loss_weighting="p2")
