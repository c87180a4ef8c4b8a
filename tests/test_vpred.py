"""v-prediction (Salimans & Ho, arXiv:2202.00512) — beyond-reference
parameterization: training regresses v = sqrt(ab)*eps - sqrt(1-ab)*x0,
inference converts back to eps through sample.make_v_to_eps_apply_fn so
every sampler/evaluator runs unchanged.
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
from probabilisticdeepdiffusionmodels_tpu.sample import (
    make_v_to_eps_apply_fn,
    p_sample_loop,
)

T = 12


@pytest.fixture(scope="module")
def tables():
    return DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )


def test_v_roundtrip_identities(tables):
    """v_target then eps_from_v recovers the noise exactly (a^2+s^2=1),
    and the x0 reconstruction identity holds."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (5, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.asarray([1, 3, 6, 9, 12], jnp.int32)
    x_t = D.q_sample(tables, x0, noise, t)
    v = D.v_target(tables, x0, noise, t)
    eps = D.eps_from_v(tables, x_t, t, v)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise),
                               rtol=0, atol=1e-5)
    a = D.expand_to(tables.alphas_hat_sqrt, t, x0.ndim)
    s = D.expand_to(tables.one_min_alphas_hat_sqrt, t, x0.ndim)
    np.testing.assert_allclose(np.asarray(a * x_t - s * v), np.asarray(x0),
                               rtol=0, atol=1e-5)


def test_eps_view_wrapper_matches_eps_model(tables):
    """A v-model algebraically derived from an eps-model, seen through the
    eps-view wrapper, reproduces the eps-model's sampler trajectory."""

    def eps_model(params, x, t, y=None, **kw):
        # deterministic toy score: depends on x and t
        return jnp.tanh(x) * (1.0 + 0.1 * t.astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1)))

    def v_model(params, x, t, y=None, **kw):
        a = D.expand_to(tables.alphas_hat_sqrt, t, x.ndim)
        s = D.expand_to(tables.one_min_alphas_hat_sqrt, t, x.ndim)
        eps = eps_model(params, x, t, y, **kw)
        return (eps - s * x) / a  # invert eps_from_v

    key = jax.random.PRNGKey(3)
    x_T = jax.random.normal(key, (4, 8, 8, 1))
    out_eps = p_sample_loop(eps_model, {}, tables, x_T, key, clip=True)
    out_v = p_sample_loop(
        make_v_to_eps_apply_fn(v_model, tables), {}, tables, x_T, key,
        clip=True,
    )
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_eps),
                               rtol=0, atol=1e-4)


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
        ema=0.9,
        seed=0,
        prediction_type="v",
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


def test_engine_v_trains_and_samples():
    eng = make_engine()
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    losses = [float(eng.training_step(x)["loss"]) for _ in range(8)]
    assert np.isfinite(losses).all()
    # regressing v of a FIXED batch: loss must come down
    assert losses[-1] < losses[0]
    val = eng.validation_step(x)
    assert np.isfinite(val["val_loss"])
    imgs = eng.generate_images(n=3, minibatch=3, seed=1)
    assert imgs.shape == (3, 8, 8, 1) and np.isfinite(imgs).all()
    again = eng.generate_images(n=3, minibatch=3, seed=1)
    np.testing.assert_array_equal(imgs, again)
    # respaced chain exercises original-unit conversion via timestep_map
    fast = eng.generate_images(n=2, minibatch=2, seed=1, num_sample_steps=6)
    assert np.isfinite(fast).all()
    ddim = eng.generate_images(n=2, minibatch=2, seed=1, num_sample_steps=6,
                               ddim=True)
    assert np.isfinite(ddim).all()
    nll = eng.calculate_likelihood(x, seed=0)
    assert np.isfinite(np.asarray(nll["nll"])).all()


def test_engine_v_hybrid_loss():
    eng = make_engine(loss_type="hybrid")
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    m = eng.training_step(x)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["vlb"]))
    imgs = eng.generate_images(n=2, minibatch=2, seed=2)
    assert imgs.shape == (2, 8, 8, 1) and np.isfinite(imgs).all()


def test_v_loss_differs_from_eps_loss():
    """Same rng/state: the v loss is a genuinely different objective."""
    eng_v = make_engine()
    eng_e = make_engine(prediction_type="epsilon")
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    lv = float(eng_v.training_step(x)["loss"])
    le = float(eng_e.training_step(x)["loss"])
    assert abs(lv - le) > 1e-6


def test_prediction_type_validated():
    with pytest.raises(ValueError, match="prediction_type"):
        make_engine(prediction_type="score")


# ---- x0-prediction (improved-diffusion predict_xstart) -------------------


def test_x0_roundtrip_identity(tables):
    """eps_from_xstart inverts xstart_from_epsilon exactly."""
    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.asarray([1, 4, 8, 12], jnp.int32)
    x_t = D.q_sample(tables, x0, noise, t)
    eps = D.eps_from_xstart(tables, x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise),
                               rtol=0, atol=2e-5)


def test_x0_eps_view_matches_eps_model(tables):
    """An x0-model algebraically derived from an eps-model, through the
    x0 eps-view wrapper, reproduces the eps-model's trajectory."""
    from probabilisticdeepdiffusionmodels_tpu.sample import (
        make_x0_to_eps_apply_fn,
    )

    def eps_model(params, x, t, y=None, **kw):
        return jnp.tanh(x) * (1.0 + 0.1 * t.astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1)))

    def x0_model(params, x, t, y=None, **kw):
        eps = eps_model(params, x, t, y, **kw)
        return D.xstart_from_epsilon(tables, x, t, eps)

    key = jax.random.PRNGKey(3)
    x_T = jax.random.normal(key, (4, 8, 8, 1))
    out_eps = p_sample_loop(eps_model, {}, tables, x_T, key, clip=True)
    out_x0 = p_sample_loop(
        make_x0_to_eps_apply_fn(x0_model, tables), {}, tables, x_T, key,
        clip=True,
    )
    np.testing.assert_allclose(np.asarray(out_x0), np.asarray(out_eps),
                               rtol=0, atol=1e-4)


def test_engine_x0_trains_and_samples():
    eng = make_engine(prediction_type="x0")
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    losses = [float(eng.training_step(x)["loss"]) for _ in range(8)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    val = eng.validation_step(x)
    assert np.isfinite(val["val_loss"])
    imgs = eng.generate_images(n=2, minibatch=2, seed=1)
    assert imgs.shape == (2, 8, 8, 1) and np.isfinite(imgs).all()
    ddim = eng.generate_images(n=2, minibatch=2, seed=1, num_sample_steps=6,
                               ddim=True)
    assert np.isfinite(ddim).all()
    nll = eng.calculate_likelihood(x, seed=0)
    assert np.isfinite(np.asarray(nll["nll"])).all()
