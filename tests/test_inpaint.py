"""RePaint-style inpainting (Lugmayr et al., arXiv:2201.09865) — beyond
the reference, whose closest capability is whole-image
diffuse_and_reconstruct (src/engine.py:617-657).  The known region is
re-imposed by forward-noising x0 at each step's target time; optional
time-travel resampling harmonizes each step R times.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core import (
    DiffusionTables,
    NoiseSchedule,
)
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.sample import inpaint_sample_loop

T = 10


@pytest.fixture(scope="module")
def tables():
    return DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )


def toy_apply(params, x, t, y=None, **kw):
    return 0.2 * jnp.tanh(x)


def test_known_region_exact_and_deterministic(tables):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (3, 8, 8, 2))
    mask = jnp.zeros((8, 8, 1)).at[:4].set(1.0)  # top half known
    x_t = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    out = inpaint_sample_loop(
        toy_apply, None, tables, x_t, jax.random.PRNGKey(7),
        x0_known=x0, mask=mask,
    )
    out = np.asarray(out)
    m = np.broadcast_to(np.asarray(mask), x0.shape).astype(bool)
    np.testing.assert_array_equal(out[m], np.asarray(x0)[m])
    assert np.isfinite(out).all()
    # unknown region was actually generated, not copied
    assert np.abs(out[~m] - np.asarray(x0)[~m]).max() > 0.1
    again = inpaint_sample_loop(
        toy_apply, None, tables, x_t, jax.random.PRNGKey(7),
        x0_known=x0, mask=mask,
    )
    np.testing.assert_array_equal(out, np.asarray(again))


def test_resampling_runs_and_differs(tables):
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (2, 8, 8, 1))
    mask = jnp.zeros((8, 8, 1)).at[:, :4].set(1.0)
    x_t = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    r1 = inpaint_sample_loop(
        toy_apply, None, tables, x_t, jax.random.PRNGKey(7),
        x0_known=x0, mask=mask, resample_steps=1,
    )
    r3 = inpaint_sample_loop(
        toy_apply, None, tables, x_t, jax.random.PRNGKey(7),
        x0_known=x0, mask=mask, resample_steps=3,
    )
    m = np.broadcast_to(np.asarray(mask), x0.shape).astype(bool)
    for r in (r1, r3):
        r = np.asarray(r)
        assert np.isfinite(r).all()
        np.testing.assert_array_equal(r[m], np.asarray(x0)[m])
    assert not np.array_equal(np.asarray(r1), np.asarray(r3))


MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
)


def test_engine_inpaint_endpoint():
    eng = DiffusionEngine(
        model_config=MODEL_CFG, optimizer_config={"lr": 1e-3},
        diffusion_steps=T, mode="cosine", resolution=8, seed=0,
    )
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 1))
    mask = jnp.zeros((8, 8, 1)).at[2:6, 2:6].set(1.0)
    out = np.asarray(eng.inpaint(x0, mask, seed=3))
    m = np.broadcast_to(np.asarray(mask), x0.shape).astype(bool)
    np.testing.assert_array_equal(out[m], np.asarray(x0)[m])
    assert np.isfinite(out).all()
    # respaced chain + resampling through the same endpoint
    fast = np.asarray(
        eng.inpaint(x0, mask, seed=3, num_sample_steps=5, resample_steps=2)
    )
    np.testing.assert_array_equal(fast[m], np.asarray(x0)[m])
    assert np.isfinite(fast).all()
    # the jit is cached: second call with new arrays traces nothing new
    n_jits = len(eng._sample_jits)
    _ = eng.inpaint(x0, mask, seed=4)
    assert len(eng._sample_jits) == n_jits


def test_channel_mask_colorization_style(tables):
    """mask broadcasts over channels too: keeping one channel and filling
    the rest is channel-completion (colorization-style conditioning)."""
    key = jax.random.PRNGKey(9)
    x0 = jax.random.normal(key, (2, 8, 8, 3))
    mask = jnp.asarray([1.0, 0.0, 0.0])[None, None, :]  # keep channel 0
    x_t = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    out = np.asarray(inpaint_sample_loop(
        toy_apply, None, tables, x_t, jax.random.PRNGKey(3),
        x0_known=x0, mask=mask,
    ))
    np.testing.assert_array_equal(out[..., 0], np.asarray(x0)[..., 0])
    assert np.abs(out[..., 1:] - np.asarray(x0)[..., 1:]).max() > 0.1
    assert np.isfinite(out).all()
