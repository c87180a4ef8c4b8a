"""DDIM inversion (deterministic probability-flow encoding) — beyond the
reference, whose only encoder is the stochastic q_sample
(get_noised_representation, src/engine.py:604-615).
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
from probabilisticdeepdiffusionmodels_tpu.sample import (
    ddim_invert_loop,
    ddim_sample_loop,
)

T = 20


@pytest.fixture(scope="module")
def tables():
    return DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )


def test_roundtrip_exact_for_x_independent_eps(tables):
    """With eps independent of x AND t the inversion is the exact
    algebraic inverse: invert -> ddim(eta=0) reproduces x0 bitwise-ish."""
    const_eps = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 1))

    def apply_fn(params, x, t, y=None, **kw):
        return jnp.broadcast_to(const_eps, x.shape)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 1))
    x_T = ddim_invert_loop(apply_fn, None, tables, x0)
    back = ddim_sample_loop(apply_fn, None, tables, x_T, eta=0.0, clip=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0),
                               rtol=0, atol=1e-4)


def test_midchain_roundtrip_converges_with_steps():
    """For an x-dependent eps the mid-chain roundtrip error is the ODE
    discretization mismatch: small, and shrinking as steps grow.  (The
    FULL-chain roundtrip with an arbitrary toy eps is ill-conditioned —
    the backward x0-recovery divides by sqrt(ab_T); only a trained,
    self-consistent eps keeps that stable, so the convergence law is the
    right invariant to pin here.)"""

    def apply_fn(params, x, t, y=None, **kw):
        return 0.3 * jnp.tanh(x)

    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 1)), -1, 1)
    sig = float(jnp.sqrt(jnp.mean(x0**2)))
    ratios = []
    for steps in (20, 100):
        tb = DiffusionTables.from_schedule(
            NoiseSchedule.create(diffusion_steps=steps, mode="cosine")
        )
        tm = steps // 2
        x_m = ddim_invert_loop(apply_fn, None, tb, x0, t_end=tm)
        back = ddim_sample_loop(apply_fn, None, tb, x_m, t_start=tm,
                                eta=0.0, clip=False)
        err = float(jnp.sqrt(jnp.mean((back - x0) ** 2)))
        ratios.append(err / sig)
    assert ratios[0] < 0.02, ratios
    assert ratios[1] < ratios[0] / 2, ratios  # O(1/steps) convergence


def test_engine_endpoint_and_respaced():
    eng = DiffusionEngine(
        model_config=dict(
            name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
            attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
        ),
        optimizer_config={"lr": 1e-3},
        diffusion_steps=T, mode="cosine", resolution=8, seed=0,
    )
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 1))
    z1 = np.asarray(eng.ddim_invert(x0))
    z2 = np.asarray(eng.ddim_invert(x0))
    np.testing.assert_array_equal(z1, z2)  # deterministic
    assert z1.shape == x0.shape and np.isfinite(z1).all()
    z_fast = np.asarray(eng.ddim_invert(x0, num_sample_steps=6))
    assert np.isfinite(z_fast).all()
    assert not np.array_equal(z1, z_fast)
