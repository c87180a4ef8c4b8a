"""Continuous-time ODE likelihood for flow models (evals/ode_nll.py;
FFJORD-style instantaneous change of variables + Hutchinson trace) —
beyond the reference's discrete VLB.

Contract under test:
  * on the analytic Gaussian velocity field (diagonal Jacobian, so one
    Rademacher probe is EXACT) the estimate converges to the closed-form
    Gaussian log-density, with Heun's 2nd-order signature;
  * the estimate is per-sample (batch composition does not leak);
  * the engine endpoint jits once per (n_steps, n_probes), requires a
    flow engine, and returns finite bits/dim on a real UNet.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core.flow import TIME_SCALE
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.evals.ode_nll import flow_ode_nll


def _gaussian_flow_raw(c2=1.0):
    """Exact velocity for data ~ N(0, c2 I) (same field as
    tests/test_flow.py): F(x, t) = (t - (1-t) c2) / V(t) * x."""

    def apply_fn(p, x, t_in, y=None, **kw):
        t = (t_in / TIME_SCALE).reshape((-1,) + (1,) * (x.ndim - 1))
        V = (1 - t) ** 2 * c2 + t**2
        return (t - (1 - t) * c2) / V * x

    return apply_fn


def test_ode_nll_matches_analytic_gaussian():
    """The model density of the exact field IS N(0, c2 I); the ODE
    likelihood must converge to its closed form, Heun at 2nd order."""
    c2 = 0.49
    apply_fn = _gaussian_flow_raw(c2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4, 4, 1), jnp.float32) * np.sqrt(c2)
    D = 16
    want = -0.5 * (
        np.sum(np.asarray(x).reshape(8, -1) ** 2, axis=1) / c2
        + D * np.log(2 * np.pi * c2)
    )

    def err(n, heun):
        got = flow_ode_nll(apply_fn, {}, x, jax.random.PRNGKey(1),
                           n_steps=n, heun=heun)["log_likelihood"]
        return float(np.abs(np.asarray(got) - want).max())

    e_h = [err(n, True) for n in (16, 32, 64)]
    assert e_h[0] > e_h[1] > e_h[2], e_h
    assert e_h[0] / e_h[1] > 3.0 and e_h[1] / e_h[2] > 3.0, e_h
    assert e_h[2] < 0.05, e_h
    e_e = err(64, False)
    assert e_e > e_h[2], (e_e, e_h)  # Euler is the worse integrator

    # bits/dim bookkeeping: -logp / (D ln 2)
    out = flow_ode_nll(apply_fn, {}, x, jax.random.PRNGKey(1), n_steps=64)
    np.testing.assert_allclose(
        np.asarray(out["nll_bits_per_dim"]),
        -np.asarray(out["log_likelihood"]) / (D * np.log(2.0)),
        rtol=1e-6,
    )


def test_ode_nll_is_per_sample():
    """Each row's likelihood must not depend on its batch companions."""
    apply_fn = _gaussian_flow_raw(1.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 4, 4, 1), jnp.float32)
    full = flow_ode_nll(apply_fn, {}, x, jax.random.PRNGKey(3),
                        n_steps=16)["log_likelihood"]
    # same probe stream per row: slice the batch, compare row 0
    half = flow_ode_nll(apply_fn, {}, x[:3], jax.random.PRNGKey(3),
                        n_steps=16)["log_likelihood"]
    np.testing.assert_allclose(np.asarray(full[:3]), np.asarray(half),
                               rtol=1e-5, atol=1e-5)


def test_ode_nll_validation():
    apply_fn = _gaussian_flow_raw(1.0)
    x = jnp.zeros((2, 4, 4, 1))
    with pytest.raises(ValueError, match="integration step"):
        flow_ode_nll(apply_fn, {}, x, jax.random.PRNGKey(0), n_steps=0)
    with pytest.raises(ValueError, match="probe"):
        flow_ode_nll(apply_fn, {}, x, jax.random.PRNGKey(0), n_probes=0)


def test_engine_ode_likelihood_endpoint():
    eng = DiffusionEngine(
        model_config=dict(
            name="unet", in_channels=1, model_channels=16,
            num_res_blocks=1, attention_resolutions=[],
            channel_mult=[1, 2], use_scale_shift_norm=True,
        ),
        optimizer_config={"lr": 2e-3}, diffusion_steps=10, mode="cosine",
        resolution=8, ema=0.99, seed=0, prediction_type="flow",
    )
    x = jnp.full((4, 8, 8, 1), 0.3, jnp.float32)
    out = eng.calculate_ode_likelihood(x, n_steps=8)
    assert out["log_likelihood"].shape == (4,)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
    # jit cache: same (n_steps, n_probes) -> same compiled callable
    assert len(eng._ode_nll_jits) == 1
    eng.calculate_ode_likelihood(x, n_steps=8, seed=1)
    assert len(eng._ode_nll_jits) == 1
    eng.calculate_ode_likelihood(x, n_steps=4)
    assert len(eng._ode_nll_jits) == 2

    eps = DiffusionEngine(
        model_config=dict(
            name="unet", in_channels=1, model_channels=16,
            num_res_blocks=1, attention_resolutions=[],
            channel_mult=[1, 2], use_scale_shift_norm=True,
        ),
        optimizer_config={"lr": 2e-3}, diffusion_steps=10, mode="cosine",
        resolution=8, seed=0,
    )
    with pytest.raises(ValueError, match='prediction_type="flow"'):
        eps.calculate_ode_likelihood(x)


def _gaussian_edm_raw(c2, sigma_data=0.5):
    """Exact EDM raw net for data ~ N(0, c2 I): inverting the
    preconditioning on the analytic denoiser D(x, s) = c2/(c2+s^2) x."""
    from probabilisticdeepdiffusionmodels_tpu.core.edm import precond

    def apply_fn(p, x_in, c_noise, y=None, **kw):
        sigma = jnp.exp(4.0 * c_noise)
        c_skip, c_out, c_in, _ = precond(sigma, sigma_data)
        b = (-1,) + (1,) * (x_in.ndim - 1)
        x = x_in / c_in.reshape(b)
        D = c2 / (c2 + jnp.square(sigma)).reshape(b) * x
        return (D - c_skip.reshape(b) * x) / c_out.reshape(b)

    return apply_fn


def test_edm_ode_nll_matches_analytic_gaussian():
    """The sigma-space PF-ODE of the exact Gaussian denoiser transports
    N(0, c2 + sigma_min^2) (the smoothed data density) to
    N(0, c2 + sigma_max^2); edm_ode_nll must converge to the smoothed
    closed form (diagonal Jacobian -> one Rademacher probe exact)."""
    from probabilisticdeepdiffusionmodels_tpu.evals.ode_nll import (
        edm_ode_nll,
    )

    c2 = 0.49
    s_min, s_max = 0.002, 20.0
    apply_fn = _gaussian_edm_raw(c2)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (8, 4, 4, 1), jnp.float32) * np.sqrt(c2)
    D = 16
    v = c2 + s_min**2
    want = -0.5 * (
        np.sum(np.asarray(x).reshape(8, -1) ** 2, axis=1) / v
        + D * np.log(2 * np.pi * v)
    )

    def err(n):
        got = edm_ode_nll(
            apply_fn, {}, x, jax.random.PRNGKey(5),
            sigma_min=s_min, sigma_max=s_max, n_steps=n,
        )["log_likelihood"]
        return float(np.abs(np.asarray(got) - want).max())

    e = [err(n) for n in (32, 64, 128)]
    assert e[0] > e[1] > e[2], e
    # 2nd-order signature: ~4x error drop per grid doubling
    assert e[0] / e[1] > 3.0 and e[1] / e[2] > 3.0, e
    assert e[2] < 0.05, e


def test_engine_edm_ode_likelihood_endpoint():
    eng = DiffusionEngine(
        model_config=dict(
            name="unet", in_channels=1, model_channels=16,
            num_res_blocks=1, attention_resolutions=[],
            channel_mult=[1, 2], use_scale_shift_norm=True,
        ),
        optimizer_config={"lr": 2e-3}, diffusion_steps=10, mode="cosine",
        resolution=8, ema=0.99, seed=0, prediction_type="edm",
    )
    x = jnp.full((4, 8, 8, 1), 0.3, jnp.float32)
    out = eng.calculate_ode_likelihood(x, n_steps=8)
    assert out["log_likelihood"].shape == (4,)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.slow
def test_eval_cli_ode_nll(tmp_path):
    """cli.eval ode_nll=true on a flow run adds test_ode_nll (bits/dim)
    beside the VLB columns, and rejects non-flow runs."""
    from probabilisticdeepdiffusionmodels_tpu.cli.eval import (
        main as eval_main,
    )
    from probabilisticdeepdiffusionmodels_tpu.cli.train import (
        main as train_main,
    )

    res = train_main([
        "model=unet_small_grey", "data=synthetic", "data.channels=1",
        "data.n=32", "data.batch_size=16", "data.num_samples_per_epoch=32",
        "data.transformation_kwargs.normalize=mnist", "engine=mnist",
        "engine.resolution=8", "engine.diffusion_steps=12",
        "engine.mode=cosine", "engine.ema=0.9",
        "engine.prediction_type=flow", "model.use_scale_shift_norm=true",
        "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=1",
        "trainer.limit_test_batches=1", "visualization=none",
        f"out_dir={tmp_path}", "run_name=flowrun",
    ])
    out = eval_main([
        f"run_dir={res['run_dir']}", "use_train_data=false",
        "trainer.limit_test_batches=1", "ode_nll=true", "ode_steps=8",
    ])
    assert np.isfinite(out["test_ode_nll"])
    assert np.isfinite(out["test_nll"])  # the VLB columns stay

    with pytest.raises(ValueError, match="flow"):
        # the run's own engine group is eps by default in another run;
        # simplest: re-point eval at the same run but ask for ode_nll on
        # a non-flow engine via a fresh eps training run
        res2 = train_main([
            "model=unet_small_grey", "data=synthetic", "data.channels=1",
            "data.n=32", "data.batch_size=16",
            "data.num_samples_per_epoch=32",
            "data.transformation_kwargs.normalize=mnist", "engine=mnist",
            "engine.resolution=8", "engine.diffusion_steps=12",
            "engine.mode=cosine", "engine.ema=0.9",
            "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=1",
            "trainer.limit_test_batches=1", "visualization=none",
            f"out_dir={tmp_path}", "run_name=epsrun",
        ])
        eval_main([
            f"run_dir={res2['run_dir']}", "use_train_data=false",
            "trainer.limit_test_batches=1", "ode_nll=true",
        ])
