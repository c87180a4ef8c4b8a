"""EDM continuous-sigma training + native sampling (Karras et al.,
arXiv:2206.00364) — beyond the reference, which trains the discrete-T
DDPM objective only (src/engine.py:263-307).

Contract under test:
  * the preconditioning identities of eq. 7 and lambda*c_out^2 == 1;
  * the rho-warped sigma grid (eq. 5) hits its endpoints and matches the
    closed form;
  * edm_sample_loop converges to the analytic PF-ODE limit on
    Gaussian data, with the 2nd-order (Heun) signature as the grid is
    refined;
  * make_edm_to_eps_apply_fn is EXACTLY the analytic eps-model when the
    denoiser is exact (the algebraic identity between the VP and sigma
    parameterizations);
  * the engine end-to-end: edm training learns, native + table-driven
    (eps-view) sampling both work, invalid combos are rejected, CFG
    composes, churn composes, and mesh sampling is a pure layout change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core import (
    DiffusionTables,
    EDMConfig,
    NoiseSchedule,
    edm_loss_weight,
    edm_precond,
    karras_sigma_grid,
)
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
)
from probabilisticdeepdiffusionmodels_tpu.sample import (
    edm_sample_loop,
    make_edm_to_eps_apply_fn,
)


# ---------------------------------------------------------------- math


def test_precond_identities():
    """eq. 7 closed forms + the unit-variance identity lambda*c_out^2=1."""
    sd = 0.5
    sigma = jnp.asarray([0.002, 0.1, 0.5, 2.0, 80.0])
    c_skip, c_out, c_in, c_noise = edm_precond(sigma, sd)
    np.testing.assert_allclose(
        np.asarray(c_in), 1.0 / np.sqrt(sigma**2 + sd**2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c_skip), sd**2 / (sigma**2 + sd**2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c_out),
        np.asarray(sigma) * sd / np.sqrt(sigma**2 + sd**2),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(c_noise), np.log(np.asarray(sigma)) / 4.0, rtol=1e-6
    )
    lam = edm_loss_weight(sigma, sd)
    np.testing.assert_allclose(
        np.asarray(lam * c_out**2), np.ones(5), rtol=1e-5
    )


def test_karras_sigma_grid():
    g = karras_sigma_grid(18, 0.002, 80.0, rho=7.0)
    assert g.shape == (18,)
    np.testing.assert_allclose(g[0], 80.0, rtol=1e-12)
    np.testing.assert_allclose(g[-1], 0.002, rtol=1e-12)
    assert np.all(np.diff(g) < 0), "grid must be strictly descending"
    # closed form at an interior point
    i, n = 5, 18
    expect = (
        80.0 ** (1 / 7.0)
        + i / (n - 1) * (0.002 ** (1 / 7.0) - 80.0 ** (1 / 7.0))
    ) ** 7.0
    np.testing.assert_allclose(g[i], expect, rtol=1e-12)
    with pytest.raises(ValueError):
        karras_sigma_grid(0)
    np.testing.assert_allclose(karras_sigma_grid(1, 0.01, 50.0), [50.0])


# ------------------------------------------------- analytic ground truth


def _gaussian_edm_raw(sd, c2=1.0):
    """The RAW network F whose preconditioned denoiser is the exact
    denoiser for data ~ N(0, c2 I): D(x; sigma) = c2 x / (c2 + sigma^2).
    Inverts the preconditioning the loop applies: the loop calls
    F(c_in x, c_noise) and builds D = c_skip x + c_out F."""

    def apply_fn(p, x_in, t, y=None, **kw):
        sigma = jnp.exp(4.0 * t).reshape((-1,) + (1,) * (x_in.ndim - 1))
        c_skip, c_out, c_in, _ = edm_precond(sigma, sd)
        x = x_in / c_in
        denoised = c2 * x / (c2 + sigma**2)
        return (denoised - c_skip * x) / c_out

    return apply_fn


def test_edm_sample_loop_matches_analytic_ode_limit():
    """For data ~ N(0, I) the sigma-space PF-ODE has the closed form
    x(sigma) = x(s_max) sqrt((c2+sigma^2)/(c2+s_max^2)); the loop must
    converge to it with the 2nd-order signature under grid refinement."""
    sd, c2, s_max = 0.5, 1.0, 80.0
    apply_fn = _gaussian_edm_raw(sd, c2)
    z = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 4, 1), jnp.float32)
    exact = s_max * z * np.sqrt(c2 / (c2 + s_max**2))

    errs = []
    for n in (8, 16, 32):
        out = edm_sample_loop(
            apply_fn, {}, None, z, None, n_steps=n, sigma_data=sd,
            sigma_min=0.002, sigma_max=s_max,
        )
        errs.append(
            float(jnp.sqrt(jnp.mean((out - exact) ** 2)))
        )
    assert errs[0] > errs[1] > errs[2], errs
    # Heun is O(h^2): halving the step should cut the error by ~4; allow
    # slack for the rho-warped (non-uniform) grid.  Measured: 0.286 /
    # 0.0557 / 0.0122 at n=8/16/32 (ratios 5.1x, 4.6x).
    assert errs[0] / errs[1] > 3.0, errs
    assert errs[1] / errs[2] > 3.0, errs
    assert errs[2] < 0.02, errs


def test_edm_eps_view_is_the_analytic_eps_model():
    """Algebraic identity: wrapping the exact EDM denoiser for
    N(0, c2 I) data in the eps view over VP tables must reproduce the
    exact VP eps-model eps(x,t) = sqrt(1-ab) x / (ab c2 + 1-ab)."""
    sd, c2 = 0.5, 1.3
    sched = NoiseSchedule.create(diffusion_steps=40, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    eps_view = make_edm_to_eps_apply_fn(_gaussian_edm_raw(sd, c2), tables, sd)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 3), jnp.float32)
    t = jnp.asarray([1, 5, 10, 20, 30, 35, 39, 40], jnp.int32)
    got = eps_view({}, x, t, None)
    abar = np.asarray(sched.alphas_hat)[np.asarray(t) - 1].reshape(
        (-1, 1, 1, 1)
    )
    want = np.sqrt(1.0 - abar) * np.asarray(x) / (abar * c2 + 1.0 - abar)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_edm_churn_paths():
    """s_churn=0 ignores the key (deterministic); s_churn>0 needs a key,
    stays finite, and actually perturbs the trajectory."""
    sd = 0.5
    apply_fn = _gaussian_edm_raw(sd)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 1), jnp.float32)
    a = edm_sample_loop(apply_fn, {}, None, z, jax.random.PRNGKey(0),
                        n_steps=8, sigma_data=sd)
    b = edm_sample_loop(apply_fn, {}, None, z, jax.random.PRNGKey(9),
                        n_steps=8, sigma_data=sd)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="needs a PRNG key"):
        edm_sample_loop(apply_fn, {}, None, z, None, n_steps=8,
                        sigma_data=sd, s_churn=5.0)
    c = edm_sample_loop(apply_fn, {}, None, z, jax.random.PRNGKey(0),
                        n_steps=8, sigma_data=sd, s_churn=5.0)
    assert np.all(np.isfinite(np.asarray(c)))
    assert float(np.abs(np.asarray(c) - np.asarray(a)).max()) > 1e-4


# ----------------------------------------------------------- the engine


EDM_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2],
    use_scale_shift_norm=True,
)


def _edm_engine(mesh=None, **kw):
    return DiffusionEngine(
        model_config=dict(EDM_CFG), optimizer_config={"lr": 2e-3},
        diffusion_steps=10, mode="cosine", resolution=8, ema=0.99,
        seed=0, prediction_type="edm", mesh=mesh, **kw,
    )


def test_engine_edm_rejects_incompatible_knobs():
    with pytest.raises(ValueError, match="learned-sigma"):
        _edm_engine(loss_type="hybrid")
    with pytest.raises(ValueError, match="continuously"):
        _edm_engine(sampling="importance")
    with pytest.raises(ValueError, match="its own"):
        _edm_engine(loss_weighting="min_snr")
    eng = DiffusionEngine(
        model_config=dict(EDM_CFG), optimizer_config={"lr": 1e-3},
        diffusion_steps=10, mode="cosine", resolution=8, seed=0,
    )
    with pytest.raises(ValueError, match='prediction_type="edm"'):
        eng.generate_images(n=1, minibatch=1, edm=True)


def test_engine_edm_trains_and_samples():
    """Loss decreases on a constant-image dataset; the native sampler and
    the table-driven eps-view samplers all emit finite images; per-call
    knob validation holds; the hparams round-trip carries edm_config."""
    eng = _edm_engine(edm_config=dict(sigma_data=0.6, sigma_max=20.0))
    assert eng.edm.sigma_data == 0.6 and eng.edm.sigma_max == 20.0
    assert eng.hparams["edm_config"] == dict(sigma_data=0.6, sigma_max=20.0)

    x = jnp.full((16, 8, 8, 1), 0.5, jnp.float32)
    losses = [float(eng.training_step(x)["loss"]) for _ in range(30)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    native = eng.generate_images(n=3, minibatch=2, edm=True,
                                 num_sample_steps=6, seed=3)
    assert native.shape == (3, 8, 8, 1)
    assert np.all(np.isfinite(native))
    churned = eng.generate_images(n=2, minibatch=2, edm=True,
                                  num_sample_steps=6, edm_churn=3.0, seed=3)
    assert np.all(np.isfinite(churned))

    for kw in (dict(ddim=True), dict(dpm_solver=True), dict(heun=True),
               dict()):
        out = eng.generate_images(n=2, minibatch=2, num_sample_steps=5,
                                  seed=1, **kw)
        assert out.shape == (2, 8, 8, 1) and np.all(np.isfinite(out)), kw

    nll = eng.test_step(x[:4])
    assert np.isfinite(nll["test_nll"])

    with pytest.raises(ValueError, match="int num_sample_steps"):
        eng.generate_images(n=1, minibatch=1, edm=True,
                            num_sample_steps="karras5")
    with pytest.raises(ValueError, match="at most one"):
        eng.generate_images(n=1, minibatch=1, edm=True, ddim=True)
    with pytest.raises(ValueError, match="encoder_reuse"):
        eng.generate_images(n=1, minibatch=1, edm=True, encoder_reuse=3)


def test_engine_edm_feature_vectors_are_preconditioned():
    """get_feature_vectors must route through the EDM input transform —
    the raw net is only in-distribution on (c_in x_ve, c_noise); feeding
    raw (x, t) would silently extract out-of-distribution features."""
    eng = _edm_engine()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    feats = eng.get_feature_vectors(x, 5)
    assert set(feats) >= {"down", "middle", "up"}
    for leaf in jax.tree.leaves(feats):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # must differ from the raw-input call (the preconditioning is real)
    raw = eng.model.apply(
        {"params": eng.params()}, x, jnp.full((2,), 5, jnp.int32), None,
        return_features=True,
    )
    assert not np.allclose(
        np.asarray(feats["middle"]), np.asarray(raw["middle"])
    )
    # out-of-range t must fail loudly: the wrapper's table gathers would
    # silently wrap (t=0 -> sigma_max) or NaN-fill (t>T)
    with pytest.raises(ValueError, match=r"t must be in \[1, 10\]"):
        eng.get_feature_vectors(x, 0)
    with pytest.raises(ValueError, match=r"t must be in \[1, 10\]"):
        eng.get_feature_vectors(x, 11)


def test_engine_edm_validation_step_uses_edm_loss():
    eng = _edm_engine()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 1))
    out = eng.validation_step(x)
    assert np.isfinite(out["val_loss"]) and np.isfinite(
        out["val_loss_no_ema"]
    )


def test_engine_edm_cfg_composes():
    """Classifier-free guidance on the NATIVE sigma-space sampler: a lerp
    on the raw network F is a lerp on D (affine), so the standard wrapper
    applies; s=1 must equal plain conditional sampling."""
    mc = dict(EDM_CFG, num_classes=3, cfg_null_class=True)
    eng = DiffusionEngine(
        model_config=mc, optimizer_config={"lr": 1e-3},
        diffusion_steps=10, mode="cosine", resolution=8, seed=0,
        prediction_type="edm", class_dropout_prob=0.2,
    )
    # class-dependent data so the label path actually learns something
    # (at init the zero-init out-conv makes cond == uncond and guidance
    # would be a measured no-op)
    y = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1], jnp.int32)
    x = (y.astype(jnp.float32) - 1.0).reshape(8, 1, 1, 1) * jnp.ones(
        (8, 8, 8, 1), jnp.float32
    ) * 0.5
    for _ in range(30):
        eng.training_step(x, y)

    yy = jnp.asarray([0, 1], jnp.int32)
    plain = eng.generate_images(n=2, minibatch=2, edm=True,
                                num_sample_steps=5, seed=7, y=yy)
    s1 = eng.generate_images(n=2, minibatch=2, edm=True, num_sample_steps=5,
                             seed=7, y=yy, guidance_scale=1.0)
    np.testing.assert_allclose(s1, plain, rtol=1e-5, atol=1e-6)
    s3 = eng.generate_images(n=2, minibatch=2, edm=True, num_sample_steps=5,
                             seed=7, y=yy, guidance_scale=3.0)
    assert np.all(np.isfinite(s3))
    assert float(np.abs(s3 - plain).max()) > 1e-5
    with pytest.raises(ValueError, match="guidance_interval"):
        eng.generate_images(n=2, minibatch=2, edm=True, num_sample_steps=5,
                            y=yy, guidance_scale=3.0,
                            guidance_interval=(2, 8))


def test_engine_edm_mesh_sampling_is_layout_only():
    """Native EDM sampling under the 8-device data mesh must equal the
    single-device chain (same pattern as the other samplers'
    layout-equality tests)."""
    e1 = _edm_engine(None)
    e8 = _edm_engine(make_mesh(8))
    x = jnp.full((8, 8, 8, 1), 0.4, jnp.float32)
    e1.training_step(x)
    e8.training_step(x)
    a = e1.generate_images(n=8, minibatch=8, edm=True, num_sample_steps=5,
                           seed=5)
    b = e8.generate_images(n=8, minibatch=8, edm=True, num_sample_steps=5,
                           seed=5)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
