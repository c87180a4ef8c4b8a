"""Flow matching / rectified flow (Lipman et al., arXiv:2210.02747; Liu
et al., arXiv:2209.03003; SD3's logit-normal time + shift,
arXiv:2403.03206) — beyond the reference, which trains the discrete-T
DDPM objective only (src/engine.py:263-307).

Contract under test:
  * the time grid (endpoints, monotonicity, the SD3 shift closed form)
    and the training-time draw (support, both densities);
  * the VP<->flow marginal-matching map at its endpoints and against the
    defining identity abar = (1-t)^2 / ((1-t)^2 + t^2);
  * flow_sample_loop converges to the analytic PF-ODE limit on Gaussian
    data — 1st-order signature for Euler, 2nd-order for Heun;
  * make_flow_to_eps_apply_fn is EXACTLY the analytic VP eps-model when
    the velocity is exact (the algebraic identity between the straight
    interpolant and the VP parameterization);
  * the engine end-to-end: flow training learns, native + table-driven
    (eps-view) sampling both work, invalid combos are rejected, CFG
    composes, and mesh sampling is a pure layout change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core import (
    DiffusionTables,
    FlowConfig,
    NoiseSchedule,
    flow_interpolate,
    flow_sample_t,
    flow_time_grid,
    vp_t_to_flow_t,
)
from probabilisticdeepdiffusionmodels_tpu.core.flow import TIME_SCALE
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.parallel.mesh import make_mesh
from probabilisticdeepdiffusionmodels_tpu.sample import (
    flow_sample_loop,
    make_flow_to_eps_apply_fn,
)


# ---------------------------------------------------------------- math


def test_flow_time_grid():
    g = flow_time_grid(10)
    assert g.shape == (11,)
    np.testing.assert_allclose(g[0], 1.0)
    np.testing.assert_allclose(g[-1], 0.0)
    assert np.all(np.diff(g) < 0), "grid must be strictly descending"
    np.testing.assert_allclose(g, np.linspace(1, 0, 11), rtol=1e-12)
    # SD3 shift: t = s*u / (1 + (s-1)*u), fixes endpoints, warps interior
    s = 3.0
    gs = flow_time_grid(10, shift=s)
    np.testing.assert_allclose(gs[0], 1.0)
    np.testing.assert_allclose(gs[-1], 0.0)
    u = np.linspace(1, 0, 11)
    np.testing.assert_allclose(gs, s * u / (1 + (s - 1) * u), rtol=1e-12)
    assert np.all(gs[1:-1] > g[1:-1]), "shift>1 pushes times toward t=1"
    with pytest.raises(ValueError):
        flow_time_grid(0)
    with pytest.raises(ValueError):
        flow_time_grid(5, shift=0.0)


def test_sample_t_densities():
    key = jax.random.PRNGKey(0)
    t_ln = flow_sample_t(key, 4096, FlowConfig())
    assert t_ln.shape == (4096,)
    assert float(t_ln.min()) > 0.0 and float(t_ln.max()) < 1.0
    # sigmoid(N(0,1)) is symmetric around 0.5 and concentrated mid-chain
    assert abs(float(t_ln.mean()) - 0.5) < 0.02
    t_u = flow_sample_t(key, 4096, FlowConfig(t_dist="uniform"))
    assert float(t_u.min()) > 0.0 and float(t_u.max()) < 1.0
    # uniform has more mass in the tails than the logit-normal
    tail = lambda t: float(jnp.mean((t < 0.1) | (t > 0.9)))
    assert tail(t_u) > tail(t_ln)
    with pytest.raises(ValueError, match="t_dist"):
        flow_sample_t(key, 4, FlowConfig(t_dist="nope"))


def test_interpolate_endpoints_and_velocity():
    x0 = jnp.ones((3, 2, 2, 1), jnp.float32) * 0.5
    e = -jnp.ones((3, 2, 2, 1), jnp.float32)
    t = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    x_t, u = flow_interpolate(x0, e, t)
    np.testing.assert_allclose(np.asarray(x_t[0]), 0.5)
    np.testing.assert_allclose(np.asarray(x_t[1]), -0.25)
    np.testing.assert_allclose(np.asarray(x_t[2]), -1.0)
    np.testing.assert_allclose(np.asarray(u), -1.5)


def test_vp_t_to_flow_t_map():
    sched = NoiseSchedule.create(diffusion_steps=50, mode="cosine")
    abar = jnp.asarray(sched.alphas_hat)
    tf = vp_t_to_flow_t(abar)
    assert np.all(np.diff(np.asarray(tf)) > 0), "ascending in VP t"
    # defining identity: abar == (1-t)^2 / ((1-t)^2 + t^2)
    back = (1 - tf) ** 2 / ((1 - tf) ** 2 + tf**2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(abar),
                               rtol=1e-5, atol=1e-7)
    # endpoints: abar -> 1 gives t -> 0, abar -> 0 gives t -> 1
    np.testing.assert_allclose(
        np.asarray(vp_t_to_flow_t(jnp.asarray([1.0, 0.0]))), [0.0, 1.0]
    )


# ------------------------------------------------- analytic ground truth


def _gaussian_flow_raw(c2=1.0):
    """The exact velocity for data ~ N(0, c2 I): with V(t) = (1-t)^2 c2
    + t^2, E[e - x0 | x_t] = (t - (1-t) c2) / V(t) * x_t.  The loop and
    the train step feed the network t * TIME_SCALE."""

    def apply_fn(p, x, t_in, y=None, **kw):
        t = (t_in / TIME_SCALE).reshape((-1,) + (1,) * (x.ndim - 1))
        V = (1 - t) ** 2 * c2 + t**2
        return (t - (1 - t) * c2) / V * x

    return apply_fn


def test_flow_sample_loop_matches_analytic_ode_limit():
    """For data ~ N(0, c2 I) the PF-ODE is linear with closed form
    x(0) = x(1) sqrt(c2 / V(1)) = x(1) sqrt(c2); Euler must converge at
    1st order, Heun at 2nd."""
    c2 = 0.25
    apply_fn = _gaussian_flow_raw(c2)
    z = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 4, 1), jnp.float32)
    exact = z * np.sqrt(c2)

    def err(n, heun):
        out = flow_sample_loop(apply_fn, {}, None, z, None, n_steps=n,
                               heun=heun)
        return float(jnp.sqrt(jnp.mean((out - exact) ** 2)))

    e_euler = [err(n, False) for n in (8, 16, 32)]
    assert e_euler[0] > e_euler[1] > e_euler[2], e_euler
    # 1st order: halving h halves the error (allow slack)
    assert e_euler[0] / e_euler[1] > 1.6, e_euler
    e_heun = [err(n, True) for n in (8, 16, 32)]
    assert e_heun[0] / e_heun[1] > 3.0, e_heun
    assert e_heun[1] / e_heun[2] > 3.0, e_heun
    assert e_heun[2] < e_euler[2], (e_heun, e_euler)
    # the shifted grid solves the same ODE (different discretization)
    shifted = flow_sample_loop(apply_fn, {}, None, z, None, n_steps=32,
                               shift=3.0)
    assert float(jnp.sqrt(jnp.mean((shifted - exact) ** 2))) < 0.1


def test_flow_eps_view_is_the_analytic_eps_model():
    """Algebraic identity: wrapping the exact velocity for N(0, c2 I)
    data in the eps view over VP tables must reproduce the exact VP
    eps-model eps(x,t) = sqrt(1-ab) x / (ab c2 + 1-ab)."""
    c2 = 1.3
    sched = NoiseSchedule.create(diffusion_steps=40, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    eps_view = make_flow_to_eps_apply_fn(_gaussian_flow_raw(c2), tables)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 3), jnp.float32)
    t = jnp.asarray([1, 5, 10, 20, 30, 35, 39, 40], jnp.int32)
    got = eps_view({}, x, t, None)
    abar = np.asarray(sched.alphas_hat)[np.asarray(t) - 1].reshape(
        (-1, 1, 1, 1)
    )
    want = np.sqrt(1.0 - abar) * np.asarray(x) / (abar * c2 + 1.0 - abar)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_flow_loop_clip_and_determinism():
    """The loop is deterministic (no key use) and clip keeps the output
    finite and bounded-consistent on the exact model."""
    apply_fn = _gaussian_flow_raw(1.0)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 1), jnp.float32)
    a = flow_sample_loop(apply_fn, {}, None, z, jax.random.PRNGKey(0),
                         n_steps=8)
    b = flow_sample_loop(apply_fn, {}, None, z, jax.random.PRNGKey(9),
                         n_steps=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = flow_sample_loop(apply_fn, {}, None, z, None, n_steps=8, clip=True)
    assert np.all(np.isfinite(np.asarray(c)))


# ----------------------------------------------------------- the engine


FLOW_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2],
    use_scale_shift_norm=True,
)


def _flow_engine(mesh=None, **kw):
    return DiffusionEngine(
        model_config=dict(FLOW_CFG), optimizer_config={"lr": 2e-3},
        diffusion_steps=10, mode="cosine", resolution=8, ema=0.99,
        seed=0, prediction_type="flow", mesh=mesh, **kw,
    )


def test_engine_flow_rejects_incompatible_knobs():
    with pytest.raises(ValueError, match="learned-sigma"):
        _flow_engine(loss_type="hybrid")
    with pytest.raises(ValueError, match="continuously"):
        _flow_engine(sampling="importance")
    with pytest.raises(ValueError, match="weighting"):
        _flow_engine(loss_weighting="min_snr")
    eng = DiffusionEngine(
        model_config=dict(FLOW_CFG), optimizer_config={"lr": 1e-3},
        diffusion_steps=10, mode="cosine", resolution=8, seed=0,
    )
    with pytest.raises(ValueError, match='prediction_type="flow"'):
        eng.generate_images(n=1, minibatch=1, flow=True)


@pytest.mark.slow
def test_engine_flow_trains_and_samples():
    """Loss decreases on a constant-image dataset; the native sampler
    (Euler, Heun, shifted) and the table-driven eps-view samplers all
    emit finite images; per-call knob validation holds; the hparams
    round-trip carries flow_config."""
    eng = _flow_engine(flow_config=dict(t_dist="uniform", shift=2.0))
    assert eng.flow.t_dist == "uniform" and eng.flow.shift == 2.0
    assert eng.hparams["flow_config"] == dict(t_dist="uniform", shift=2.0)

    x = jnp.full((16, 8, 8, 1), 0.5, jnp.float32)
    losses = [float(eng.training_step(x)["loss"]) for _ in range(30)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    native = eng.generate_images(n=3, minibatch=2, flow=True,
                                 num_sample_steps=6, seed=3)
    assert native.shape == (3, 8, 8, 1)
    assert np.all(np.isfinite(native))
    # engine-level shift=2 is the default grid; per-call override wins
    heun = eng.generate_images(n=2, minibatch=2, flow=True,
                               num_sample_steps=6, flow_heun=True,
                               flow_shift=1.0, seed=3)
    assert np.all(np.isfinite(heun))

    for kw in (dict(ddim=True), dict(dpm_solver=True), dict(heun=True),
               dict()):
        out = eng.generate_images(n=2, minibatch=2, num_sample_steps=5,
                                  seed=1, **kw)
        assert out.shape == (2, 8, 8, 1) and np.all(np.isfinite(out)), kw

    nll = eng.test_step(x[:4])
    assert np.isfinite(nll["test_nll"])

    with pytest.raises(ValueError, match="int num_sample_steps"):
        eng.generate_images(n=1, minibatch=1, flow=True,
                            num_sample_steps="karras5")
    with pytest.raises(ValueError, match="at most one"):
        eng.generate_images(n=1, minibatch=1, flow=True, ddim=True)
    with pytest.raises(ValueError, match="at most one"):
        eng.generate_images(n=1, minibatch=1, flow=True, edm=True)
    with pytest.raises(ValueError, match="encoder_reuse"):
        eng.generate_images(n=1, minibatch=1, flow=True, encoder_reuse=3)


def test_engine_flow_feature_vectors_use_the_flow_frame():
    """get_feature_vectors must route through the flow input transform —
    the raw net is only in-distribution on (x/(a+s), tau*TIME_SCALE);
    feeding raw (x, t) would silently extract out-of-distribution
    features."""
    eng = _flow_engine()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    feats = eng.get_feature_vectors(x, 5)
    assert set(feats) >= {"down", "middle", "up"}
    for leaf in jax.tree.leaves(feats):
        assert np.all(np.isfinite(np.asarray(leaf)))
    raw = eng.model.apply(
        {"params": eng.params()}, x, jnp.full((2,), 5, jnp.int32), None,
        return_features=True,
    )
    assert not np.allclose(
        np.asarray(feats["middle"]), np.asarray(raw["middle"])
    )
    with pytest.raises(ValueError, match=r"t must be in \[1, 10\]"):
        eng.get_feature_vectors(x, 0)
    with pytest.raises(ValueError, match=r"t must be in \[1, 10\]"):
        eng.get_feature_vectors(x, 11)


def test_engine_flow_validation_step_uses_flow_loss():
    eng = _flow_engine()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 1))
    out = eng.validation_step(x)
    assert np.isfinite(out["val_loss"]) and np.isfinite(
        out["val_loss_no_ema"]
    )


@pytest.mark.slow
def test_engine_flow_cfg_composes():
    """CFG on the NATIVE flow sampler: a lerp on the velocity F is a lerp
    on eps and x0 (affine at fixed x, t), so the standard wrapper
    applies; s=1 must equal plain conditional sampling."""
    mc = dict(FLOW_CFG, num_classes=3, cfg_null_class=True)
    eng = DiffusionEngine(
        model_config=mc, optimizer_config={"lr": 1e-3},
        diffusion_steps=10, mode="cosine", resolution=8, seed=0,
        prediction_type="flow", class_dropout_prob=0.2,
    )
    y = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1], jnp.int32)
    x = (y.astype(jnp.float32) - 1.0).reshape(8, 1, 1, 1) * jnp.ones(
        (8, 8, 8, 1), jnp.float32
    ) * 0.5
    for _ in range(30):
        eng.training_step(x, y)

    yy = jnp.asarray([0, 1], jnp.int32)
    plain = eng.generate_images(n=2, minibatch=2, flow=True,
                                num_sample_steps=5, seed=7, y=yy)
    s1 = eng.generate_images(n=2, minibatch=2, flow=True,
                             num_sample_steps=5, seed=7, y=yy,
                             guidance_scale=1.0)
    np.testing.assert_allclose(s1, plain, rtol=1e-5, atol=1e-6)
    s3 = eng.generate_images(n=2, minibatch=2, flow=True,
                             num_sample_steps=5, seed=7, y=yy,
                             guidance_scale=3.0)
    assert np.all(np.isfinite(s3))
    assert float(np.abs(s3 - plain).max()) > 1e-5
    with pytest.raises(ValueError, match="guidance_interval"):
        eng.generate_images(n=2, minibatch=2, flow=True, num_sample_steps=5,
                            y=yy, guidance_scale=3.0,
                            guidance_interval=(2, 8))


@pytest.mark.slow
def test_engine_flow_mesh_sampling_is_layout_only():
    """Native flow sampling under the 8-device data mesh must equal the
    single-device chain."""
    e1 = _flow_engine(None)
    e8 = _flow_engine(make_mesh(8))
    x = jnp.full((8, 8, 8, 1), 0.4, jnp.float32)
    e1.training_step(x)
    e8.training_step(x)
    a = e1.generate_images(n=8, minibatch=8, flow=True, num_sample_steps=5,
                           seed=5)
    b = e8.generate_images(n=8, minibatch=8, flow=True, num_sample_steps=5,
                           seed=5)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_flow_loss_history_buckets_onto_the_vp_grid():
    """The per-t loss ring must keep filling under flow training (the
    quartile logging depends on it): after a few steps at least one
    bucket is populated and every count is finite."""
    eng = _flow_engine()
    x = jnp.full((16, 8, 8, 1), 0.3, jnp.float32)
    for _ in range(5):
        eng.training_step(x)
    hist = eng.state.loss_history
    counts = np.asarray(hist.count)
    assert counts.sum() == 5 * 16, counts
    assert np.all(counts >= 0)
    assert np.all(np.isfinite(np.asarray(hist.ring)))
