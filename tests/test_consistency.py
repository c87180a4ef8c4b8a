"""Consistency models (Song et al., arXiv:2303.01469; iCT improvements
arXiv:2310.14189) — beyond-reference few-step family: the
boundary-condition parameterization, the teacher-denoiser abstraction
(exact on the analytic Gaussian-data model for eps/flow/edm teachers),
CD/CT training steps, the 1/few-step sampler against the closed-form
consistency function, and the engine integration
(prediction_type="consistency").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core import (
    DiffusionTables,
    NoiseSchedule,
)
from probabilisticdeepdiffusionmodels_tpu.core.consistency import (
    ConsistencyConfig,
    cm_apply,
    cm_metric,
    cm_precond,
    pair_weight,
)
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.sample.sampler import (
    consistency_sample_loop,
)
from probabilisticdeepdiffusionmodels_tpu.train.consistency import (
    make_cd_step,
    make_teacher_denoiser,
)

T = 20
S_DATA = 0.7  # analytic Gaussian data std used throughout


@pytest.fixture(scope="module")
def tables():
    return DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )


# ---------------------------------------------------------- pure math


def test_boundary_condition_exact():
    """c_skip(sigma_min) == 1 and c_out(sigma_min) == 0 EXACTLY, so
    f(x, sigma_min) == x for ANY network output (app. C)."""
    cfg = ConsistencyConfig()
    c_skip, c_out, _, _ = cm_precond(
        jnp.asarray([cfg.sigma_min]), cfg.sigma_data, cfg.sigma_min
    )
    assert float(c_skip[0]) == 1.0
    assert float(c_out[0]) == 0.0

    # any apply_fn — even one returning garbage — is erased at sigma_min
    def junk(params, x_in, t, y):
        return jnp.full_like(x_in, 1e6)

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 1))
    sig = jnp.full((3,), cfg.sigma_min, jnp.float32)
    out = cm_apply(junk, None, x, sig, None, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)


def test_precond_matches_edm_at_large_sigma():
    """Away from sigma_min the coefficients converge to EDM's eq. 7
    (cm_precond is EDM with the (sigma - sigma_min) boundary shift)."""
    from probabilisticdeepdiffusionmodels_tpu.core.edm import precond

    sig = jnp.asarray([1.0, 10.0, 80.0])
    a = cm_precond(sig, 0.5, 0.002)
    b = precond(sig, 0.5)
    for i in (2, 3):  # c_in, c_noise identical by construction
        np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b[i]),
                                   rtol=0, atol=0)
    for i in (0, 1):  # c_skip, c_out equal up to the sigma_min shift
        np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b[i]),
                                   rtol=5e-3)


def test_metric_limits():
    """pseudo-Huber -> ||d||^2/(2c) for small residuals and -> ||d|| - c
    for large ones; l2 is the plain pixel-mean square."""
    key = jax.random.PRNGKey(1)
    a = jax.random.normal(key, (2, 8, 8, 1))
    # residual small vs c, but large enough that sqrt(n2 + c^2) - c stays
    # representable in f32 (1e-6 would cancel to exactly 0)
    small = a + 1e-3
    big = a + 100.0
    c = 0.1
    d_small = cm_metric(a, small, "pseudo_huber", c)
    n2 = np.sum((np.asarray(a) - np.asarray(small)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(d_small), n2 / (2 * c), rtol=5e-3)
    d_big = cm_metric(a, big, "pseudo_huber", c)
    nrm = np.sqrt(np.sum((np.asarray(a) - np.asarray(big)) ** 2,
                         axis=(1, 2, 3)))
    np.testing.assert_allclose(np.asarray(d_big), nrm - c, rtol=1e-4)
    d_l2 = cm_metric(a, big, "l2", c)
    np.testing.assert_allclose(
        np.asarray(d_l2),
        np.mean((np.asarray(a) - np.asarray(big)) ** 2, axis=(1, 2, 3)),
        rtol=1e-6,
    )


def test_config_validation():
    with pytest.raises(ValueError):
        ConsistencyConfig(sigma_min=0.0).validate()
    with pytest.raises(ValueError):
        ConsistencyConfig(sigma_min=2.0, sigma_max=1.0).validate()
    with pytest.raises(ValueError):
        ConsistencyConfig(grid_size=1).validate()
    with pytest.raises(ValueError):
        ConsistencyConfig(metric="l1").validate()
    with pytest.raises(ValueError):
        ConsistencyConfig(weighting="snr").validate()
    assert ConsistencyConfig().validate() is not None
    w = pair_weight(jnp.asarray([2.0]), jnp.asarray([1.0]), "ict")
    assert float(w[0]) == 1.0
    w = pair_weight(jnp.asarray([2.0]), jnp.asarray([1.0]), "none")
    assert float(w[0]) == 1.0


# -------------------------------------- teacher denoisers (analytic)
# For x0 ~ N(0, s^2 I) the exact VE denoiser is D(x, sigma) =
# s^2/(s^2 + sigma^2) x; each fake teacher below implements the SAME
# analytic model in its own parameterization, so make_teacher_denoiser
# must reproduce that closed form.


class _FakeTeacher:
    def __init__(self, prediction_type, tables, apply_raw=None,
                 apply_view=None, edm=None):
        self.prediction_type = prediction_type
        self.tables = tables
        self._apply_raw = apply_raw
        self._apply = apply_view if apply_view is not None else apply_raw
        self.edm = edm


def _exact_D(x, sigma):
    s2 = S_DATA**2
    b = (-1,) + (1,) * (x.ndim - 1)
    return s2 / (s2 + jnp.square(sigma.reshape(b))) * x


def test_denoiser_flow_teacher_exact(tables):
    """Flow teacher: the analytic Gaussian-data velocity
    u(x, t) = (t - (1-t) s^2) x / ((1-t)^2 s^2 + t^2) must map through
    make_teacher_denoiser to the exact VE denoiser at ANY sigma."""
    from probabilisticdeepdiffusionmodels_tpu.core.flow import TIME_SCALE

    s2 = S_DATA**2

    def flow_raw(params, x, t_scaled, y):
        t = (t_scaled / TIME_SCALE).reshape((-1,) + (1,) * (x.ndim - 1))
        return (t - (1 - t) * s2) * x / ((1 - t) ** 2 * s2 + t**2)

    den = make_teacher_denoiser(
        _FakeTeacher("flow", tables, apply_raw=flow_raw)
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 6, 1))
    for sig in (0.05, 0.7, 3.0, 40.0):
        sigma = jnp.full((4,), sig, jnp.float32)
        got = den(None, x, sigma, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_exact_D(x, sigma)),
            rtol=2e-5, atol=2e-6,
        )


def test_denoiser_edm_teacher_exact(tables):
    """EDM teacher: inverting the preconditioning on the analytic
    denoiser gives the raw F; make_teacher_denoiser must reassemble the
    exact D at any sigma."""
    from probabilisticdeepdiffusionmodels_tpu.core.edm import (
        EDMConfig, precond,
    )

    sd = 0.5

    def edm_raw(params, x_in, c_noise, y):
        sigma = jnp.exp(4.0 * c_noise)
        c_skip, c_out, c_in, _ = precond(sigma, sd)
        b = (-1,) + (1,) * (x_in.ndim - 1)
        x = x_in / c_in.reshape(b)
        return (_exact_D(x, sigma) - c_skip.reshape(b) * x) / c_out.reshape(b)

    den = make_teacher_denoiser(
        _FakeTeacher("edm", tables, apply_raw=edm_raw,
                     edm=EDMConfig(sigma_data=sd))
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 6, 6, 1))
    for sig in (0.05, 0.7, 3.0, 40.0):
        sigma = jnp.full((4,), sig, jnp.float32)
        got = den(None, x, sigma, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_exact_D(x, sigma)),
            rtol=2e-5, atol=2e-6,
        )


def test_denoiser_table_teacher_exact_on_grid(tables):
    """Table (eps-view) teacher: exact when sigma sits ON the teacher's
    own table (the nearest-timestep retrofit has no rounding there)."""
    s2 = S_DATA**2
    abar = np.asarray(tables.alphas_hat)

    def eps_view(params, x_vp, t, y):
        a = jnp.asarray(abar)[t - 1].reshape((-1,) + (1,) * (x_vp.ndim - 1))
        return jnp.sqrt(1 - a) * x_vp / (a * s2 + (1 - a))

    den = make_teacher_denoiser(
        _FakeTeacher("epsilon", tables, apply_view=eps_view)
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 6, 6, 1))
    sig_tab = np.sqrt((1 - abar) / abar)
    for k in (0, T // 2, T - 1):
        sigma = jnp.full((4,), float(sig_tab[k]), jnp.float32)
        got = den(None, x, sigma, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_exact_D(x, sigma)),
            rtol=3e-5, atol=3e-6,
        )


def test_anneal_tables_levels():
    """iCT N-annealing (§3.4): doubling levels grid_init..grid_size, each
    row a valid padded pair table; the level advances with the step and
    clamps at the last level."""
    from probabilisticdeepdiffusionmodels_tpu.train.consistency import (
        _anneal_tables, _pair_draw_annealed,
    )

    cfg = ConsistencyConfig(grid_init=4, grid_size=16, anneal_steps=300)
    hi, lo, n_pairs, steps_per = _anneal_tables(cfg)
    assert list(np.asarray(n_pairs)) == [3, 7, 15]  # N = 4, 8, 16
    assert hi.shape == (3, 15) and lo.shape == (3, 15)
    # K=3 levels = 2 transitions: the FULL grid activates at ~anneal_steps
    assert steps_per == 150
    # every row: hi > lo everywhere (padding repeats the last real pair)
    assert bool(jnp.all(hi > lo))
    # endpoints of each level's REAL grid
    for k, n in enumerate((4, 8, 16)):
        assert float(hi[k, 0]) == pytest.approx(cfg.sigma_max, rel=1e-6)
        assert float(lo[k, n - 2]) == pytest.approx(cfg.sigma_min, rel=1e-6)
    key = jax.random.PRNGKey(0)
    # step 0 -> level 0 (N=4); step 10_000 -> clamped to the last level
    _, _, n0 = _pair_draw_annealed(cfg, (hi, lo, n_pairs, steps_per),
                                   key, 256, jnp.asarray(0))
    _, _, n_last = _pair_draw_annealed(cfg, (hi, lo, n_pairs, steps_per),
                                       key, 256, jnp.asarray(10_000))
    assert int(n0) == 4 and int(n_last) == 16
    # drawn indices never reach the padding at level 0
    h0, l0, _ = _pair_draw_annealed(cfg, (hi, lo, n_pairs, steps_per),
                                    key, 4096, jnp.asarray(0))
    real = set(np.round(np.asarray(hi[0, :3]), 6))
    assert set(np.round(np.asarray(h0), 6)) <= real

    # annealing is a CT mechanism — CD rejects the knob loudly instead
    # of silently training on the fixed grid
    from probabilisticdeepdiffusionmodels_tpu.train.consistency import (
        make_cd_step,
    )
    with pytest.raises(ValueError, match="TRAINING only"):
        make_cd_step(
            lambda *a, **k: None, lambda *a, **k: None,
            ConsistencyConfig(grid_init=4, grid_size=8, anneal_steps=10),
            None,
        )

    with pytest.raises(ValueError, match="grid_init"):
        ConsistencyConfig(grid_init=1, anneal_steps=10).validate()
    with pytest.raises(ValueError, match="anneal_steps"):
        ConsistencyConfig(grid_init=4).validate()
    with pytest.raises(ValueError, match="target"):
        ConsistencyConfig(target="frozen").validate()


def test_engine_ct_anneal_and_ema_target():
    """Engine-level CT with N-annealing reports grid_n doubling with the
    step, and target="ema" trains (vs a clear error without EMA)."""
    eng = make_engine(consistency_config=dict(
        grid_init=4, grid_size=8, anneal_steps=4, target="ema",
    ))
    x = 0.5 * np.random.RandomState(3).randn(4, 8, 8, 1).astype("float32")
    ns = [int(eng.training_step(x)["grid_n"]) for _ in range(5)]
    assert ns[0] == 4 and ns[-1] == 8 and sorted(ns) == ns
    assert np.isfinite(float(eng.validation_step(
        x, rng=jax.random.PRNGKey(0))["val_loss"]))

    no_ema = make_engine(ema=None, consistency_config=dict(
        grid_size=8, target="ema",
    ))
    with pytest.raises(ValueError, match="EMA"):
        no_ema.training_step(x)


def test_nearest_t_lookup_not_ceiling(tables):
    """_nearest_t_by_sigma rounds to the CLOSER table timestep: a sigma
    epsilon above the t=k table sigma must stay at t=k, not jump to k+1
    (a plain searchsorted ceiling would bias every off-grid sigma one
    step high)."""
    from probabilisticdeepdiffusionmodels_tpu.train.consistency import (
        _nearest_t_by_sigma, _sigma_table,
    )

    sig_tab = np.asarray(_sigma_table(tables))
    k = T // 2  # 1-indexed t = k+1 has table sigma sig_tab[k]
    just_above = jnp.asarray([float(sig_tab[k]) * 1.0001])
    assert int(_nearest_t_by_sigma(tables, just_above)[0]) == k + 1
    # geometric midpoint sends the upper half to the next timestep
    upper = jnp.asarray(
        [float(np.exp(0.9 * np.log(sig_tab[k + 1])
                      + 0.1 * np.log(sig_tab[k])))]
    )
    assert int(_nearest_t_by_sigma(tables, upper)[0]) == k + 2
    # out-of-range sigmas clamp to the table ends
    assert int(_nearest_t_by_sigma(
        tables, jnp.asarray([float(sig_tab[0]) / 10])
    )[0]) == 1
    assert int(_nearest_t_by_sigma(
        tables, jnp.asarray([float(sig_tab[-1]) * 10])
    )[0]) == T


# ------------------------------------------------- sampler (analytic)


def _exact_consistency_apply(cfg):
    """The raw network whose cm_apply equals the TRUE consistency
    function of the Gaussian-data PF-ODE,
    f*(x, sigma) = sqrt((s^2 + sigma_min^2)/(s^2 + sigma^2)) x
    (the VE solution map x(sigma) ~ sqrt(s^2 + sigma^2))."""
    s2 = S_DATA**2

    def raw(params, x_in, c_noise, y):
        sigma = jnp.exp(4.0 * c_noise)
        c_skip, c_out, c_in, _ = cm_precond(
            sigma, cfg.sigma_data, cfg.sigma_min
        )
        b = (-1,) + (1,) * (x_in.ndim - 1)
        x = x_in / c_in.reshape(b)
        f_star = jnp.sqrt(
            (s2 + cfg.sigma_min**2) / (s2 + jnp.square(sigma))
        ).reshape(b) * x
        return (f_star - c_skip.reshape(b) * x) / c_out.reshape(b)

    return raw


def test_one_step_sampler_matches_closed_form(tables):
    """1-step consistency sampling with the exact consistency function:
    the output is f*(sigma_max z) in closed form, std ~= s (the data
    std) — the whole point of the 1-step map."""
    cfg = ConsistencyConfig(sigma_max=20.0)
    raw = _exact_consistency_apply(cfg)
    z = jax.random.normal(jax.random.PRNGKey(5), (512, 4, 4, 1))
    out = consistency_sample_loop(
        raw, None, tables, z, None, n_steps=1,
        sigma_data=cfg.sigma_data, sigma_min=cfg.sigma_min,
        sigma_max=cfg.sigma_max, rho=cfg.rho,
    )
    s2 = S_DATA**2
    scale = np.sqrt(
        (s2 + cfg.sigma_min**2) / (s2 + cfg.sigma_max**2)
    ) * cfg.sigma_max
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(z) * scale, rtol=1e-5, atol=1e-6
    )
    assert abs(float(np.std(out)) - S_DATA) < 0.05


def test_multistep_sampler_preserves_marginal(tables):
    """Multistep consistency sampling (re-noise + denoise) with the
    exact f*: every step maps back onto the data marginal, so the final
    std stays ~= s and differs sample-wise from the 1-step output."""
    cfg = ConsistencyConfig(sigma_max=20.0)
    raw = _exact_consistency_apply(cfg)
    z = jax.random.normal(jax.random.PRNGKey(6), (512, 4, 4, 1))
    one = consistency_sample_loop(
        raw, None, tables, z, None, n_steps=1,
        sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max,
    )
    multi = consistency_sample_loop(
        raw, None, tables, z, jax.random.PRNGKey(7), n_steps=4,
        sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max,
    )
    assert abs(float(np.std(multi)) - S_DATA) < 0.05
    # the re-noise levels are grid-INTERIOR (neither endpoint): each extra
    # step does real work, so the samples differ materially from 1-step
    assert float(np.mean(np.abs(np.asarray(one) - np.asarray(multi)))) > 0.05


def test_multistep_needs_key(tables):
    cfg = ConsistencyConfig()
    raw = _exact_consistency_apply(cfg)
    z = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 4, 1))
    with pytest.raises(ValueError, match="PRNG key"):
        consistency_sample_loop(raw, None, tables, z, None, n_steps=2)


# ------------------------------------------------------ CD step math


def test_cd_step_learns_from_exact_teacher(tables):
    """A tiny dense student distilled against the EXACT Gaussian
    denoiser: the CD loss drops and the student's 1-step samples move
    toward the data std (fixed-probe learning evidence)."""
    from probabilisticdeepdiffusionmodels_tpu.models.dense import DenseModel

    cfg = ConsistencyConfig(grid_size=8, sigma_max=20.0, metric="l2",
                            weighting="none")
    model = DenseModel(resolution=4, in_channels=1, num_hidden=(32,))
    key = jax.random.PRNGKey(9)
    params = model.init(
        key, jnp.zeros((1, 4, 4, 1)), jnp.zeros((1,), jnp.float32), None
    )["params"]

    def raw(p, x, t, y):
        return model.apply({"params": p}, x, t, y)

    def den(teacher_params, x, sigma, y):
        return _exact_D(x, sigma)

    import optax
    from probabilisticdeepdiffusionmodels_tpu.train.state import TrainState

    state = TrainState.create(
        params=params, tx=optax.adam(3e-3), diffusion_steps=T, rng=key,
    )
    step = jax.jit(make_cd_step(raw, den, cfg, tables))
    x0 = S_DATA * jax.random.normal(jax.random.PRNGKey(10), (64, 4, 4, 1))
    loss_before = float(step(state, None, x0)[1]["loss"])
    for i in range(100):
        state, m = step(state, None, x0)
    # re-evaluate on the SAME rng stream (step=0 -> identical sigma
    # pairs + noise) so the comparison is deterministic, not a race
    # against the per-step sigma lottery
    loss_after = float(
        step(state.replace(step=jnp.zeros((), jnp.int32)), None, x0)[1]["loss"]
    )
    assert np.isfinite(loss_before) and np.isfinite(loss_after)
    assert loss_after < 0.5 * loss_before, (loss_before, loss_after)


# ------------------------------------------------- engine integration

# use_scale_shift_norm: at C<=32 GroupNorm32 has size-1 groups and the
# ADDITIVE time/sigma conditioning is exactly erased by per-channel mean
# subtraction (CLAUDE.md gotcha) — FiLM keeps the c_noise path live so
# these tests exercise a sigma-aware network
MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
    use_scale_shift_norm=True,
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
        in_channels=1,
        prediction_type="consistency",
        consistency_config=dict(grid_size=8),
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


@pytest.fixture(scope="module")
def engine():
    return make_engine()


def test_engine_ct_trains(engine):
    x = 0.5 * np.random.RandomState(0).randn(8, 8, 8, 1).astype("float32")
    losses = [float(engine.training_step(x)["loss"]) for _ in range(3)]
    assert np.isfinite(losses).all()
    out = engine.validation_step(x, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(out["val_loss"]))


def test_engine_consistency_sampling(engine):
    s1 = engine.generate_images(n=4, minibatch=4, seed=0, consistency=True)
    s1b = engine.generate_images(n=4, minibatch=4, seed=0, consistency=True)
    s4 = engine.generate_images(
        n=4, minibatch=4, seed=0, consistency=True, num_sample_steps=4
    )
    assert s1.shape == (4, 8, 8, 1) and s4.shape == (4, 8, 8, 1)
    np.testing.assert_array_equal(s1, s1b)  # deterministic per seed
    assert np.isfinite(s1).all() and np.isfinite(s4).all()
    assert float(np.mean(np.abs(s1 - s4))) > 1e-3


def test_engine_rejects_eps_view_consumers(engine):
    x = np.zeros((2, 8, 8, 1), "float32")
    with pytest.raises(ValueError, match="endpoint"):
        engine.calculate_likelihood(x)
    with pytest.raises(ValueError, match="endpoint"):
        engine.generate_images(n=2, minibatch=2, ddim=True)


def test_engine_rejects_wrong_native_flag(engine):
    with pytest.raises(ValueError, match="prediction_type"):
        engine.generate_images(n=2, minibatch=2, edm=True)
    eps_engine = make_engine(
        prediction_type="epsilon", consistency_config=None
    )
    with pytest.raises(ValueError, match="prediction_type"):
        eps_engine.generate_images(n=2, minibatch=2, consistency=True)


def test_engine_constraint_validation():
    with pytest.raises(ValueError, match="importance"):
        make_engine(sampling="importance")
    with pytest.raises(ValueError, match="weighting"):
        make_engine(loss_weighting="min_snr")
    with pytest.raises(ValueError, match="learned-sigma"):
        make_engine(loss_type="hybrid")


def test_consistency_student_warm_start(tables):
    """consistency_student copies the teacher weights, inherits an EDM
    teacher's sigma frame, and rejects hybrid teachers."""
    from probabilisticdeepdiffusionmodels_tpu.train.consistency import (
        consistency_student,
    )

    teacher = make_engine(
        prediction_type="edm", consistency_config=None,
        edm_config=dict(sigma_data=0.42, sigma_max=30.0),
    )
    teacher.training_step(
        0.5 * np.random.RandomState(1).randn(4, 8, 8, 1).astype("float32")
    )
    student = consistency_student(teacher)
    assert student.prediction_type == "consistency"
    assert student.cm.sigma_data == pytest.approx(0.42)
    assert student.cm.sigma_max == pytest.approx(30.0)
    src = teacher.params(use_ema=True)
    got = student.state.params
    a = jax.tree_util.tree_leaves(src)[0]
    b = jax.tree_util.tree_leaves(got)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    hybrid_teacher = make_engine(
        prediction_type="epsilon", consistency_config=None,
        loss_type="hybrid",
        model_config={**MODEL_CFG, "learn_sigma": True},
    )
    with pytest.raises(NotImplementedError, match="hybrid"):
        consistency_student(hybrid_teacher)


def test_cd_round_e2e(tables):
    """consistency_distill_round on a real (tiny) teacher: runs, loss
    finite, student state advances; zero batches rejected."""
    from probabilisticdeepdiffusionmodels_tpu.train.consistency import (
        consistency_distill_round, consistency_student,
    )

    teacher = make_engine(prediction_type="epsilon", consistency_config=None)
    student = consistency_student(teacher)
    x = 0.5 * np.random.RandomState(2).randn(4, 8, 8, 1).astype("float32")
    out = consistency_distill_round(
        student, teacher, [x, x], log_every=0
    )
    assert np.isfinite(out["loss"])
    assert int(student.state.step) == 2
    with pytest.raises(ValueError, match="zero batches"):
        consistency_distill_round(student, teacher, [], log_every=0)
