"""Zero-terminal-SNR schedule rescale + trailing spacing + CFG-rescale
(Lin et al., arXiv:2305.08891) — beyond-reference schedule/sampler fixes.

The rescale (Algorithm 1) shifts-and-scales sqrt(alpha-bar) so the
forward process actually reaches pure noise at t=T; trailing spacing
keeps the t=T step in strided chains; CFG-rescale (§3.4) std-matches the
guided x0 view to counter washed-out high-guidance samples.
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
from probabilisticdeepdiffusionmodels_tpu.core.schedules import (
    linear_betas,
    rescale_zero_terminal_snr,
)
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.sample.sampler import (
    make_cfg_apply_fn,
    space_timesteps,
)


# ---------------- rescale math ----------------


def test_rescale_linear1000_properties():
    betas = linear_betas(1000)
    rb = rescale_zero_terminal_snr(betas)
    assert rb.dtype == np.float32 and rb.shape == betas.shape
    abar_old = np.cumprod(1.0 - betas.astype(np.float64))
    abar = np.cumprod(1.0 - rb.astype(np.float64))
    # first alpha-bar preserved (Algorithm 1 keeps s[0])
    np.testing.assert_allclose(abar[0], abar_old[0], rtol=1e-5)
    # terminal SNR numerically zero: 8+ orders below the unrescaled ramp
    snr_T = abar[-1] / (1.0 - abar[-1])
    snr_T_old = abar_old[-1] / (1.0 - abar_old[-1])
    assert snr_T < 1e-10 < snr_T_old
    # still a valid, strictly tightening schedule
    assert np.all(rb > 0) and np.all(rb < 1)
    assert np.all(np.diff(abar) < 0)


def test_rescale_matches_paper_algorithm_interior():
    """Interior entries follow the paper's shift-and-scale exactly; only
    the terminal entry carries the documented finite floor."""
    betas = linear_betas(100, 1e-4, 0.02)
    rb = rescale_zero_terminal_snr(betas, alpha_floor=1e-4)
    abar = np.cumprod(1.0 - rb.astype(np.float64))
    s_old = np.sqrt(np.cumprod(1.0 - betas.astype(np.float64)))
    s_ref = (s_old - s_old[-1]) * s_old[0] / (s_old[0] - s_old[-1])
    # rtol is loose in the tail: the returned betas are f32, and near t=T
    # alpha-bar is recovered through 1-beta with beta close to 1, so each
    # f32 beta rounding contributes up to ~6e-8/(1-beta) relative error
    np.testing.assert_allclose(abar[:-1], (s_ref**2)[:-1], rtol=1e-3)
    np.testing.assert_allclose(abar[-1], abar[-2] * 1e-4, rtol=1e-3)


def test_rescaled_tables_all_finite():
    sched = NoiseSchedule.create(
        diffusion_steps=1000,
        betas=rescale_zero_terminal_snr(linear_betas(1000)),
    )
    for name, arr in sched.as_dict().items():
        if isinstance(arr, np.ndarray):
            assert np.isfinite(arr).all(), name


def test_rescale_rejects_bad_input():
    with pytest.raises(ValueError):
        rescale_zero_terminal_snr(np.asarray([0.1], np.float32))


# ---------------- trailing spacing ----------------


def test_trailing_spacing_divisible():
    assert space_timesteps(100, "trailing10") == [
        10, 20, 30, 40, 50, 60, 70, 80, 90, 100
    ]


def test_trailing_spacing_always_includes_T():
    for T, n in [(1000, 7), (1000, 50), (12, 4), (37, 5)]:
        kept = space_timesteps(T, f"trailing{n}")
        assert kept[-1] == T
        assert kept[0] >= 1 and kept == sorted(set(kept))
        assert len(kept) <= n
    # the leading (ddim/linspace) spacings drop t=T — that is the flaw
    # trailing fixes (paper Table 2)
    assert space_timesteps(1000, "ddim50")[-1] != 1000


def test_trailing_spacing_validation():
    with pytest.raises(ValueError):
        space_timesteps(100, "trailing0")
    with pytest.raises(ValueError):
        space_timesteps(100, "trailing101")


def test_respaced_ztsnr_tables_finite():
    """Respacing a zero_terminal_snr table: the kept-step alpha-bar ratio
    at t=T is below f32 epsilon, so without the beta cap the rebuilt
    table's terminal alpha-bar collapses to exactly 0 (inf inverse
    buffers) — regression for the trailing-spacing + ztsnr pairing."""
    from probabilisticdeepdiffusionmodels_tpu.sample.sampler import (
        respaced_schedule,
    )

    sched = NoiseSchedule.create(
        diffusion_steps=1000,
        betas=rescale_zero_terminal_snr(linear_betas(1000)),
    )
    kept = space_timesteps(1000, "trailing8")
    new, tmap = respaced_schedule(sched, kept)
    for name, arr in new.as_dict().items():
        if isinstance(arr, np.ndarray):
            assert np.isfinite(arr).all(), name
    assert new.alphas_hat[-1] > 0
    assert tmap[-1] == 1000


# ---------------- engine integration ----------------

MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
    use_scale_shift_norm=True,
)

T = 12


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
        zero_terminal_snr=True,
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


def test_engine_ztsnr_requires_v_or_x0():
    for bad in ("epsilon", "edm", "flow", "consistency"):
        with pytest.raises(ValueError, match="zero_terminal_snr"):
            make_engine(prediction_type=bad)


def test_engine_ztsnr_v_trains_and_samples():
    eng = make_engine()
    # the terminal alpha-bar sits at the documented floor (1e-4 of its
    # predecessor — "numerically zero" scales with T) and round-trips
    # hparams
    ah = eng.schedule.alphas_hat
    assert ah[-1] <= 1.01e-4 * ah[-2]
    assert eng.hparams["zero_terminal_snr"] is True
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    losses = [float(eng.training_step(x)["loss"]) for _ in range(6)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # ancestral, DDIM-trailing (the paper's pairing) and DPM++ all finite
    imgs = eng.generate_images(n=2, minibatch=2, seed=1)
    assert np.isfinite(imgs).all()
    ddim = eng.generate_images(
        n=2, minibatch=2, seed=1, ddim=True, num_sample_steps="trailing4"
    )
    assert np.isfinite(ddim).all()
    dpm = eng.generate_images(
        n=2, minibatch=2, seed=1, dpm_solver=True,
        num_sample_steps="trailing4",
    )
    assert np.isfinite(dpm).all()
    nll = eng.calculate_likelihood(x, seed=0)
    assert np.isfinite(np.asarray(nll["nll"])).all()
    # the whole point: L_T (prior KL at t=T) is ~0 under ztsnr
    assert float(np.mean(np.asarray(nll["L_T"]))) < 1e-4


def test_engine_ztsnr_x0_trains():
    eng = make_engine(prediction_type="x0")
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    assert np.isfinite(float(eng.training_step(x)["loss"]))
    imgs = eng.generate_images(n=2, minibatch=2, seed=1)
    assert np.isfinite(imgs).all()


# ---------------- CFG rescale ----------------


@pytest.fixture(scope="module")
def tables():
    return DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )


NULL = 9


def fake_apply(params, x, t, y, **kw):
    """Deterministic eps model whose output depends on the label half."""
    cond = (y != NULL).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(x) * (0.1 + 0.4 * cond) + 0.2 * cond


def test_guidance_rescale_matches_numpy_restatement(tables):
    s, phi = 4.0, 0.7
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 8, 8, 1))
    t = jnp.asarray([2, 7, 12], jnp.int32)
    y = jnp.asarray([0, 1, 2], jnp.int32)
    got = make_cfg_apply_fn(
        fake_apply, s, NULL, guidance_rescale=phi, tables=tables
    )({}, x, t, y)

    eps_c = np.asarray(fake_apply({}, x, t, y))
    eps_u = np.asarray(fake_apply({}, x, t, jnp.full_like(y, NULL)))
    eps_cfg = eps_u + s * (eps_c - eps_u)
    r = np.asarray(D.expand_to(tables.sqrt_recip_alphas_hat, t, x.ndim))
    rm = np.asarray(D.expand_to(tables.sqrt_recipm1_alphas_hat, t, x.ndim))
    xn = np.asarray(x)
    x0_cfg = r * xn - rm * eps_cfg
    x0_c = r * xn - rm * eps_c
    ax = (1, 2, 3)
    std_cfg = x0_cfg.std(axis=ax, keepdims=True)
    std_c = x0_c.std(axis=ax, keepdims=True)
    x0_fix = x0_cfg * (std_c / (std_cfg + 1e-8))
    x0_out = phi * x0_fix + (1 - phi) * x0_cfg
    a = np.asarray(D.expand_to(tables.alphas_hat_sqrt, t, x.ndim))
    sm = np.asarray(D.expand_to(tables.one_min_alphas_hat_sqrt, t, x.ndim))
    want = (xn - a * x0_out) / sm
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-5)
    # and it genuinely moved the prediction vs plain CFG
    assert np.abs(np.asarray(got) - eps_cfg).max() > 1e-4


def test_guidance_rescale_zero_is_plain_cfg(tables):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 1))
    t = jnp.asarray([3, 9], jnp.int32)
    y = jnp.asarray([0, 1], jnp.int32)
    plain = make_cfg_apply_fn(fake_apply, 3.0, NULL)({}, x, t, y)
    zero = make_cfg_apply_fn(
        fake_apply, 3.0, NULL, guidance_rescale=0.0, tables=tables
    )({}, x, t, y)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(zero))


def test_guidance_rescale_validation(tables):
    with pytest.raises(ValueError, match="guidance_rescale"):
        make_cfg_apply_fn(fake_apply, 2.0, NULL, guidance_rescale=1.5,
                          tables=tables)
    with pytest.raises(ValueError, match="tables"):
        make_cfg_apply_fn(fake_apply, 2.0, NULL, guidance_rescale=0.7)
    eng = make_engine()
    with pytest.raises(ValueError, match="guidance_rescale"):
        eng.generate_images(n=1, minibatch=1, guidance_rescale=0.7)
