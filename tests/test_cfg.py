"""Classifier-free guidance (Ho & Salimans, arXiv:2207.12598).

Beyond-reference capability on top of the reference's class-conditional
embedding (src/modules/unet.py:482-484): a reserved null-class embedding
row (``cfg_null_class``), train-time label dropout
(``engine.class_dropout_prob`` -> train.step), and guided sampling
(``generate_images(guidance_scale=...)`` / sample.make_cfg_apply_fn) on
all three sampler families.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.models import get_model
from probabilisticdeepdiffusionmodels_tpu.sample import make_cfg_apply_fn
from probabilisticdeepdiffusionmodels_tpu.train.step import make_train_step

T = 12
N_CLASSES = 5
# use_scale_shift_norm (FiLM) so conditioning survives at tiny widths: with
# C<=32 GroupNorm32 gets size-1 groups and the vanilla additive emb (a
# spatially-uniform per-channel shift) is EXACTLY cancelled by the next
# norm's per-channel mean subtraction — the model would be y-independent.
MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
    num_classes=N_CLASSES, cfg_null_class=True, use_scale_shift_norm=True,
)


def make_engine(**kw):
    cfg = dict(
        model_config=MODEL_CFG,
        optimizer_config={"lr": 1e-3},
        diffusion_steps=T,
        mode="cosine",  # linear at tiny T has beta>=1 -> NaN tables
        resolution=8,
        ema=0.9,
        seed=0,
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


def batch(b=4):
    return jax.random.normal(jax.random.PRNGKey(7), (b, 8, 8, 1))


def _unzero_params(tree, seed=7):
    """Un-zero the zero-init convs (out_conv + a mid res block) so eps
    depends on the label embedding — at init the whole net is
    y-independent (every residual branch ends in a zeroed conv), which
    would make guided == unguided trivially."""
    tree = jax.device_get(tree)
    for name in ("out_conv", "mid0_0_res"):
        sub = tree[name]
        sub = sub["out_conv"] if "out_conv" in sub else sub
        sub["conv"]["kernel"] = 0.05 * np.asarray(
            jax.random.normal(
                jax.random.PRNGKey(seed), sub["conv"]["kernel"].shape
            )
        )
    return jax.tree.map(jnp.asarray, tree)


def _unzero(eng, seed=7):
    eng.state = eng.state.replace(
        params=_unzero_params(eng.state.params, seed),
        ema_params=(
            _unzero_params(eng.state.ema_params, seed)
            if eng.state.ema_params is not None else None
        ),
    )
    return eng


def test_null_class_row_exists():
    """cfg_null_class=True allocates num_classes+1 embedding rows."""
    model = get_model(8, dict(MODEL_CFG))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)), jnp.ones((1,), jnp.int32),
        y=jnp.zeros((1,), jnp.int32),
    )["params"]
    assert params["label_emb"]["embedding"].shape[0] == N_CLASSES + 1
    # the null row is addressable
    out = model.apply(
        {"params": params}, jnp.zeros((2, 8, 8, 1)),
        jnp.ones((2,), jnp.int32), jnp.asarray([0, N_CLASSES]),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_null_class_requires_num_classes():
    with pytest.raises(ValueError, match="cfg_null_class"):
        get_model(8, dict(MODEL_CFG, num_classes=None))


def test_wrapper_scale_limits():
    """s=1 reproduces the conditional eps; s=0 the null-class eps."""
    model = get_model(8, dict(MODEL_CFG))
    x = batch(3)
    t = jnp.asarray([3, 5, 7], jnp.int32)
    y = jnp.asarray([0, 2, 4], jnp.int32)
    params = _unzero_params(
        model.init(jax.random.PRNGKey(0), x, t, y=y)["params"]
    )

    def apply_fn(p, xx, tt, yy, **kw):
        return model.apply({"params": p}, xx, tt, yy, **kw)

    cond = apply_fn(params, x, t, y)
    null = apply_fn(params, x, t, jnp.full_like(y, N_CLASSES))
    assert np.abs(np.asarray(cond) - np.asarray(null)).max() > 1e-6, (
        "surgery failed: eps must depend on y for this test to bite"
    )
    np.testing.assert_allclose(
        np.asarray(make_cfg_apply_fn(apply_fn, 1.0, N_CLASSES)(params, x, t, y)),
        np.asarray(cond), rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(make_cfg_apply_fn(apply_fn, 0.0, N_CLASSES)(params, x, t, y)),
        np.asarray(null), rtol=0, atol=1e-5,
    )
    # s=3 extrapolates: eps_u + 3(eps_c - eps_u)
    np.testing.assert_allclose(
        np.asarray(make_cfg_apply_fn(apply_fn, 3.0, N_CLASSES)(params, x, t, y)),
        np.asarray(null) + 3.0 * (np.asarray(cond) - np.asarray(null)),
        rtol=0, atol=1e-4,
    )


def test_wrapper_learned_sigma_takes_cond_v():
    """With a 2C-channel head, eps is guided and v comes from the
    conditional half (the IDDPM-guidance convention)."""
    model = get_model(8, dict(MODEL_CFG, learn_sigma=True))
    x = batch(2)
    t = jnp.asarray([3, 5], jnp.int32)
    y = jnp.asarray([1, 2], jnp.int32)
    params = _unzero_params(
        model.init(jax.random.PRNGKey(0), x, t, y=y)["params"]
    )

    def apply_fn(p, xx, tt, yy, **kw):
        return model.apply({"params": p}, xx, tt, yy, **kw)

    out = make_cfg_apply_fn(apply_fn, 2.5, N_CLASSES)(params, x, t, y)
    assert out.shape == (2, 8, 8, 2)
    cond = apply_fn(params, x, t, y)
    _, v_cond = jnp.split(cond, 2, axis=-1)
    _, v_guided = jnp.split(out, 2, axis=-1)
    np.testing.assert_allclose(
        np.asarray(v_guided), np.asarray(v_cond), rtol=0, atol=1e-5
    )


def test_class_dropout_prob_one_equals_all_null():
    """p=1 replaces every label with the null class: the loss equals a
    step run on explicit null labels (t/noise streams are unchanged)."""
    eng_drop = _unzero(make_engine(class_dropout_prob=1.0))
    eng_plain = _unzero(make_engine())
    x = batch()
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    m_drop = eng_drop.training_step(x, y)
    m_null = eng_plain.training_step(x, jnp.full((4,), N_CLASSES, jnp.int32))
    np.testing.assert_allclose(
        float(m_drop["loss"]), float(m_null["loss"]), rtol=1e-6
    )
    # and p=0-equivalent: the plain engine's conditional loss differs
    eng_cond = _unzero(make_engine())
    m_cond = eng_cond.training_step(x, y)
    assert abs(float(m_cond["loss"]) - float(m_drop["loss"])) > 0


def test_class_dropout_masks_expected_fraction():
    """Statistical check on the dropout mask through the public step:
    with p=0.5 over many labels, the null fraction is ~Binomial."""
    from probabilisticdeepdiffusionmodels_tpu.core import (
        DiffusionTables, NoiseSchedule,
    )

    seen = {}

    def spy_apply(params, x_t, t, y, **kw):
        seen["y"] = y
        return jnp.zeros_like(x_t)

    tables = DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )
    step = make_train_step(
        spy_apply, tables, class_dropout_prob=0.5, null_class=N_CLASSES
    )
    from probabilisticdeepdiffusionmodels_tpu.train.state import TrainState
    import optax

    b = 2048
    state = TrainState.create(
        {"w": jnp.zeros((1,))}, optax.sgd(1e-3), T, jax.random.PRNGKey(0)
    )
    x0 = jnp.zeros((b, 4, 4, 1))
    step(state, x0, jnp.zeros((b,), jnp.int32))
    frac = float(jnp.mean((seen["y"] == N_CLASSES).astype(jnp.float32)))
    assert 0.44 < frac < 0.56, frac


def test_class_dropout_requires_null_class():
    from probabilisticdeepdiffusionmodels_tpu.core import (
        DiffusionTables, NoiseSchedule,
    )

    tables = DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    )
    with pytest.raises(ValueError, match="null_class"):
        make_train_step(lambda *a, **k: None, tables, class_dropout_prob=0.1)


def test_engine_validates_class_dropout():
    with pytest.raises(ValueError, match="cfg_null_class"):
        DiffusionEngine(
            model_config=dict(MODEL_CFG, cfg_null_class=False),
            optimizer_config={"lr": 1e-3},
            diffusion_steps=T,
            mode="cosine",
            resolution=8,
            class_dropout_prob=0.1,
        )


def test_engine_guided_sampling_all_loops():
    """guidance_scale through generate_images on ancestral / DDIM / DPM++,
    deterministic per seed, and actually different from unguided."""
    eng = _unzero(make_engine())
    y = jnp.asarray([0, 1, 2], jnp.int32)
    base = eng.generate_images(n=3, minibatch=3, y=y, seed=3)
    for kw in (dict(), dict(ddim=True, num_sample_steps=6),
               dict(dpm_solver=True, num_sample_steps=6),
               dict(heun=True, num_sample_steps=6),
               dict(heun=True, heun_churn=3.0, num_sample_steps=6)):
        guided = eng.generate_images(
            n=3, minibatch=3, y=y, seed=3, guidance_scale=2.0, **kw
        )
        assert guided.shape == (3, 8, 8, 1) and np.isfinite(guided).all()
        again = eng.generate_images(
            n=3, minibatch=3, y=y, seed=3, guidance_scale=2.0, **kw
        )
        np.testing.assert_array_equal(guided, again)
    # ancestral guided vs unguided differ (same seed, same noise stream)
    guided = eng.generate_images(
        n=3, minibatch=3, y=y, seed=3, guidance_scale=2.0
    )
    assert np.abs(guided - base).max() > 0


def test_engine_guided_composes_with_encoder_reuse():
    eng = make_engine()
    y = jnp.asarray([0, 1], jnp.int32)
    out = eng.generate_images(
        n=2, minibatch=2, y=y, seed=1, guidance_scale=1.5, encoder_reuse=3
    )
    assert out.shape == (2, 8, 8, 1) and np.isfinite(out).all()


def test_engine_guidance_validation():
    eng = make_engine()
    with pytest.raises(ValueError, match="labels"):
        eng.generate_images(n=2, minibatch=2, seed=0, guidance_scale=2.0)
    uncond = DiffusionEngine(
        model_config=dict(MODEL_CFG, num_classes=None, cfg_null_class=False),
        optimizer_config={"lr": 1e-3},
        diffusion_steps=T,
        mode="cosine",
        resolution=8,
    )
    with pytest.raises(ValueError, match="class-conditional"):
        uncond.generate_images(n=2, minibatch=2, seed=0, guidance_scale=2.0)


def test_guidance_scale_one_matches_conditional():
    """s=1 sampling equals plain conditional sampling (the wrapper's
    doubled-batch forward is numerically the same per-sample chain)."""
    eng = _unzero(make_engine())
    y = jnp.asarray([0, 1, 4], jnp.int32)
    plain = eng.generate_images(n=3, minibatch=3, y=y, seed=5)
    s1 = eng.generate_images(n=3, minibatch=3, y=y, seed=5, guidance_scale=1.0)
    np.testing.assert_allclose(plain, s1, rtol=0, atol=1e-4)


def test_guidance_interval_limits():
    """interval covering the whole chain == always-guided; an empty window
    == plain conditional sampling (scale becomes irrelevant)."""
    eng = _unzero(make_engine())
    y = jnp.asarray([0, 1, 2], jnp.int32)
    full = eng.generate_images(n=3, minibatch=3, y=y, seed=9,
                               guidance_scale=2.0)
    windowed_all = eng.generate_images(
        n=3, minibatch=3, y=y, seed=9, guidance_scale=2.0,
        guidance_interval=(1, T),
    )
    np.testing.assert_allclose(full, windowed_all, rtol=0, atol=1e-5)
    never = eng.generate_images(
        n=3, minibatch=3, y=y, seed=9, guidance_scale=2.0,
        guidance_interval=(0, 0),
    )
    plain = eng.generate_images(n=3, minibatch=3, y=y, seed=9)
    np.testing.assert_allclose(never, plain, rtol=0, atol=1e-5)


def test_guidance_interval_partial():
    """A mid-chain window is deterministic and sits apart from both the
    always-guided and never-guided chains."""
    eng = _unzero(make_engine())
    y = jnp.asarray([0, 1, 2], jnp.int32)
    mid = eng.generate_images(
        n=3, minibatch=3, y=y, seed=9, guidance_scale=3.0,
        guidance_interval=(T // 3, 2 * T // 3),
    )
    again = eng.generate_images(
        n=3, minibatch=3, y=y, seed=9, guidance_scale=3.0,
        guidance_interval=(T // 3, 2 * T // 3),
    )
    np.testing.assert_array_equal(mid, again)
    full = eng.generate_images(n=3, minibatch=3, y=y, seed=9,
                               guidance_scale=3.0)
    plain = eng.generate_images(n=3, minibatch=3, y=y, seed=9)
    assert np.abs(mid - full).max() > 0
    assert np.abs(mid - plain).max() > 0


def test_guidance_interval_validation():
    eng = make_engine()
    y = jnp.asarray([0, 1], jnp.int32)
    with pytest.raises(ValueError, match="guidance_scale"):
        eng.generate_images(n=2, minibatch=2, y=y, seed=0,
                            guidance_interval=(1, T))
    with pytest.raises(ValueError, match="encoder_reuse"):
        eng.generate_images(n=2, minibatch=2, y=y, seed=0,
                            guidance_scale=2.0, guidance_interval=(1, T),
                            encoder_reuse=3)


def test_guidance_interval_respaced_units():
    """The window is in ORIGINAL timestep units: on a respaced chain an
    interval above the kept timesteps' range guides nothing."""
    eng = _unzero(make_engine())
    y = jnp.asarray([0, 1], jnp.int32)
    # respaced to 6 steps of the T=12 chain; window [T+1, T+5] is empty
    plain = eng.generate_images(n=2, minibatch=2, y=y, seed=4,
                                num_sample_steps=6)
    nothing = eng.generate_images(
        n=2, minibatch=2, y=y, seed=4, num_sample_steps=6,
        guidance_scale=5.0, guidance_interval=(T + 1, T + 5),
    )
    np.testing.assert_allclose(plain, nothing, rtol=0, atol=1e-5)


def test_cfg_composes_with_inpaint():
    """guidance_scale on the inpaint endpoint: known region stays exact,
    the fill reacts to the guidance scale."""
    eng = make_engine(class_dropout_prob=0.2)
    eng.state = eng.state.replace(
        params=_unzero_params(eng.state.params),
        ema_params=_unzero_params(eng.state.ema_params),
    )
    x0 = batch(4)
    mask = jnp.zeros((8, 8, 1)).at[:, :4].set(1.0)
    y = jnp.asarray([0, 1, 2, 3])
    m = np.broadcast_to(np.asarray(mask), x0.shape).astype(bool)
    base = np.asarray(eng.inpaint(x0, mask, seed=3, y=y))
    guided = np.asarray(
        eng.inpaint(x0, mask, seed=3, y=y, guidance_scale=3.0)
    )
    for out in (base, guided):
        np.testing.assert_array_equal(out[m], np.asarray(x0)[m])
        assert np.isfinite(out).all()
    assert not np.array_equal(base, guided)
    with pytest.raises(ValueError, match="labels"):
        eng.inpaint(x0, mask, seed=3, guidance_scale=3.0)
