"""Training-step tests: loss semantics, EMA, device-side loss history,
importance sampler warmup/statistics, and an end-to-end overfit smoke."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from probabilisticdeepdiffusionmodels_tpu.core import DiffusionTables, NoiseSchedule
from probabilisticdeepdiffusionmodels_tpu.train import (
    LossHistory,
    TrainState,
    ema_update,
    make_eval_step,
    make_train_step,
    sample_importance,
    sample_uniform,
)

T = 20


def make_setup(sampling="uniform", **kw):
    sched = NoiseSchedule.create(diffusion_steps=T, mode="linear")
    tables = DiffusionTables.from_schedule(sched)

    def apply_fn(params, x, t, y=None, **kwargs):
        # linear model: eps_hat = w * x + b
        return params["w"] * x + params["b"]

    params = {"w": jnp.float32(0.5), "b": jnp.float32(0.1)}
    tx = optax.adam(1e-2)
    state = TrainState.create(
        params, tx, T, jax.random.PRNGKey(0), ema_decay=kw.pop("ema_decay", 0.99)
    )
    step = make_train_step(apply_fn, tables, sampling=sampling, **kw)
    return apply_fn, tables, state, jax.jit(step)


def test_loss_decreases_and_ema_tracks():
    apply_fn, tables, state, step = make_setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 1))
    losses = []
    for _ in range(30):
        state, metrics = step(state, x)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30
    # EMA lags params but moves toward them
    assert float(state.ema_params["w"]) != float(state.params["w"])
    assert abs(float(state.ema_params["w"]) - 0.5) < abs(0.5 - float(state.params["w"])) + 1e-6


def test_ema_update_matches_reference_formula():
    """e <- d*e + (1-d)*m (reference src/modules/ema.py:30-33)."""
    e = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    m = {"a": jnp.asarray([2.0, 0.0]), "b": jnp.asarray(5.0)}
    out = ema_update(e, m, 0.9)
    ref_a = 0.9 * np.asarray([1.0, 2.0]) + 0.1 * np.asarray([2.0, 0.0])
    np.testing.assert_allclose(np.asarray(out["a"]), ref_a, rtol=1e-6)
    np.testing.assert_allclose(float(out["b"]), 0.9 * 3 + 0.1 * 5, rtol=1e-6)


def test_grad_norm_logged():
    _, _, state, step = make_setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 1))
    _, metrics = step(state, x)
    assert float(metrics["grad_norm"]) > 0


def test_loss_history_update_matches_numpy():
    """Device LossHistory reproduces the reference StepwiseLog ring
    (src/modules/stepwise_log.py:14-26) including duplicate-t batches."""
    h = LossHistory.create(diffusion_steps=5, history=3)
    rng = np.random.RandomState(0)
    # python reference
    ring = {t: [] for t in range(1, 6)}
    for _ in range(6):
        t = rng.randint(1, 6, size=(4,))
        losses = rng.rand(4).astype(np.float32)
        h = h.update(jnp.asarray(t), jnp.asarray(losses))
        for ti, li in zip(t, losses):
            ring[ti].append(li)
            ring[ti] = ring[ti][-3:]
    counts = np.asarray([len(ring[t]) for t in range(1, 6)])  # capped at 3
    for t in range(1, 6):
        got = np.sqrt(np.mean(np.square(ring[t]))) if ring[t] else 0.0
        np.testing.assert_allclose(
            np.asarray(h.rms_per_step())[t - 1], got, rtol=1e-5,
            err_msg=f"t={t}",
        )
    # total counts are uncapped (reference n_per_step, stepwise_log.py:26)
    rng = np.random.RandomState(0)
    total = np.zeros(5, int)
    for _ in range(6):
        t = rng.randint(1, 6, size=(4,))
        rng.rand(4)
        for ti in t:
            total[ti - 1] += 1
    np.testing.assert_array_equal(np.asarray(h.count), total)


def test_loss_history_drops_nonfinite():
    h = LossHistory.create(diffusion_steps=3, history=4)
    t = jnp.asarray([1, 2, 3])
    losses = jnp.asarray([1.0, np.nan, np.inf], jnp.float32)
    h = h.update(t, losses)
    np.testing.assert_array_equal(np.asarray(h.count), [1, 0, 0])
    assert np.isfinite(np.asarray(h.ring)).all()


def test_uniform_sampler_range():
    t, w = sample_uniform(jax.random.PRNGKey(0), 1000, T)
    t = np.asarray(t)
    assert w is None and t.min() >= 1 and t.max() <= T
    # roughly uniform
    counts = np.bincount(t, minlength=T + 1)[1:]
    assert counts.min() > 0


def test_importance_sampler_warmup_then_weighted():
    """Uniform until every t has >= min_counts obs, then p ∝ RMS + 1e-6 with
    w = 1/(pN) (reference src/sampling/importance_sampler.py:16-41)."""
    h = LossHistory.create(diffusion_steps=4, history=10)
    t, w = sample_importance(jax.random.PRNGKey(0), 8, h, min_counts=2)
    # warmup: weights are 1/B so sum(w*l) == mean(l)
    np.testing.assert_allclose(np.asarray(w), 1.0 / 8)

    # warm it up: 2 obs per t, losses make t=4 dominant
    for _ in range(2):
        h = h.update(jnp.asarray([1, 2, 3, 4]), jnp.asarray([0.1, 0.1, 0.1, 10.0]))
    assert bool(h.is_warmed_up(2))
    t, w = sample_importance(jax.random.PRNGKey(1), 4096, h, min_counts=2)
    t = np.asarray(t)
    frac_t4 = (t == 4).mean()
    p_expected = np.asarray([0.1, 0.1, 0.1, 10.0]) + 1e-6
    p_expected /= p_expected.sum()
    assert abs(frac_t4 - p_expected[3]) < 0.05
    # weights = 1/(p*N)
    np.testing.assert_allclose(
        np.asarray(w), 1.0 / (p_expected[t - 1] * 4096), rtol=1e-3
    )


def test_importance_training_step_runs():
    _, _, state, step = make_setup(sampling="importance", min_counts=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 1))
    for _ in range(5):
        state, metrics = step(state, x)
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(state.loss_history.count).sum()) == 5 * 16


def test_hybrid_loss_learned_sigma():
    sched = NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)

    def apply_fn(params, x, t, y=None, **kw):
        eps = params["w"] * x
        v = jnp.zeros_like(x) + params["v"]
        return jnp.concatenate([eps, v], axis=-1)

    params = {"w": jnp.float32(0.5), "v": jnp.float32(0.0)}
    state = TrainState.create(params, optax.adam(1e-3), T, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(apply_fn, tables, loss_type="hybrid"))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 1))
    state, metrics = step(state, x)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["vlb"]))
    # vlb gradient flows into the variance head
    assert float(state.params["v"]) != 0.0


def test_eval_step():
    apply_fn, tables, state, _ = make_setup()
    eval_step = jax.jit(make_eval_step(apply_fn, tables))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 1))
    loss = eval_step(state.params, jax.random.PRNGKey(2), x)
    loss_ema = eval_step(state.ema_params, jax.random.PRNGKey(2), x)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss_ema))


def test_weighted_vs_mean_loss_semantics():
    """Weighted loss SUMS, unweighted MEANS (reference engine.py:274-277)."""
    # craft a history that's warmed up with uniform RMS -> p uniform,
    # w = 1/(p*B) = T/B... then sum(w*l) != mean(l) in general; just verify
    # the uniform path equals plain mean via a manual computation.
    sched = NoiseSchedule.create(diffusion_steps=T, mode="linear")
    tables = DiffusionTables.from_schedule(sched)

    def apply_fn(params, x, t, y=None, **kw):
        return params["w"] * x

    params = {"w": jnp.float32(0.3)}
    state = TrainState.create(params, optax.sgd(0.0), T, jax.random.PRNGKey(5))
    step = jax.jit(make_train_step(apply_fn, tables, sampling="uniform"))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 1))
    _, metrics = step(state, x)

    # recompute manually with the same RNG stream
    rng = jax.random.fold_in(jax.random.PRNGKey(5), 0)
    key_t, key_noise, _ = jax.random.split(rng, 3)
    t = jax.random.randint(key_t, (8,), 1, T + 1)
    noise = jax.random.normal(key_noise, x.shape, x.dtype)
    from probabilisticdeepdiffusionmodels_tpu.core import q_sample, mean_flat
    x_t = q_sample(tables, x, noise, t)
    eps = 0.3 * x_t
    expected = float(jnp.mean(mean_flat(jnp.square(noise - eps))))
    np.testing.assert_allclose(float(metrics["loss"]), expected, rtol=1e-6)
