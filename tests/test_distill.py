"""Progressive distillation (Salimans & Ho, arXiv:2202.00512 §3) — beyond
the reference: one student DDIM step learns to match two teacher steps.
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
from probabilisticdeepdiffusionmodels_tpu.train import (
    distill_round,
    halved_student,
    make_distill_step,
)

T = 16

MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
)


def make_teacher(**kw):
    cfg = dict(
        model_config=MODEL_CFG, optimizer_config={"lr": 1e-3},
        diffusion_steps=T, mode="cosine", resolution=8, ema=0.99, seed=0,
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


def test_halved_student_schedule_and_warm_start():
    teacher = make_teacher()
    student = halved_student(teacher)
    assert student.diffusion_steps == T // 2
    assert student.prediction_type == "v"
    # alpha-bar matches the teacher at every even step (respacing
    # invariant; tiny f32 cumprod drift allowed)
    np.testing.assert_allclose(
        student.schedule.alphas_hat,
        teacher.schedule.alphas_hat[1::2],
        rtol=3e-4,
    )
    # warm start: student params == teacher EMA params
    for a, b in zip(jax.tree.leaves(student.state.params),
                    jax.tree.leaves(teacher.params(use_ema=True))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # betas round-trip through hparams -> an engine rebuilt from hparams
    # has the same chain (checkpoint-reload invariant)
    rebuilt = DiffusionEngine(**student.hparams)
    np.testing.assert_array_equal(
        np.asarray(rebuilt.tables.betas), np.asarray(student.tables.betas)
    )


def test_one_step_target_identity():
    """The implied x0* makes one eta=0 DDIM step from z land EXACTLY on
    the teacher's two-step endpoint (paper eq. 9) — checked as pure
    algebra on random tensors."""
    sched = NoiseSchedule.create(diffusion_steps=T, mode="cosine")
    t_tab = DiffusionTables.from_schedule(sched)
    from probabilisticdeepdiffusionmodels_tpu.sample.sampler import (
        respaced_schedule,
    )
    s_sched, _ = respaced_schedule(sched, list(range(2, T + 1, 2)))
    s_tab = DiffusionTables.from_schedule(s_sched)

    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (5, 4, 4, 1))
    t_s = jnp.asarray([1, 2, 4, 6, 8], jnp.int32)

    def teacher_eps(x, t):
        return 0.4 * jnp.tanh(x) + 0.1  # arbitrary, x-dependent

    def ddim_step(tab, x, t, eps):
        x0 = D.xstart_from_epsilon(tab, x, t, eps)
        ab_p = D.expand_to(tab.alphas_hat_prev, t, x.ndim)
        return jnp.sqrt(ab_p) * x0 + jnp.sqrt(1.0 - ab_p) * eps

    t_hi = 2 * t_s
    z1 = ddim_step(t_tab, z, t_hi, teacher_eps(z, t_hi))
    z2 = ddim_step(t_tab, z1, t_hi - 1, teacher_eps(z1, t_hi - 1))

    a_t = D.expand_to(s_tab.alphas_hat_sqrt, t_s, z.ndim)
    s_t = D.expand_to(s_tab.one_min_alphas_hat_sqrt, t_s, z.ndim)
    ab_p = D.expand_to(s_tab.alphas_hat_prev, t_s, z.ndim)
    a_p, s_p = jnp.sqrt(ab_p), jnp.sqrt(1.0 - ab_p)
    ratio = s_p / s_t
    x0_star = (z2 - ratio * z) / (a_p - ratio * a_t)
    eps_star = (z - a_t * x0_star) / s_t
    landed = a_p * x0_star + s_p * eps_star
    np.testing.assert_allclose(np.asarray(landed), np.asarray(z2),
                               rtol=0, atol=2e-4)
    # and the v-space target is consistent: x0(v*) == x0*
    v_star = (a_t * z - x0_star) / s_t
    np.testing.assert_allclose(
        np.asarray(a_t * z - s_t * v_star), np.asarray(x0_star),
        rtol=0, atol=2e-4,
    )


def _fixed_distill_loss(student, teacher, x0):
    """Deterministic distillation loss on a fixed (t, noise) grid — the
    per-step training loss is noisy (t resampled every step), so learning
    is asserted on this fixed probe instead."""
    T_s = student.diffusion_steps
    b = x0.shape[0]
    t_s = (jnp.arange(b, dtype=jnp.int32) % T_s) + 1
    noise = jax.random.normal(jax.random.PRNGKey(99), x0.shape)
    z = D.q_sample(student.tables, x0, noise, t_s)

    def ddim_step(tab, x, t, eps):
        x0_ = D.xstart_from_epsilon(tab, x, t, eps)
        ab_p = D.expand_to(tab.alphas_hat_prev, t, x.ndim)
        return jnp.sqrt(ab_p) * x0_ + jnp.sqrt(1.0 - ab_p) * eps

    tp = teacher.params(use_ema=True)
    t_hi = 2 * t_s
    z1 = ddim_step(teacher.tables, z, t_hi,
                   teacher._apply(tp, z, t_hi, None))
    z2 = ddim_step(teacher.tables, z1, t_hi - 1,
                   teacher._apply(tp, z1, t_hi - 1, None))
    a_t = D.expand_to(student.tables.alphas_hat_sqrt, t_s, z.ndim)
    s_t = D.expand_to(student.tables.one_min_alphas_hat_sqrt, t_s, z.ndim)
    ab_p = D.expand_to(student.tables.alphas_hat_prev, t_s, z.ndim)
    a_p, s_p = jnp.sqrt(ab_p), jnp.sqrt(1.0 - ab_p)
    ratio = s_p / s_t
    x0_star = jnp.clip((z2 - ratio * z) / (a_p - ratio * a_t), -1.0, 1.0)
    v_star = (a_t * z - x0_star) / s_t
    v_pred = student._apply_raw(student.state.params, z, t_s, None)
    return float(jnp.mean(D.mean_flat(jnp.square(v_star - v_pred))))


def test_distill_round_learns_and_student_works():
    teacher = make_teacher()
    student = halved_student(teacher, lr=2e-3)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (8, 8, 8, 1))
    before = _fixed_distill_loss(student, teacher, x0)
    losses = []

    def capture(msg):
        losses.append(float(msg.rsplit("loss=", 1)[1]))

    distill_round(student, teacher, [x0] * 40, log_every=1, log=capture)
    assert len(losses) == 40 and np.isfinite(losses).all()
    after = _fixed_distill_loss(student, teacher, x0)
    assert after < before, (before, after)
    # the distilled student is a full engine: 8-step sampling + NLL work
    imgs = student.generate_images(n=2, minibatch=2, seed=1)
    assert imgs.shape == (2, 8, 8, 1) and np.isfinite(imgs).all()
    ddim = student.generate_images(n=2, minibatch=2, seed=1, ddim=True)
    assert np.isfinite(ddim).all()
    nll = student.calculate_likelihood(x0[:2], seed=0)
    assert np.isfinite(np.asarray(nll["nll"])).all()
    # a second halving composes (T/2 -> T/4)
    grandstudent = halved_student(student)
    assert grandstudent.diffusion_steps == T // 4
    np.testing.assert_allclose(
        grandstudent.schedule.alphas_hat,
        teacher.schedule.alphas_hat[3::4],
        rtol=3e-4,
    )


def test_halving_odd_T_rejected():
    teacher = make_teacher(diffusion_steps=15)
    with pytest.raises(AssertionError, match="halve"):
        halved_student(teacher)


def test_distill_cli_end_to_end(tmp_path):
    """cli.distill on a (tiny) trained run writes a loadable student run:
    config + checkpoint + final_test.json, reloadable by the sample CLI
    machinery."""
    from probabilisticdeepdiffusionmodels_tpu.cli.train import (
        main as train_main,
    )

    res = train_main([
        "model=unet_small_grey", "data=synthetic", "data.channels=1",
        "data.n=32", "data.batch_size=16", "data.num_samples_per_epoch=32",
        "data.transformation_kwargs.normalize=mnist", "engine=mnist",
        "engine.resolution=8", "engine.diffusion_steps=12",
        "engine.mode=cosine", "engine.ema=0.9", "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=1", "trainer.limit_test_batches=1",
        "visualization=none", f"out_dir={tmp_path}", "run_name=teacher",
    ])
    from probabilisticdeepdiffusionmodels_tpu.cli.distill import (
        main as distill_main,
    )

    results = distill_main([
        f"run_dir={res['run_dir']}", f"out_dir={tmp_path}", "rounds=2",
        "epochs=2", "limit_test_batches=1",
    ])
    assert set(results) == {6, 3}
    for T_s in (6, 3):
        assert np.isfinite(results[T_s]["loss"])
        assert np.isfinite(results[T_s]["test_nll"])
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )

    student, _ = load_engine_from_run(f"{tmp_path}/teacher_distillT3")
    assert student.diffusion_steps == 3
    imgs = student.generate_images(n=2, minibatch=2, seed=0)
    assert np.isfinite(np.asarray(imgs)).all()


def test_distill_step_is_pure_layout_change_on_mesh():
    """The distillation step under a data mesh (sharded batch, replicated
    student state + teacher params) computes the same loss and updates as
    single-device — distillation is training, production runs it DP."""
    from probabilisticdeepdiffusionmodels_tpu.parallel import (
        data_sharding,
        make_mesh,
        replicated,
    )

    teacher = make_teacher()
    s1 = halved_student(teacher, lr=2e-3)
    step = jax.jit(make_distill_step(
        s1._apply_raw, teacher._apply, s1.tables, teacher.tables
    ))
    x0 = jax.random.normal(jax.random.PRNGKey(7), (16, 8, 8, 1))
    tp = teacher.params(use_ema=True)
    st1, m1 = step(s1.state, x0, tp)

    mesh = make_mesh(8)
    s8 = halved_student(teacher, lr=2e-3)
    st8, m8 = step(
        jax.device_put(s8.state, replicated(mesh)),
        jax.device_put(x0, data_sharding(mesh, x0.ndim)),
        jax.device_put(tp, replicated(mesh)),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_conditional_and_guided_distillation():
    """Labels thread through teacher and student forwards; a CFG-wrapped
    teacher distills guided sampling into the student's single forward
    (arXiv:2210.03142, fixed-w)."""
    teacher = make_teacher(model_config=dict(
        MODEL_CFG, num_classes=4, cfg_null_class=True,
        use_scale_shift_norm=True,
    ))
    x0 = jax.random.normal(jax.random.PRNGKey(7), (8, 8, 8, 1))
    y = jnp.arange(8, dtype=jnp.int32) % 4

    student = halved_student(teacher, lr=2e-3)
    distill_round(student, teacher, [(x0, y)] * 4, log_every=0)
    imgs = student.generate_images(n=4, minibatch=4, seed=1, y=y[:4])
    assert np.isfinite(np.asarray(imgs)).all()

    guided = halved_student(teacher, lr=2e-3)
    distill_round(guided, teacher, [(x0, y)] * 4, log_every=0,
                  guidance_scale=2.0)
    gimgs = guided.generate_images(n=4, minibatch=4, seed=1, y=y[:4])
    assert np.isfinite(np.asarray(gimgs)).all()

    with pytest.raises(AssertionError, match="labels"):
        distill_round(guided, teacher, [(x0, None)], guidance_scale=2.0)
