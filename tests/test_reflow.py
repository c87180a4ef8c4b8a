"""Reflow / 2-rectification (Liu et al., arXiv:2209.03003 §3.2) — beyond
the reference: straighten a generative ODE by retraining a flow student
on the teacher's own deterministic (z, x) couplings.

Contract under test:
  * generate_couplings pairs rows positionally (the wrap-padded chunking
    in generate_images must not misalign z_i with x_i);
  * the reflow regression target is exactly the coupling's constant
    velocity — for an already-straight teacher (x = z - c) the optimal
    student is the constant field c, and training converges to it;
  * reflow_student warm-starts from the teacher and rejects hybrid;
  * end-to-end: a flow teacher reflows (native-ODE couplings) and an
    eps teacher reflows (DDIM couplings), and the students' few-step
    native sampling works;
  * the CLI writes a loadable run directory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.train.reflow import (
    generate_couplings,
    make_reflow_step,
    reflow_round,
    reflow_student,
)

CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2],
    use_scale_shift_norm=True,
)


def _engine(prediction_type="flow", **kw):
    return DiffusionEngine(
        model_config=dict(CFG), optimizer_config={"lr": 2e-3},
        diffusion_steps=10, mode="cosine", resolution=8, ema=0.99,
        seed=0, prediction_type=prediction_type, **kw,
    )


def test_generate_couplings_rows_are_paired():
    """Row i of z must be the exact starting noise of row i of x — checked
    by regenerating single rows (n=6 with minibatch=4 exercises the
    wrap-padded tail chunk)."""
    eng = _engine()
    z, x = generate_couplings(
        eng, 6, jax.random.PRNGKey(3), minibatch=4,
        sampler_kwargs=dict(flow=True, num_sample_steps=4),
    )
    assert z.shape == x.shape == (6, 8, 8, 1)
    for i in (0, 4, 5):  # first chunk, and both rows of the tail chunk
        xi = eng.generate_images(n=1, minibatch=1, x_T=z[i:i + 1],
                                 flow=True, num_sample_steps=4)
        np.testing.assert_allclose(x[i], xi[0], rtol=1e-5, atol=1e-6)


def test_reflow_learns_a_straight_teacher_exactly():
    """Couplings from a perfectly straight ODE (constant velocity c:
    x = z - c) make the constant field the optimum; the student's
    predicted velocity must converge to c everywhere."""
    student = _engine()
    c = 0.7
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (256, 8, 8, 1), jnp.float32)
    x = z - c

    step = jax.jit(make_reflow_step(
        student._apply_raw, student.tables, student.flow,
    ), donate_argnums=(0,))
    state = student.state
    losses = []
    for i in range(60):
        lo = (i * 64) % 256
        state, m = step(state, x[lo:lo + 64], z[lo:lo + 64], None)
        losses.append(float(m["loss"]))
    student.state = state
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    # the learned field at an arbitrary point/time is ~c
    from probabilisticdeepdiffusionmodels_tpu.core.flow import TIME_SCALE
    xq = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    tq = jnp.asarray([0.2, 0.5, 0.8, 0.95]) * TIME_SCALE
    v = student._apply_raw(student.params(use_ema=False), xq, tq, None)
    assert abs(float(jnp.mean(v)) - c) < 0.15, float(jnp.mean(v))

    # and 1-step native Euler from z lands near z - c
    one = student.generate_images(n=4, minibatch=4, flow=True,
                                  num_sample_steps=1, seed=9,
                                  use_ema=False)
    assert np.isfinite(one).all()


def test_reflow_student_warm_start_and_guards():
    teacher = _engine()
    # move the teacher off its fresh init (same seed as the student's) so
    # warm vs cold start is distinguishable
    for _ in range(3):
        teacher.training_step(jnp.full((8, 8, 8, 1), 0.3, jnp.float32))
    student = reflow_student(teacher, use_ema_teacher=True)
    assert student.prediction_type == "flow"
    assert student.diffusion_steps == teacher.diffusion_steps
    for a, b in zip(jax.tree.leaves(student.params(use_ema=False)),
                    jax.tree.leaves(teacher.params(use_ema=True))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a flow teacher's time density carries over to the student
    assert student.flow == teacher.flow

    cold = reflow_student(teacher, warm_start=False)
    diffs = [
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(cold.params(use_ema=False)),
                        jax.tree.leaves(teacher.params(use_ema=True)))
    ]
    assert any(diffs)

    hyb = DiffusionEngine(
        model_config=dict(CFG, learn_sigma=True),
        optimizer_config={"lr": 1e-3}, diffusion_steps=10, mode="cosine",
        resolution=8, seed=0, loss_type="hybrid",
    )
    with pytest.raises(NotImplementedError, match="learned-sigma"):
        reflow_student(hyb)


@pytest.mark.slow
def test_reflow_round_flow_and_eps_teachers():
    """End-to-end on both teacher families: the native-ODE coupling path
    (flow teacher) and the eps-view DDIM coupling path (eps teacher).
    The students' few-step native sampling must be finite and the loss
    must drop."""
    x_data = jnp.full((16, 8, 8, 1), 0.5, jnp.float32)
    for ptype, kwargs in (
        ("flow", None),  # default: native flow couplings
        ("epsilon", dict(ddim=True, num_sample_steps=5)),
    ):
        teacher = _engine(prediction_type=ptype)
        for _ in range(20):
            teacher.training_step(x_data)
        student = reflow_student(teacher)
        last = reflow_round(
            student, teacher, jax.random.PRNGKey(0), n_couplings=64,
            batch_size=16, epochs=3, minibatch_gen=32,
            sampler_kwargs=kwargs, log_every=0,
        )
        assert np.isfinite(last["loss"]), (ptype, last)
        for n_steps in (1, 2, 4):
            imgs = student.generate_images(n=2, minibatch=2, flow=True,
                                           num_sample_steps=n_steps, seed=1)
            assert np.isfinite(imgs).all(), (ptype, n_steps)

    # conditional teacher: labels thread through coupling generation AND
    # the student step (the per-class ODEs rectify)
    cond = DiffusionEngine(
        model_config=dict(CFG, num_classes=2), optimizer_config={"lr": 2e-3},
        diffusion_steps=10, mode="cosine", resolution=8, ema=0.99, seed=0,
        prediction_type="flow",
    )
    y_data = jnp.asarray([0, 1] * 8, jnp.int32)
    for _ in range(10):
        cond.training_step(x_data, y_data)
    student_c = reflow_student(cond)
    y_pairs = np.arange(32) % 2
    last = reflow_round(
        student_c, cond, jax.random.PRNGKey(1), n_couplings=32,
        batch_size=16, epochs=2, minibatch_gen=16, y=y_pairs, log_every=0,
    )
    assert np.isfinite(last["loss"])
    imgs = student_c.generate_images(n=2, minibatch=2, flow=True,
                                     num_sample_steps=2, seed=2,
                                     y=np.asarray([0, 1]))
    assert np.isfinite(imgs).all()

    # zero-training-step configs are rejected loudly, not silently
    # written out as a "reflowed" run
    with pytest.raises(ValueError, match="no training step"):
        reflow_round(student_c, cond, jax.random.PRNGKey(2),
                     n_couplings=8, batch_size=16)


@pytest.mark.slow
def test_reflow_cli_end_to_end(tmp_path):
    """cli.reflow on a (tiny) trained run writes a loadable flow-student
    run: config + checkpoint + final_test.json, reloadable by the sample
    CLI machinery with sampler=flow."""
    from probabilisticdeepdiffusionmodels_tpu.cli.train import (
        main as train_main,
    )

    res = train_main([
        "model=unet_small_grey", "data=synthetic", "data.channels=1",
        "data.n=32", "data.batch_size=16", "data.num_samples_per_epoch=32",
        "data.transformation_kwargs.normalize=mnist", "engine=mnist",
        "engine.resolution=8", "engine.diffusion_steps=12",
        "engine.mode=cosine", "engine.ema=0.9",
        "model.use_scale_shift_norm=true", "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=1", "trainer.limit_test_batches=1",
        "visualization=none", f"out_dir={tmp_path}", "run_name=teacher",
    ])
    from probabilisticdeepdiffusionmodels_tpu.cli.reflow import (
        main as reflow_main,
    )

    out = reflow_main([
        f"run_dir={res['run_dir']}", f"out_dir={tmp_path}",
        "n_couplings=32", "batch_size=16", "epochs=2", "minibatch_gen=16",
        "gen_sampler=ddim", "gen_steps=4", "limit_test_batches=1",
    ])
    assert np.isfinite(out["loss"]) and np.isfinite(out["test_nll"])

    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )

    student, _ = load_engine_from_run(f"{tmp_path}/teacher_reflow")
    assert student.prediction_type == "flow"
    imgs = student.generate_images(n=2, minibatch=2, flow=True,
                                   num_sample_steps=2, seed=0)
    assert np.isfinite(np.asarray(imgs)).all()
