"""Regression tests for the ADVICE r3 findings (all five fixed this round).

1. engine.generate_images knob resolution: per-call knobs use
   `is not None` override semantics on EVERY sampler path, so an explicit
   0/0.0 clears an engine-level knob (previously truthiness on the
   DPM++/DDIM branches made that impossible).
2. cli.profile synthesizes a conditioning batch for conditional runs
   instead of crashing in engine._cond.
3. cli.sample.load_engine_from_run ignores the run's own trainer.devices
   (a checkpoint trained on an 8-device mesh must load on a smaller host).
4. engine.inpaint / ddim_invert raise the readable batch-divisibility
   ValueError training_step has, instead of an opaque XLA sharding error.
5. distill_round threads use_ema_teacher so the warm start and the
   distillation targets come from ONE teacher weight set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
from probabilisticdeepdiffusionmodels_tpu.parallel.mesh import make_mesh

T = 16

MODEL_CFG = dict(
    name="unet", in_channels=1, model_channels=16, num_res_blocks=1,
    attention_resolutions=[], channel_mult=[1, 2], num_heads=1,
)


def make_engine(**kw):
    cfg = dict(
        model_config=MODEL_CFG, optimizer_config={"lr": 1e-3},
        diffusion_steps=T, mode="cosine", resolution=8, ema=0.99, seed=0,
    )
    cfg.update(kw)
    return DiffusionEngine(**cfg)


# ---------------------------------------------------------------- ADVICE #1


def test_explicit_zero_clears_engine_knob_on_dpm_path():
    eng = make_engine(reuse_sigma_boost=0.25)
    # inherited engine knob -> the DPM++ path must reject it
    with pytest.raises(ValueError, match="not\\s+supported"):
        eng.generate_images(n=2, minibatch=2, seed=0, dpm_solver=True,
                            num_sample_steps=4)
    # explicit 0.0 clears it -> the call runs
    imgs = eng.generate_images(n=2, minibatch=2, seed=0, dpm_solver=True,
                               num_sample_steps=4, reuse_sigma_boost=0.0)
    assert np.isfinite(np.asarray(imgs)).all()


def test_explicit_zero_clears_engine_knob_on_ddim_path():
    eng = make_engine(reuse_exact_head=2)
    with pytest.raises(ValueError, match="calibration knobs"):
        eng.generate_images(n=2, minibatch=2, seed=0, ddim=True,
                            num_sample_steps=4)
    imgs = eng.generate_images(n=2, minibatch=2, seed=0, ddim=True,
                               num_sample_steps=4, reuse_exact_head=0)
    assert np.isfinite(np.asarray(imgs)).all()


def test_explicit_zero_on_ancestral_reuse_path():
    # the ancestral branch always had `is not None` semantics — pin it
    eng = make_engine(reuse_sigma_boost=0.25)
    imgs = eng.generate_images(n=2, minibatch=2, seed=0, encoder_reuse=2,
                               reuse_sigma_boost=0.0)
    assert np.isfinite(np.asarray(imgs)).all()


# ---------------------------------------------------------------- ADVICE #4


@pytest.fixture(scope="module")
def mesh_engine():
    return make_engine(mesh=make_mesh(8))


def test_inpaint_rejects_indivisible_batch(mesh_engine):
    x0 = np.zeros((4, 8, 8, 1), np.float32)  # 4 % 8 != 0
    mask = np.ones((8, 8, 1), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        mesh_engine.inpaint(x0, mask, seed=0, num_sample_steps=4)


def test_ddim_invert_rejects_indivisible_batch(mesh_engine):
    x0 = np.zeros((4, 8, 8, 1), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        mesh_engine.ddim_invert(x0, t_end=4)


def test_divisible_batch_still_works(mesh_engine):
    x0 = np.zeros((8, 8, 8, 1), np.float32)
    mask = np.ones((8, 8, 1), np.float32)
    out = mesh_engine.inpaint(x0, mask, seed=0, num_sample_steps=4)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------- ADVICE #5


def test_distill_round_uses_requested_teacher_weights(monkeypatch):
    from probabilisticdeepdiffusionmodels_tpu.train.distill import (
        distill_round, halved_student,
    )

    teacher = make_engine()
    calls = []
    orig = teacher.params

    def recording_params(use_ema=False):
        calls.append(use_ema)
        return orig(use_ema=use_ema)

    monkeypatch.setattr(teacher, "params", recording_params)
    student = halved_student(teacher, use_ema_teacher=False)
    calls.clear()  # only inspect the distill_round call
    x0 = np.zeros((2, 8, 8, 1), np.float32)
    distill_round(student, teacher, [x0], log=lambda *_: None,
                  use_ema_teacher=False)
    assert calls == [False], calls


# ------------------------------------------------------- ADVICE #2/#3 (slow)


@pytest.fixture(scope="module")
def tiny_cond_run(tmp_path_factory):
    """A 1-epoch class-conditional trained run for the run_dir-addressed
    CLIs."""
    from probabilisticdeepdiffusionmodels_tpu.cli.train import main as train_main

    out_dir = tmp_path_factory.mktemp("runs")
    result = train_main([
        "model=unet_small_grey",
        "model.num_classes=4",
        "model.use_scale_shift_norm=true",  # live conditioning at tiny width
        "data=synthetic",
        "data.channels=1", "data.n=32", "data.batch_size=16",
        "data.transformation_kwargs.normalize=mnist",
        "engine=mnist", "engine.resolution=8",
        "engine.diffusion_steps=12", "engine.mode=cosine", "engine.ema=0.9",
        "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=1",
        "trainer.limit_test_batches=1",
        "visualization=none",
        "run_name=advice_cond",
        f"out_dir={out_dir}",
    ])
    return result["run_dir"]


@pytest.mark.slow
def test_profile_cli_on_conditional_run(tiny_cond_run):
    """ADVICE #2: profiling a conditional run must synthesize labels, not
    crash in engine._cond."""
    from probabilisticdeepdiffusionmodels_tpu.cli.profile import (
        main as profile_main,
    )

    t = profile_main([f"run_dir={tiny_cond_run}", "steps=1",
                      "sample_steps=4", "batch=4"])
    assert t["train_step_ms"] > 0 and t["sample_img_per_sec"] > 0


@pytest.mark.slow
def test_load_engine_ignores_trained_devices(tiny_cond_run):
    """ADVICE #3: a run whose config says trainer.devices=8 must still load
    single-device when the caller does not ask for a mesh."""
    from pathlib import Path

    import yaml

    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )

    cfg_path = Path(tiny_cond_run) / "experiment_config.yaml"
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg.setdefault("trainer", {})["devices"] = 8
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    engine, _ = load_engine_from_run(str(tiny_cond_run))
    assert engine.mesh is None
    # explicit request still builds the mesh
    engine8, _ = load_engine_from_run(str(tiny_cond_run), devices=8)
    assert engine8.mesh is not None and engine8.mesh.devices.size == 8
