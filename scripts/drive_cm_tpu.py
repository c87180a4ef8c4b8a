"""Drive the consistency-model paths on the real TPU chip: CT training
steps, 1/2/4-step native sampling, and a short consistency distillation
from an eps teacher (train/consistency.py, sample/sampler.py::
consistency_sample_loop).  Small shapes — this is a correctness drive
(compiles + finite numerics on hardware), not a benchmark.

    python scripts/drive_cm_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine  # noqa: E402
from probabilisticdeepdiffusionmodels_tpu.train.consistency import (  # noqa: E402
    consistency_distill_round,
    consistency_student,
)

MODEL = dict(
    name="unet", in_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=[8], channel_mult=[1, 2], num_heads=2,
    use_scale_shift_norm=True,
)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(16, 16, 16, 3)).astype("float32")

    # 1) teacher-free CT training
    eng = DiffusionEngine(
        MODEL, dict(lr=2e-4), diffusion_steps=1000, mode="linear",
        resolution=16, ema=0.999, seed=0,
        prediction_type="consistency", consistency_config=dict(grid_size=32),
    )
    t0 = time.time()
    losses = [float(eng.training_step(x)["loss"]) for _ in range(40)]
    assert np.isfinite(losses).all()
    print(f"CT train 40 steps: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"({time.time() - t0:.1f}s)", flush=True)

    # 2) native 1/2/4-step sampling
    for n in (1, 2, 4):
        t0 = time.time()
        imgs = eng.generate_images(
            n=16, minibatch=16, seed=0, consistency=True, num_sample_steps=n
        )
        assert np.isfinite(imgs).all()
        print(f"consistency {n}-step: {imgs.shape} std={np.std(imgs):.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)

    # 3) consistency distillation from an eps teacher (table denoiser)
    teacher = DiffusionEngine(
        MODEL, dict(lr=2e-4), diffusion_steps=1000, mode="linear",
        resolution=16, ema=0.999, seed=0,
    )
    for _ in range(10):
        teacher.training_step(x)
    student = consistency_student(teacher)
    t0 = time.time()
    out = consistency_distill_round(
        student, teacher, [x] * 20, log_every=0
    )
    assert np.isfinite(out["loss"])
    print(f"CD 20 steps from eps teacher: loss={out['loss']:.4f} "
          f"({time.time() - t0:.1f}s)", flush=True)
    imgs = student.generate_images(
        n=16, minibatch=16, seed=0, consistency=True
    )
    assert np.isfinite(imgs).all()
    print(f"CD student 1-step: {imgs.shape} std={np.std(imgs):.4f}",
          flush=True)
    print("DRIVE_CM_TPU_OK", flush=True)


if __name__ == "__main__":
    main()
