"""Headline benchmark: sampler images/sec/chip, 250-step DDPM, CIFAR UNet.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric matches BASELINE.json's target ("sampler images/sec/chip
(250-step DDPM)") on the flagship CIFAR-10 UNet (reference
config/model/unet.yaml: 128ch, 3 res blocks, attention at 16/8,
clip_while_generating=true as config/engine/cifar10.yaml).  The whole
250-step reverse trajectory is one jitted lax.scan in bfloat16 compute.

vs_baseline: the reference publishes no throughput (SURVEY.md §6).
REFERENCE_IMG_PER_SEC below is our documented estimate of the reference
implementation's 250-step ancestral sampling rate on one data-center GPU
(Python-loop over per-step CUDA launches, fp32, batch 256): ~20 img/s.
The BASELINE target is >=5x this per chip.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC = 20.0
STEPS = 250
BATCH = 128


def main():
    from probabilisticdeepdiffusionmodels_tpu.core import (
        DiffusionTables,
        NoiseSchedule,
    )
    from probabilisticdeepdiffusionmodels_tpu.models import get_model
    from probabilisticdeepdiffusionmodels_tpu.sample import (
        p_sample_loop,
        respaced_schedule,
        space_timesteps,
    )

    model = get_model(
        32,
        dict(
            name="unet",
            in_channels=3,
            model_channels=128,
            num_res_blocks=3,
            attention_resolutions=[16, 8],
            channel_mult=[1, 2, 2, 2],
            num_heads=4,
            compute_dtype="bfloat16",
        ),
    )
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.ones((BATCH,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    apply_fn = lambda p, xx, tt, yy=None: model.apply({"params": p}, xx, tt, yy)

    # 250-step chain via respacing of the T=1000 schedule (BASELINE config #3)
    sched = NoiseSchedule.create(diffusion_steps=1000, mode="linear")
    kept = space_timesteps(1000, STEPS)
    sub_sched, tmap = respaced_schedule(sched, kept)
    tables = DiffusionTables.from_schedule(sub_sched)
    tmap = jnp.asarray(tmap)

    @jax.jit
    def sample(params, x_T, key):
        return p_sample_loop(
            apply_fn, params, tables, x_T, key, clip=True, timestep_map=tmap
        )

    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(key, x.shape, jnp.float32)

    # warmup/compile
    jax.block_until_ready(sample(params, x_T, key))

    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = sample(params, x_T, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep

    img_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "sampler_images_per_sec_per_chip_250step_ddpm_cifar_unet",
                "value": round(img_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
