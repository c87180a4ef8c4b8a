"""Production-scale sampling benchmark: CelebA-HQ 256x256 UNet on v5e-1.

The 256x256 model (reference config/model/unet_celebahq.yaml shapes:
128ch x [1,1,2,2,4,4], 3 res blocks, attention at 16/8 -> 157M params,
~665 GFLOPs/forward) is the framework's large-model datapoint.  Measures a
50-step respaced ancestral chain at batch 8, exact vs encoder_reuse=3, to
show the acceleration carries to production scale.

Usage: python scripts/bench_celebahq.py   (TPU; one process, ~15 min)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = 8
STEPS = 50
RES = 256


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
        RES,
        dict(
            name="unet",
            in_channels=3,
            model_channels=128,
            num_res_blocks=3,
            attention_resolutions=[16, 8],
            channel_mult=[1, 1, 2, 2, 4, 4],
            num_heads=4,
            compute_dtype="bfloat16",
        ),
    )
    x = jnp.zeros((BATCH, RES, RES, 3), jnp.float32)
    t = jnp.ones((BATCH,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)
    apply_fn = lambda p, xx, tt, yy=None, **kw: model.apply(
        {"params": p}, xx, tt, yy, **kw
    )

    sched = NoiseSchedule.create(diffusion_steps=1000, mode="linear")
    sub_sched, tmap = respaced_schedule(sched, space_timesteps(1000, STEPS))
    tables = DiffusionTables.from_schedule(sub_sched)
    tmap = jnp.asarray(tmap)

    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(key, x.shape, jnp.float32)
    results = {}
    for k in (1, 3):
        fn = jax.jit(
            lambda p, xt, kk, _k=k: p_sample_loop(
                apply_fn, p, tables, xt, kk, clip=True, timestep_map=tmap,
                encoder_reuse=_k,
            )
        )
        w = fn(params, x_T, key)
        assert np.isfinite(float(jnp.sum(w.astype(jnp.float32))))
        n_rep = 3
        t0 = time.perf_counter()
        out = x_T
        for i in range(n_rep):
            out = fn(params, out, jax.random.fold_in(key, i))
        assert np.isfinite(float(jnp.sum(jnp.abs(out.astype(jnp.float32)))))
        dt = (time.perf_counter() - t0) / n_rep
        results[f"k{k}"] = round(BATCH / dt, 3)
        print(f"encoder_reuse={k}: {results[f'k{k}']} img/s "
              f"({dt:.2f} s/chain of {STEPS} steps, batch {BATCH})",
              flush=True)
    print(results)


if __name__ == "__main__":
    main()
