"""Does pre-casting params to bf16 outside the sampling scan help?

Hypothesis: with ``compute_dtype=bfloat16`` the Flax modules cast each f32
kernel to bf16 at use; inside the 250-step `lax.scan` those converts are
loop-invariant.  If XLA hoists them out of the loop (keeping a bf16 copy
of the weights live in HBM across steps), pre-casting changes nothing; if
it does NOT, every step re-reads f32 weights (2x the necessary HBM weight
traffic) and pre-casting is a real exact-sampler win.

Numerics: for matmul/conv weights the pre-cast is bit-identical to the
per-use cast (the op consumed bf16 either way).  GroupNorm32 scale/bias
are kept f32 (the norm computes in f32; casting those WOULD change math).

Usage: python scripts/bench_param_dtype.py   (TPU)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

STEPS = 250
BATCH = 128


def cast_params(params):
    """bf16-cast every kernel that feeds a matmul/conv; keep norm params
    (and biases added in f32 paths) in f32."""
    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = walk(v, p)
            else:
                norm = any("norm" in seg for seg in p)
                out[k] = v if (norm or k != "kernel") else v.astype(jnp.bfloat16)
        return out

    return walk(params, ())


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
            name="unet", in_channels=3, model_channels=128, num_res_blocks=3,
            attention_resolutions=[16, 8], channel_mult=[1, 2, 2, 2],
            num_heads=4, compute_dtype="bfloat16",
        ),
    )
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.ones((BATCH,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    apply_fn = lambda p, xx, tt, yy=None, **kw: model.apply(
        {"params": p}, xx, tt, yy, **kw
    )

    sched = NoiseSchedule.create(diffusion_steps=1000, mode="linear")
    sub, tmap = respaced_schedule(sched, space_timesteps(1000, STEPS))
    tables = DiffusionTables.from_schedule(sub)
    tmap = jnp.asarray(tmap)

    @jax.jit
    def sample(params, x_T, key):
        return p_sample_loop(
            apply_fn, params, tables, x_T, key, clip=True, timestep_map=tmap,
        )

    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(key, x.shape, jnp.float32)

    def measure(p):
        out = sample(p, x_T, key)  # compile + warm
        assert np.isfinite(float(jnp.sum(out)))
        t0 = time.perf_counter()
        cur = x_T
        for i in range(3):
            cur = sample(p, cur, jax.random.fold_in(key, i))
        float(jnp.sum(jnp.abs(cur)))
        return BATCH / ((time.perf_counter() - t0) / 3)

    r_f32 = measure(params)
    print(f"f32 params (per-use cast): {r_f32:.2f} img/s", flush=True)
    r_bf16 = measure(cast_params(params))
    print(f"bf16 pre-cast params:      {r_bf16:.2f} img/s", flush=True)
    print({"f32_params": round(r_f32, 2), "bf16_params": round(r_bf16, 2),
           "ratio": round(r_bf16 / r_f32, 3)})


if __name__ == "__main__":
    main()
