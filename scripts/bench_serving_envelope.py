"""Serving envelope: sampler throughput across batch sizes on one chip.

Production deployments pick a (batch, sampler) operating point; this maps
the envelope the way a serving team would — img/s and ms/img for
batch x sampler on the flagship CIFAR UNet (the bench.py model):

  * exact ancestral, 250 respaced steps (the headline bench config)
  * DDIM-50 (the fastest validated near-exact-quality config)
  * DPM-Solver++(2M)-10 (the quality-flat ODE-limit config)
  * native flow Euler at 1/2/4 steps (the reflow serving configs,
    train/reflow.py — same UNet cost per eval, so the rates apply to
    any flow/reflowed model of this architecture)

Writes docs/results/serving_envelope.json and prints the table.  Run on
the real TPU (one process at a time):
    timeout 3600 python scripts/bench_serving_envelope.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCHES = (32, 128, 512)
RESOLUTION = 32


def measure(sample_fn, params, x_T, key, batch, n_rep=3):
    """bench.py's chained-rep timing: one host pull amortized over reps."""
    w = sample_fn(params, x_T, key)
    assert np.isfinite(float(jnp.sum(w))), "non-finite warmup output"
    t0 = time.perf_counter()
    out = x_T
    for i in range(n_rep):
        out = sample_fn(params, out, jax.random.fold_in(key, i))
    checksum = float(jnp.sum(jnp.abs(out)))
    dt = (time.perf_counter() - t0) / n_rep
    assert np.isfinite(checksum)
    return batch / dt


def main(batches=BATCHES, model_channels=128, num_res_blocks=3,
         resolution=RESOLUTION, n_rep=3,
         steps=(250, 50, 10), flow_steps=(1, 2, 4),
         out_name="serving_envelope.json"):
    from probabilisticdeepdiffusionmodels_tpu.core import (
        DiffusionTables,
        NoiseSchedule,
    )
    from probabilisticdeepdiffusionmodels_tpu.models import get_model
    from probabilisticdeepdiffusionmodels_tpu.sample import (
        ddim_sample_loop,
        dpmpp_sample_loop,
        flow_sample_loop,
        p_sample_loop,
        respaced_schedule,
        space_timesteps,
    )

    model = get_model(
        resolution,
        dict(
            name="unet",
            in_channels=3,
            model_channels=model_channels,
            num_res_blocks=num_res_blocks,
            attention_resolutions=[16, 8],
            channel_mult=[1, 2, 2, 2],
            num_heads=4,
            compute_dtype="bfloat16",
        ),
    )
    x0 = jnp.zeros((1, resolution, resolution, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0,
                        jnp.ones((1,), jnp.int32))["params"]
    apply_fn = lambda p, xx, tt, yy=None, **kw: model.apply(
        {"params": p}, xx, tt, yy, **kw
    )

    sched = NoiseSchedule.create(diffusion_steps=1000, mode="linear")

    def tables_for(n_steps):
        sub, tmap = respaced_schedule(sched, space_timesteps(1000, n_steps))
        return DiffusionTables.from_schedule(sub), jnp.asarray(tmap)

    n_exact, n_ddim, n_dpmpp = steps
    t250, m250 = tables_for(n_exact)
    t50, m50 = tables_for(n_ddim)
    t10, m10 = tables_for(n_dpmpp)

    samplers = {
        f"ancestral_{n_exact}": jax.jit(lambda p, x, k: p_sample_loop(
            apply_fn, p, t250, x, k, clip=True, timestep_map=m250)),
        f"ddim_{n_ddim}": jax.jit(lambda p, x, k: ddim_sample_loop(
            apply_fn, p, t50, x, k, clip=True, timestep_map=m50)),
        f"dpmpp_{n_dpmpp}": jax.jit(lambda p, x, k: dpmpp_sample_loop(
            apply_fn, p, t10, x, k, clip=True, timestep_map=m10)),
    }
    for n_flow in flow_steps:
        samplers[f"flow_{n_flow}"] = jax.jit(
            lambda p, x, k, n=n_flow: flow_sample_loop(
                apply_fn, p, None, x, k, n_steps=n, clip=True
            )
        )

    key = jax.random.PRNGKey(1)
    table = {}
    for batch in batches:
        x_T = jax.random.normal(key, (batch, resolution, resolution, 3),
                                jnp.float32)
        row = {}
        for name, fn in samplers.items():
            t0 = time.perf_counter()
            rate = measure(fn, params, x_T, key, batch, n_rep)
            row[name] = {
                "img_per_sec": round(rate, 2),
                "ms_per_img": round(1000.0 / rate, 3),
            }
            print(f"batch={batch:4d} {name:14s} {rate:8.1f} img/s "
                  f"({1000.0 / rate:7.3f} ms/img)  [{time.perf_counter() - t0:.0f}s incl compile]",
                  flush=True)
        table[str(batch)] = row

    result = {
        "device": str(jax.devices()[0]),
        "model": f"cifar_unet_{model_channels}ch",
        "n_rep": n_rep,
        "envelope": table,
    }
    out = Path(__file__).resolve().parent.parent / "docs" / "results" / out_name
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
