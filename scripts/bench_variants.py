"""Sampler configuration sweep on the real TPU (bench.py's workload).

Measures end-to-end img/s for combinations of the two shipping
accelerations — encoder_reuse and the token-gated Pallas attention —
so docs/KERNELS.md's scoreboard stays backed by current numbers.

Usage: python scripts/bench_variants.py   (TPU; ~5 min, one process)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STEPS = 250
BATCH = 128


def build(use_pallas_attention, steps=STEPS, use_pallas_conv=False):
    from probabilisticdeepdiffusionmodels_tpu.core import (
        DiffusionTables,
        NoiseSchedule,
    )
    from probabilisticdeepdiffusionmodels_tpu.models import get_model
    from probabilisticdeepdiffusionmodels_tpu.sample import (
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
            use_pallas_attention=use_pallas_attention,
            use_pallas_conv=use_pallas_conv,
        ),
    )
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.ones((BATCH,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    apply_fn = lambda p, xx, tt, yy=None, **kw: model.apply(
        {"params": p}, xx, tt, yy, **kw
    )
    sched = NoiseSchedule.create(diffusion_steps=1000, mode="linear")
    sub_sched, tmap = respaced_schedule(sched, space_timesteps(1000, steps))
    tables = DiffusionTables.from_schedule(sub_sched)
    return apply_fn, params, tables, jnp.asarray(tmap)


def measure(apply_fn, params, tables, tmap, encoder_reuse, n_rep=3,
            ddim=False, cache_middle=False):
    from probabilisticdeepdiffusionmodels_tpu.sample import (
        ddim_sample_loop,
        p_sample_loop,
    )

    loop = ddim_sample_loop if ddim else p_sample_loop
    extra = {} if ddim else {"reuse_cache_middle": cache_middle}

    @jax.jit
    def sample(params, x_T, key):
        return loop(
            apply_fn, params, tables, x_T, key, clip=True,
            timestep_map=tmap, encoder_reuse=encoder_reuse, **extra,
        )

    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(key, (BATCH, 32, 32, 3), jnp.float32)
    w = sample(params, x_T, key)
    assert np.isfinite(float(jnp.sum(w)))
    t0 = time.perf_counter()
    out = x_T
    for i in range(n_rep):
        out = sample(params, out, jax.random.fold_in(key, i))
    assert np.isfinite(float(jnp.sum(jnp.abs(out))))
    dt = (time.perf_counter() - t0) / n_rep
    return round(BATCH / dt, 2)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    results = {}
    if mode == "fast":
        # 50-step fast samplers (BASELINE config #3): strided ancestral and
        # DDIM, each exact and with encoder reuse
        apply_fn, params, tables, tmap = build(False, steps=50)
        for ddim in (False, True):
            for k in (1, 3):
                name = ("ddim50" if ddim else "strided50") + f"_reuse{k}"
                results[name] = measure(
                    apply_fn, params, tables, tmap, k, ddim=ddim
                )
                print(f"{name}: {results[name]} img/s", flush=True)
    elif mode == "dpmpp":
        # DPM-Solver++(2M) at shrinking step counts (throughput scales
        # ~linearly in steps; the win is quality-at-few-steps)
        from probabilisticdeepdiffusionmodels_tpu.sample import (
            dpmpp_sample_loop,
        )

        for steps in (50, 25, 10):
            apply_fn, params, tables, tmap = build(False, steps=steps)

            @jax.jit
            def sample(params, x_T):
                return dpmpp_sample_loop(
                    apply_fn, params, tables, x_T, clip=True,
                    timestep_map=tmap, order=2,
                )

            key = jax.random.PRNGKey(1)
            x_T = jax.random.normal(key, (BATCH, 32, 32, 3), jnp.float32)
            w = sample(params, x_T)
            assert np.isfinite(float(jnp.sum(w)))
            t0 = time.perf_counter()
            for i in range(3):
                out = sample(params, jax.random.normal(
                    jax.random.fold_in(key, i), x_T.shape, x_T.dtype))
                out.block_until_ready()
            dt = (time.perf_counter() - t0) / 3
            results[f"dpmpp{steps}"] = round(BATCH / dt, 2)
            print(f"dpmpp{steps}: {results[f'dpmpp{steps}']} img/s",
                  flush=True)
    elif mode == "convs":
        # GN+SiLU+conv3x3 fused kernel re-measure (bf16 Mosaic matmul now
        # accepted — the kernel's 9-tap matmuls run at the operand dtype)
        for use_conv in (False, True):
            apply_fn, params, tables, tmap = build(
                False, use_pallas_conv=use_conv
            )
            name = "pallas_conv" if use_conv else "xla"
            results[name] = measure(apply_fn, params, tables, tmap, 1)
            print(f"{name}: {results[name]} img/s", flush=True)
    elif mode == "cfg":
        # classifier-free guidance cost at FLAGSHIP scale (batch 128,
        # 128ch UNet, 250-step chain — compute-bound, unlike the small
        # trained-study model): unguided vs full-chain guided (doubled
        # batch every step) vs guidance_interval windows (lax.cond)
        from probabilisticdeepdiffusionmodels_tpu.core import (
            DiffusionTables,
            NoiseSchedule,
        )
        from probabilisticdeepdiffusionmodels_tpu.models import get_model
        from probabilisticdeepdiffusionmodels_tpu.sample import (
            make_cfg_apply_fn,
            p_sample_loop,
            respaced_schedule,
            space_timesteps,
        )

        model = get_model(
            32,
            dict(
                name="unet", in_channels=3, model_channels=128,
                num_res_blocks=3, attention_resolutions=[16, 8],
                channel_mult=[1, 2, 2, 2], num_heads=4,
                compute_dtype="bfloat16", num_classes=10,
                cfg_null_class=True, use_scale_shift_norm=True,
            ),
        )
        x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
        t = jnp.ones((BATCH,), jnp.int32)
        y = jnp.asarray(np.arange(BATCH) % 10)
        params = model.init(jax.random.PRNGKey(0), x, t, y=y)["params"]
        base_apply = lambda p, xx, tt, yy=None, **kw: model.apply(
            {"params": p}, xx, tt, yy, **kw
        )
        sched = NoiseSchedule.create(diffusion_steps=1000, mode="linear")
        sub_sched, tmap = respaced_schedule(
            sched, space_timesteps(1000, STEPS)
        )
        tables = DiffusionTables.from_schedule(sub_sched)
        tmap = jnp.asarray(tmap)

        configs = {
            "unguided": None,
            "guided_full": (None,),
            "guided_100_700": ((100, 700),),
            "guided_300_500": ((300, 500),),
        }
        for name, spec in configs.items():
            apply_fn = base_apply if spec is None else make_cfg_apply_fn(
                base_apply, 2.0, 10, interval=spec[0]
            )

            @jax.jit
            def sample(params, x_T, key):
                return p_sample_loop(
                    apply_fn, params, tables, x_T, key, clip=True,
                    timestep_map=tmap, y=y,
                )

            key = jax.random.PRNGKey(1)
            x_T = jax.random.normal(key, (BATCH, 32, 32, 3), jnp.float32)
            w = sample(params, x_T, key)
            assert np.isfinite(float(jnp.sum(w)))
            t0 = time.perf_counter()
            out = x_T
            for i in range(3):
                out = sample(params, out, jax.random.fold_in(key, i))
            assert np.isfinite(float(jnp.sum(jnp.abs(out))))
            dt = (time.perf_counter() - t0) / 3
            results[name] = round(BATCH / dt, 2)
            print(f"{name}: {results[name]} img/s", flush=True)
    elif mode == "midcache":
        # middle-block caching on top of encoder reuse (VERDICT r2 next #3:
        # record the measurement): cached steps skip encoder AND middle,
        # only the decoder reruns
        apply_fn, params, tables, tmap = build(False)
        for k in (2, 3):
            for mid in (False, True):
                name = f"reuse{k}" + ("_midcache" if mid else "")
                results[name] = measure(
                    apply_fn, params, tables, tmap, k, cache_middle=mid
                )
                print(f"{name}: {results[name]} img/s", flush=True)
    else:
        for pallas_attn in (False, True):
            apply_fn, params, tables, tmap = build(pallas_attn)
            for k in (1, 3):
                name = f"reuse{k}" + ("_pallas_attn" if pallas_attn else "")
                results[name] = measure(apply_fn, params, tables, tmap, k)
                print(f"{name}: {results[name]} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
