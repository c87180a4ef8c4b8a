"""Training-step throughput on the real TPU (the README training row).

Full production step — fwd + bwd + Adam + EMA + device-side per-t loss
bookkeeping — on the flagship CIFAR-10 UNet (config/model/unet.yaml
shapes), bf16 compute / f32 params, donated state.  Sweeps batch size:
unlike sampling (latency-bound chain), the training step is one big
program where a larger batch amortizes bandwidth-bound ops.

Usage: python scripts/bench_train.py [--json out.json]   (TPU; one process)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(json_path=None):
    from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
    from probabilisticdeepdiffusionmodels_tpu.utils.profiling import unet_flops

    results = {}
    detail = {}
    # train step ~= 3x forward FLOPs (bwd ~= 2x fwd for conv nets)
    fwd = unet_flops(
        resolution=32, in_channels=3, model_channels=128,
        num_res_blocks=3, attention_resolutions=[16, 8],
        channel_mult=[1, 2, 2, 2], num_heads=4,
    )
    for batch in (128, 256, 512):
        eng = DiffusionEngine(
            model_config=dict(
                name="unet",
                in_channels=3,
                model_channels=128,
                num_res_blocks=3,
                attention_resolutions=[16, 8],
                channel_mult=[1, 2, 2, 2],
                num_heads=4,
                compute_dtype="bfloat16",
            ),
            optimizer_config=dict(lr=2e-4),
            diffusion_steps=1000,
            mode="linear",
            resolution=32,
            ema=0.9999,
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (batch, 32, 32, 3), np.float32
            )
        )
        for _ in range(3):  # compile + settle
            eng.training_step(x)
        float(eng.state.step)  # sync

        n_rep = 20
        best = None
        for trial in range(2):  # two passes; first can absorb tunnel warmup
            t0 = time.perf_counter()
            for _ in range(n_rep):
                eng.training_step(x)
            # one device->host pull at the end syncs the whole chain
            _ = float(
                jnp.sum(
                    jax.tree.leaves(eng.state.params)[0].astype(jnp.float32)
                )
            )
            dt = (time.perf_counter() - t0) / n_rep
            best = dt if best is None else min(best, dt)
        results[batch] = round(batch / best, 1)
        mfu = 3.0 * fwd * results[batch] / 197e12
        detail[str(batch)] = {
            "img_per_sec": results[batch],
            "ms_per_step": round(best * 1e3, 2),
            "est_train_mfu_vs_197tflop_bf16": round(mfu, 4),
        }
        print(f"batch {batch}: {results[batch]} img/s "
              f"({best * 1e3:.1f} ms/step, MFU~{mfu:.2f})", flush=True)
    print(results)
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"sweep": detail,
                       "note": "full production train step (fwd+bwd+Adam+EMA"
                               "+per-t loss bookkeeping), bf16 compute, "
                               "flagship CIFAR UNet, single v5e chip"},
                      f, indent=1)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
    main(out)
