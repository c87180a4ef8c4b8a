"""End-to-end training-LOOP throughput: per-step dispatch vs fused scan.

The step-level sweep (bench_train.py: 62.5 ms/step bf16 = 52% MFU) and the
measured epoch wall (1.44 s for 16 steps = 36% MFU, train_throughput_
flagship_bf16.json) disagree by a ~0.4 s/epoch host floor: per-step
dispatch latency through the remote-TPU tunnel plus synchronous batch
feeding.  This bench measures the REAL loop — fresh host batches every
epoch, loader->device each time — three ways:

  per_step   : engine.training_step per batch (prefetch overlap included)
  fused_K    : engine.training_steps over K-stacked batches (one dispatch)

Usage: python scripts/bench_train_loop.py [--json out.json]   (TPU)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(json_path=None):
    import jax

    from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
    from probabilisticdeepdiffusionmodels_tpu.train.loop import (
        prefetch_to_device,
    )

    batch, steps_per_epoch, epochs = 128, 16, 8
    eng = DiffusionEngine(
        model_config=dict(
            name="unet", in_channels=3, model_channels=128,
            num_res_blocks=3, attention_resolutions=[16, 8],
            channel_mult=[1, 2, 2, 2], num_heads=4,
            compute_dtype="bfloat16",
        ),
        optimizer_config=dict(lr=2e-4), diffusion_steps=1000,
        mode="linear", resolution=32, ema=0.9999,
    )
    rng = np.random.default_rng(0)

    def epoch_batches():
        # fresh host batches each epoch, like a real loader epoch
        for _ in range(steps_per_epoch):
            yield (rng.standard_normal((batch, 32, 32, 3)).astype(np.float32),
                   None)

    results = {}

    # --- per-step path (with the default prefetch overlap) ---------------
    for _ in range(2):  # compile + settle
        for x, y in epoch_batches():
            eng.training_step(x, y)
    jax.block_until_ready(eng.state.params)
    times = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        for x, y in prefetch_to_device(epoch_batches(), eng, 2):
            eng.training_step(x, y)
        jax.block_until_ready(eng.state.step)
        times.append(time.perf_counter() - t0)
    per_step = float(np.median(times))
    results["per_step"] = {
        "s_per_epoch": round(per_step, 3),
        "img_per_sec": round(batch * steps_per_epoch / per_step, 1),
    }
    print("per_step:", results["per_step"], flush=True)

    # --- fused scan, one dispatch per chunk ------------------------------
    for K in (8, 16):
        chunks_per_epoch = steps_per_epoch // K
        xs0 = np.stack([x for x, _ in epoch_batches()][:K])
        eng.training_steps(xs0)  # compile
        jax.block_until_ready(eng.state.step)
        times = []
        for _ in range(epochs):
            t0 = time.perf_counter()
            for _ in range(chunks_per_epoch):
                xs = np.stack([x for x, _ in epoch_batches()][:K])
                eng.training_steps(xs)
            jax.block_until_ready(eng.state.step)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[f"fused_{K}"] = {
            "s_per_epoch": round(dt, 3),
            "img_per_sec": round(batch * steps_per_epoch / dt, 1),
        }
        print(f"fused_{K}:", results[f"fused_{K}"], flush=True)

    # --- device-resident data + fused scan: only indices cross the wire --
    from probabilisticdeepdiffusionmodels_tpu.data import (
        DeviceDataLoader,
        get_dataset,
    )

    ds = get_dataset("synthetic", resolution=32, n=2048, channels=3)
    dev_loader = DeviceDataLoader(
        ds, batch_size=batch, train=True, seed=0,
        transformation_kwargs=dict(normalize="oneone"),
        num_samples_per_epoch=batch * steps_per_epoch,
    )
    import jax.numpy as jnp

    def resident_epoch(fused_k):
        buf = []
        for x, _ in dev_loader:
            if fused_k <= 1:
                eng.training_step(x)
            else:
                buf.append(x)
                if len(buf) == fused_k:
                    eng.training_steps(jnp.stack(buf))
                    buf.clear()

    for name, k in (("resident", 1), ("resident_fused_16", 16)):
        resident_epoch(k)  # compile
        jax.block_until_ready(eng.state.step)
        times = []
        for _ in range(epochs):
            t0 = time.perf_counter()
            resident_epoch(k)
            jax.block_until_ready(eng.state.step)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[name] = {
            "s_per_epoch": round(dt, 3),
            "img_per_sec": round(batch * steps_per_epoch / dt, 1),
        }
        print(f"{name}:", results[name], flush=True)

    # est MFU for the best config (3x fwd FLOPs per train img)
    from probabilisticdeepdiffusionmodels_tpu.utils.profiling import unet_flops
    fwd = unet_flops(resolution=32, in_channels=3, model_channels=128,
                     num_res_blocks=3, attention_resolutions=[16, 8],
                     channel_mult=[1, 2, 2, 2], num_heads=4)
    for v in results.values():
        v["est_mfu_vs_197tflop_bf16"] = round(
            3.0 * fwd * v["img_per_sec"] / 197e12, 4)
    print(results)
    if json_path:
        Path(json_path).write_text(json.dumps(
            {"config": f"flagship bf16, batch {batch}, "
                       f"{steps_per_epoch} steps/epoch, fresh host batches",
             **results}, indent=1) + "\n")
        print(f"wrote {json_path}")


if __name__ == "__main__":
    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
    main(out)
