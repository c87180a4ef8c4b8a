"""Extract training throughput + MFU from a finished run's metrics.jsonl.

The train loop logs ``epoch_time_s`` per epoch (train/loop.py); this takes
the steady-state median (epochs after the first, which carries the XLA
compile), converts to img/s and steps/s from the run's own config, and
estimates train-step MFU against the chip's bf16 peak using the analytic
forward FLOP count (utils/profiling.py::unet_flops; backward ~= 2x forward
for conv nets, so train step ~= 3x forward).

    python scripts/extract_train_throughput.py runs/flagship_linear_T1000
"""

import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16_FLOPS = {"v5 lite": 197e12, "v5litepod": 197e12}  # per chip


def main(run_dir: str, peak_flops: float = 197e12):
    run = Path(run_dir)
    try:
        import yaml

        cfg = yaml.safe_load((run / "experiment_config.yaml").read_text())
    except FileNotFoundError:
        print(f"no experiment_config.yaml in {run}", file=sys.stderr)
        return None

    epochs = []
    for line in (run / "metrics.jsonl").read_text().splitlines():
        row = json.loads(line)
        if "epoch_time_s" in row:
            epochs.append((row["epoch"], row["epoch_time_s"]))
    if len(epochs) < 3:
        print("too few epochs logged", file=sys.stderr)
        return None

    steady = [t for e, t in epochs if e > 0]
    med = statistics.median(steady)
    data = cfg.get("data", {})
    n_per_epoch = int(data.get("num_samples_per_epoch") or data.get("n") or 0)
    batch = int(data.get("batch_size", 0))
    steps_per_epoch = n_per_epoch // batch if batch else 0

    model = cfg.get("model", {})
    res = int(cfg.get("engine", {}).get("resolution", 32))
    from probabilisticdeepdiffusionmodels_tpu.utils.profiling import unet_flops

    fwd = unet_flops(
        res,
        int(model.get("in_channels", 3)),
        int(model.get("model_channels", 128)),
        int(model.get("num_res_blocks", 3)),
        model.get("attention_resolutions", [16, 8]),
        model.get("channel_mult", [1, 2, 2, 2]),
        num_heads=int(model.get("num_heads", 4)),
    )
    img_per_sec = n_per_epoch / med
    # fwd + bwd (~2x fwd) per training image
    mfu = 3.0 * fwd * img_per_sec / peak_flops

    result = {
        "run": run.name,
        "epochs_measured": len(steady),
        "median_epoch_s": round(med, 3),
        "first_epoch_s_incl_compile": round(epochs[0][1], 3),
        "imgs_per_epoch": n_per_epoch,
        "steps_per_epoch": steps_per_epoch,
        "train_img_per_sec": round(img_per_sec, 2),
        "train_steps_per_sec": round(steps_per_epoch / med, 3) if med else None,
        "fwd_gflops_per_img": round(fwd / 1e9, 2),
        "est_train_mfu_vs_197tflop_bf16": round(mfu, 4),
    }
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main(*sys.argv[1:2] or ["runs/flagship_linear_T1000"])
