"""Sweep encoder-reuse configurations for sample-quality on a trained model.

For each (k, exact_head, exact_tail) config: sample n images from the same
x_T/z stream as the exact chain and report distributional deltas (std is
the sensitive one — uniform reuse measurably shrinks it) plus RMSE vs
exact.  Used to pick the calibrated configuration that bench.py defaults
to; results land in docs/results/encoder_reuse_sweep.json.

Usage: python scripts/sweep_reuse_quality.py <run_dir> [n_images]
"""

import json
import sys
from pathlib import Path

import numpy as np

CONFIGS = [
    # (k, head, tail, sigma_boost, prior_noise)
    (3, 0, 0, 0.0, 0.0),
    (3, 0, 0, 0.1, 0.0),
    (3, 0, 0, 0.25, 0.0),
    (3, 0, 0, 0.5, 0.0),
    (3, 0, 0, 0.0, 0.002),
    (3, 0, 0, 0.0, 0.005),
    (3, 0, 0, 0.0, 0.01),
]


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/synstudy_linear_T1000"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )

    engine, cfg = load_engine_from_run(run_dir)
    T = engine.diffusion_steps
    seed = 123
    ref = np.asarray(
        engine.generate_images(n=n, minibatch=n, seed=seed, encoder_reuse=1)
    )
    enc_frac = 0.30  # measured encoder share of a step (docs/KERNELS.md)

    out = {"exact": {"mean": float(ref.mean()), "std": float(ref.std())}}
    for k, head, tail, boost, prior in CONFIGS:
        s = np.asarray(
            engine.generate_images(
                n=n, minibatch=n, seed=seed, encoder_reuse=k,
                reuse_exact_head=head, reuse_exact_tail=tail,
                reuse_sigma_boost=boost, reuse_prior_noise=prior,
            )
        )
        assert np.isfinite(s).all()
        mid = T - head - tail - (T - head - tail) % k
        n_exact = T - mid
        # modeled cost: exact steps cost 1, cached steps cost 1-enc_frac
        n_key = mid // k
        cost = (n_exact + n_key + (mid - n_key) * (1 - enc_frac)) / T
        name = f"k{k}_h{head}_t{tail}_g{boost}_l{prior}"
        out[name] = {
            "rmse_vs_exact": round(float(np.sqrt(np.mean((s - ref) ** 2))), 5),
            "std": round(float(s.std()), 5),
            "std_delta_pct": round(
                100 * (float(s.std()) - float(ref.std())) / float(ref.std()), 2
            ),
            "mean_delta": round(abs(float(s.mean()) - float(ref.mean())), 5),
            "modeled_cost_vs_exact": round(cost, 3),
            "modeled_speedup": round(1 / cost, 3),
        }
        print(name, out[name], flush=True)

    dest = Path("docs/results")
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "encoder_reuse_sweep.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
