"""Distributional quality of encoder-reuse sampling vs the training data.

Moment deltas (scripts/sweep_reuse_quality.py) showed uniform encoder reuse
shrinks sample std and that Faster-Diffusion prior-noise injection can
restore it; this script decides whether the *distribution* is restored, not
just one moment.  Real FID needs the pytorch-fid checkpoint (absent in this
zero-egress sandbox), so the metric is a Frechet distance over interpretable
hand-crafted features that the synthetic dataset (sinusoidal plaids,
f in [1,4] cycles) is sensitive to:

  per image: channel means (C), channel stds (C), x/y gradient stds (2),
  radial FFT log-power in 6 bands (6) — smoothing moves band power down,
  over-noising moves it up.

Reported per config: Frechet distance of its feature Gaussian to the
dataset's, alongside the exact sampler's distance (the yardstick) and a
dataset split-half floor.  Writes docs/results/encoder_reuse_frechet.json.

Usage: python scripts/eval_reuse_distributional.py <run_dir> [n_samples]
           [config_set: full|bench] [out_name]
"""

import json
import sys
from pathlib import Path

import numpy as np

CONFIG_SETS = {
    # full lambda-calibration sweep (used on the small-UNet study model)
    "full": [
        ("exact", dict(encoder_reuse=1)),
        ("k3", dict(encoder_reuse=3)),
        ("k3_l0.003", dict(encoder_reuse=3, reuse_prior_noise=0.003)),
        ("k3_l0.004", dict(encoder_reuse=3, reuse_prior_noise=0.004)),
        ("k3_l0.005", dict(encoder_reuse=3, reuse_prior_noise=0.005)),
        ("k2_l0.002", dict(encoder_reuse=2, reuse_prior_noise=0.002)),
    ],
    # exactly bench.py's sampler configuration (250-step respaced chain)
    # against its exact counterpart, plus the full-T pair
    "bench": [
        ("exact", dict(encoder_reuse=1)),
        ("k3", dict(encoder_reuse=3)),
        ("exact_250", dict(encoder_reuse=1, num_sample_steps=250)),
        ("k3_250", dict(encoder_reuse=3, num_sample_steps=250)),
    ],
    # fast samplers (BASELINE config #3): strided ancestral + DDIM
    "fast": [
        ("exact", dict(encoder_reuse=1)),
        ("strided_50", dict(encoder_reuse=1, num_sample_steps=50)),
        ("ddim_50", dict(ddim=True, num_sample_steps=50)),
        ("ddim_50_eta1", dict(ddim=True, ddim_eta=1.0, num_sample_steps=50)),
        ("ddim_50_k3", dict(ddim=True, num_sample_steps=50, encoder_reuse=3)),
    ],
    # round-3 additions: DPM-Solver++(2M) at shrinking step counts (higher
    # order should degrade slower than DDIM), and middle-block caching
    # quality at the bench configuration
    "r3": [
        ("exact", dict(encoder_reuse=1)),
        ("ddim_50", dict(ddim=True, num_sample_steps=50)),
        ("ddim_25", dict(ddim=True, num_sample_steps=25)),
        ("ddim_10", dict(ddim=True, num_sample_steps=10)),
        ("dpmpp_50", dict(dpm_solver=True, num_sample_steps=50)),
        ("dpmpp_25", dict(dpm_solver=True, num_sample_steps=25)),
        ("dpmpp_10", dict(dpm_solver=True, num_sample_steps=10)),
        ("k3_250", dict(encoder_reuse=3, num_sample_steps=250)),
        ("k3_250_midcache", dict(encoder_reuse=3, num_sample_steps=250,
                                 reuse_cache_middle=True)),
    ],
    # parameterization study (round 3): the same sampler menu on an eps-
    # and a v-trained twin (runs/synstudy_linear_T1000{,_v}) — the metric
    # is objective-independent, so the Frechet gap IS the
    # parameterization's effect
    "vstudy": [
        ("exact", dict(encoder_reuse=1)),
        ("ddim_50", dict(ddim=True, num_sample_steps=50)),
        ("dpmpp_10", dict(dpm_solver=True, num_sample_steps=10)),
    ],
    # Karras rho=7 sigma spacing (arXiv:2206.00364) vs uniform stride at
    # the same NFE, on DPM++(2M) and DDIM — does the spacing move the
    # few-step quality floor?
    "karras": [
        ("exact", dict(encoder_reuse=1)),
        ("dpmpp_10", dict(dpm_solver=True, num_sample_steps=10)),
        ("dpmpp_k10", dict(dpm_solver=True, num_sample_steps="karras10")),
        ("dpmpp_25", dict(dpm_solver=True, num_sample_steps=25)),
        ("dpmpp_k25", dict(dpm_solver=True, num_sample_steps="karras25")),
        ("ddim_10", dict(ddim=True, num_sample_steps=10)),
        ("ddim_k10", dict(ddim=True, num_sample_steps="karras10")),
        ("ddim_50", dict(ddim=True, num_sample_steps=50)),
        ("ddim_k50", dict(ddim=True, num_sample_steps="karras50")),
        # EDM Heun (r4): 2 NFE/step — heun_10 grid-matches dpmpp_10/ddim_10
        # (NFE 19), heun_25 NFE-matches ddim_50 (NFE 49)
        ("heun_10", dict(heun=True, num_sample_steps=10)),
        ("heun_k10", dict(heun=True, num_sample_steps="karras10")),
        ("heun_25", dict(heun=True, num_sample_steps=25)),
        ("heun_k25", dict(heun=True, num_sample_steps="karras25")),
    ],
    # EDM-native study (round 4): a twin trained with
    # engine.prediction_type=edm (arXiv:2206.00364 continuous-sigma
    # preconditioned objective) — the native sigma-space Heun sampler
    # at several grid sizes (NFE ~= 2N-1) vs the table-driven eps-views
    # of the SAME model, so the comparison isolates sampler choice from
    # parameterization
    "edm": [
        ("exact", dict(encoder_reuse=1)),
        ("ddim_50", dict(ddim=True, num_sample_steps=50)),
        ("dpmpp_10", dict(dpm_solver=True, num_sample_steps=10)),
        ("edm_10", dict(edm=True, num_sample_steps=10)),
        ("edm_18", dict(edm=True, num_sample_steps=18)),
        ("edm_32", dict(edm=True, num_sample_steps=32)),
        ("edm_18_churn5", dict(edm=True, num_sample_steps=18,
                               edm_churn=5.0)),
    ],
    # flow-matching-native study (round 4): a twin trained with
    # engine.prediction_type=flow (arXiv:2210.02747 straight-line
    # velocity regression) — the native Euler/Heun ODE at several step
    # counts (Euler NFE = N, Heun NFE = 2N — the scan pays the final
    # corrector eval even though it is discarded at t=0) vs the table-driven
    # eps-views of the SAME model, isolating sampler from
    # parameterization exactly like the edm set
    "flow": [
        ("exact", dict(encoder_reuse=1)),
        ("ddim_50", dict(ddim=True, num_sample_steps=50)),
        ("dpmpp_10", dict(dpm_solver=True, num_sample_steps=10)),
        ("flow_10", dict(flow=True, num_sample_steps=10)),
        ("flow_25", dict(flow=True, num_sample_steps=25)),
        ("flow_50", dict(flow=True, num_sample_steps=50)),
        ("flow_h13", dict(flow=True, num_sample_steps=13, flow_heun=True)),
        ("flow_25_shift3", dict(flow=True, num_sample_steps=25,
                                flow_shift=3.0)),
    ],
    # few-step native-flow envelope (round 4): the reflow story — run on
    # a flow teacher AND its reflowed student to measure how much
    # 2-rectification (arXiv:2209.03003) straightens the ODE at 1-10
    # Euler steps
    "fewstep": [
        ("exact", dict(encoder_reuse=1)),
        ("flow_1", dict(flow=True, num_sample_steps=1)),
        ("flow_2", dict(flow=True, num_sample_steps=2)),
        ("flow_4", dict(flow=True, num_sample_steps=4)),
        ("flow_10", dict(flow=True, num_sample_steps=10)),
        ("flow_25", dict(flow=True, num_sample_steps=25)),
    ],
    # consistency-student envelope (round 4): native 1/2/4-step sampling
    # on a consistency-distilled run (arXiv:2303.01469) — comparable
    # arm-for-arm with the "fewstep" flow numbers; no "exact" arm (a
    # consistency model has no eps-view for the ancestral chain)
    "cm": [
        ("cm_1", dict(consistency=True, num_sample_steps=1)),
        ("cm_2", dict(consistency=True, num_sample_steps=2)),
        ("cm_4", dict(consistency=True, num_sample_steps=4)),
    ],
    # EDM Alg.-2 stochastic churn sweep on the Heun solver (r4): does
    # re-noising during integration buy distributional quality on an
    # imperfect model, as EDM reports for small datasets?
    "churn": [
        ("exact", dict(encoder_reuse=1)),
        ("heun_25", dict(heun=True, num_sample_steps=25)),
        ("heun_25_churn2", dict(heun=True, num_sample_steps=25,
                                heun_churn=2.0)),
        ("heun_25_churn5", dict(heun=True, num_sample_steps=25,
                                heun_churn=5.0)),
        ("heun_25_churn10", dict(heun=True, num_sample_steps=25,
                                 heun_churn=10.0)),
        ("heun_10_churn5", dict(heun=True, num_sample_steps=10,
                                heun_churn=5.0)),
    ],
    # probability-flow-ODE convergence check: full-T DDIM (eta=0) and
    # DPM++(2M) discretize the SAME ODE — at T=1000 both must land at its
    # limit, which anchors whether dpmpp's few-step numbers are the
    # solver's fault or the ODE's
    "odecheck": [
        ("ddim_full", dict(ddim=True)),
        ("dpmpp_full", dict(dpm_solver=True)),
        ("ddim_100", dict(ddim=True, num_sample_steps=100)),
        ("dpmpp_100", dict(dpm_solver=True, num_sample_steps=100)),
    ],
}


def features(x: np.ndarray) -> np.ndarray:
    """[N,H,W,C] in [-1,1] -> [N,F] interpretable features."""
    n, h, w, c = x.shape
    feats = [x.mean(axis=(1, 2)), x.std(axis=(1, 2))]  # [N,C] each
    gx = np.diff(x, axis=2).std(axis=(1, 2))  # [N,C] -> mean over C
    gy = np.diff(x, axis=1).std(axis=(1, 2))
    feats += [gx.mean(axis=1, keepdims=True), gy.mean(axis=1, keepdims=True)]
    # radial FFT power bands on the channel-mean image
    g = x.mean(axis=3)
    F = np.abs(np.fft.fftshift(np.fft.fft2(g), axes=(1, 2))) ** 2
    cy, cx = h // 2, w // 2
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    edges = np.linspace(0, h // 2, 7)
    bands = []
    for i in range(6):
        m = (r >= edges[i]) & (r < edges[i + 1])
        bands.append(np.log1p(F[:, m].mean(axis=1)))
    feats.append(np.stack(bands, axis=1))
    return np.concatenate([np.asarray(f, np.float64) for f in feats], axis=1)


def frechet(a: np.ndarray, b: np.ndarray) -> float:
    """Frechet distance between Gaussian fits of two feature sets."""
    import scipy.linalg

    mu1, mu2 = a.mean(0), b.mean(0)
    s1 = np.cov(a, rowvar=False) + 1e-9 * np.eye(a.shape[1])
    s2 = np.cov(b, rowvar=False) + 1e-9 * np.eye(b.shape[1])
    covmean = scipy.linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        ((mu1 - mu2) ** 2).sum() + np.trace(s1 + s2 - 2.0 * covmean)
    )


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/synstudy_linear_T1000"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    configs = CONFIG_SETS[sys.argv[3] if len(sys.argv) > 3 else "full"]
    out_name = (
        sys.argv[4] if len(sys.argv) > 4 else "encoder_reuse_frechet.json"
    )

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.data.datasets import (
        make_synthetic,
    )

    engine, cfg = load_engine_from_run(run_dir)
    dcfg = cfg.get("data", {})
    ds = make_synthetic(
        resolution=int(cfg["engine"]["resolution"]),
        channels=int(dcfg.get("channels", 3)),
        n=int(dcfg.get("n", 2048)),
    )
    data = ds.images.astype(np.float32) / 255.0 * 2.0 - 1.0  # oneone
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(data))
    half = len(data) // 2
    f_data = features(data[perm[:half]])
    f_data2 = features(data[perm[half:]])
    floor = frechet(f_data, f_data2)

    from probabilisticdeepdiffusionmodels_tpu.evals import (
        knn_precision_recall,
    )

    pr_floor = knn_precision_recall(f_data, f_data2)
    out = {
        "n_samples": n,
        "dataset_split_half_floor": round(floor, 4),
        "split_half_precision_recall": {
            k: round(v, 4) for k, v in pr_floor.items()
        },
    }
    # minibatch caps device memory per sampling call: one 128-batch chain
    # at 32^2 is fine, but at 64^2 with the celebahq64 UNet the activation
    # working set crashed the remote TPU worker twice ("kernel fault") —
    # chunk to <= 64 images per call above 32^2
    mb = min(n, 64) if int(cfg["engine"]["resolution"]) > 32 else n
    for name, kw in configs:
        s = np.asarray(
            engine.generate_images(n=n, minibatch=mb, seed=123, **kw)
        )
        assert np.isfinite(s).all(), f"non-finite at {name}"
        f_s = features(s)
        d = frechet(f_data, f_s)
        pr = knn_precision_recall(f_data, f_s)
        out[name] = {"frechet_to_data": round(d, 4),
                     "std": round(float(s.std()), 5),
                     "precision": round(pr["precision"], 4),
                     "recall": round(pr["recall"], 4)}
        print(name, out[name], flush=True)

    dest = Path("docs/results")
    dest.mkdir(parents=True, exist_ok=True)
    (dest / out_name).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
