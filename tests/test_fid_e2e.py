"""Pinned end-to-end FID path (VERDICT r3 next #4).

Extends the TPU dress rehearsal (docs/results/fid_dress_rehearsal.json)
into a CI-runnable test: a real (random-weight, evals/inception.py
``random_params``) InceptionV3 + the full sample->features->moments->
Frechet pipeline through ``cli.fid_score.main`` itself on a trained tiny
run, asserting the number is finite/stable across two sampling seeds and
that the precision&recall toggle emits P&R.

The moment real weights + real CIFAR exist, the comparable-FID command is
(reference behavior: /root/reference/scripts/fid_score.py:31-71, 10k
samples vs the val split):

    PDDM_INCEPTION_WEIGHTS=/path/to/pt_inception-2015-12-05.npz \
    PDDM_DATA_DIR=/path/to/data \
    python -m probabilisticdeepdiffusionmodels_tpu.cli.fid_score \
        runs/flagship_linear_T1000 true 10000
"""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.cli.train import main as train_main

TINY = [
    "model=unet_small_grey",
    "data=synthetic",
    "data.channels=1",
    "data.n=32",
    "data.batch_size=16",
    "data.transformation_kwargs.normalize=mnist",
    "engine=mnist",
    "engine.resolution=8",
    "engine.diffusion_steps=12",
    "engine.mode=cosine",
    "engine.ema=0.9",
    "trainer.max_epochs=1",
    "trainer.check_val_every_n_epoch=1",
    "trainer.limit_test_batches=1",
    "visualization=none",
    "run_name=fid_e2e",
]


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("runs")
    result = train_main(TINY + [f"out_dir={out_dir}"])
    return result["run_dir"]


@pytest.mark.slow
def test_fid_score_cli_emits_finite_fid_and_pr(tiny_run, capsys):
    from probabilisticdeepdiffusionmodels_tpu.cli.fid_score import main

    # argv: run_dir clip n_samples num_sample_steps devices pr
    rc = main([str(tiny_run), "true", "8", "6", "1", "true"])
    assert rc == 0
    out = capsys.readouterr().out
    fid_line = next(l for l in out.splitlines() if l.startswith("FID:"))
    fid = float(fid_line.split()[1])
    assert np.isfinite(fid) and fid >= 0
    pr_line = next(l for l in out.splitlines() if "precision:" in l)
    prec = float(pr_line.split()[1])
    rec = float(pr_line.split()[3])
    assert 0.0 <= prec <= 1.0 and 0.0 <= rec <= 1.0
    assert "FID pipeline:" in out  # the dressed timing (VERDICT r2 next #6)


@pytest.mark.slow
def test_fid_stable_across_sampling_seeds(tiny_run):
    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.cli.train import build_loaders
    from probabilisticdeepdiffusionmodels_tpu.evals.fid import (
        compute_fid_from_engine,
    )
    from probabilisticdeepdiffusionmodels_tpu.evals.inception import (
        random_params,
    )
    import jax

    engine, run_cfg = load_engine_from_run(str(tiny_run))
    _, val_loader = build_loaders(run_cfg)
    normalize = (run_cfg["data"].get("transformation_kwargs") or {}).get(
        "normalize"
    )
    params = random_params(jax.random.PRNGKey(0))
    fids = [
        compute_fid_from_engine(
            engine, val_loader, n_samples=8, minibatch=8,
            normalize=normalize, num_sample_steps=6, seed=s,
            inception_params=params,
        )
        for s in (0, 1)
    ]
    assert all(np.isfinite(f) and f >= 0 for f in fids), fids
    # same pipeline, different sampling noise: the score must be the same
    # order of magnitude, not a numerical accident of one seed
    lo, hi = sorted(fids)
    assert hi <= 10 * max(lo, 1e-12), fids
