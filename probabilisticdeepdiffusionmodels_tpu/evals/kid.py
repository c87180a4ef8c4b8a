"""Kernel Inception Distance (KID, arXiv:1801.01401).

Unbiased MMD^2 between Inception feature sets under the polynomial kernel
k(x, y) = (x.y / d + 1)^3 — the standard KID kernel.  Unlike FID, the
estimator is unbiased and usable at the few-hundred-sample scale the
sandbox quality studies run at (FID's covariance estimate needs thousands
of samples per side before its bias settles).

The reference repo scores quality with FID only
(/root/reference/src/modules/fid_score.py); KID is an additional metric
of this framework, sharing the same InceptionV3 feature pipeline
(evals/fid.py::_make_feature_fn) and reported alongside FID by
``cli.fid_score`` when requested.

Host-side numpy on the (n, d) feature matrices — the expensive part (the
Inception forward) already ran on device; the kernel sums here are a few
n^2 d flops on subsets.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["polynomial_mmd2", "kernel_inception_distance"]


def _poly_kernel(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(x.y / d + 1)^3 gram block; d = feature dimension."""
    d = a.shape[1]
    return (a @ b.T / d + 1.0) ** 3


def polynomial_mmd2(x: np.ndarray, y: np.ndarray) -> float:
    """Unbiased MMD^2 estimate between feature sets ``x`` (n, d) and ``y``
    (m, d) under the cubic polynomial kernel (arXiv:1801.01401 eq. 2 /
    Gretton et al. 2012 eq. 3: diagonal terms excluded from the
    within-set sums)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, m = len(x), len(y)
    if n < 2 or m < 2:
        raise ValueError(f"need >=2 rows per side for the unbiased "
                         f"estimator, got {n} and {m}")
    k_xx = _poly_kernel(x, x)
    k_yy = _poly_kernel(y, y)
    k_xy = _poly_kernel(x, y)
    return float(
        (k_xx.sum() - np.trace(k_xx)) / (n * (n - 1))
        + (k_yy.sum() - np.trace(k_yy)) / (m * (m - 1))
        - 2.0 * k_xy.mean()
    )


def kernel_inception_distance(
    real: np.ndarray,
    fake: np.ndarray,
    subset_size: int = 1000,
    n_subsets: int = 100,
    seed: int = 0,
) -> Dict[str, float]:
    """KID as mean +/- std of unbiased MMD^2 over ``n_subsets`` random
    subsets of ``subset_size`` rows per side (the reporting protocol of
    arXiv:1801.01401 §3; subsets are drawn without replacement within a
    subset, independently across subsets).

    ``subset_size`` is clamped to the smaller side so small studies work;
    the clamp is reported back in the result.
    """
    real = np.asarray(real)
    fake = np.asarray(fake)
    if real.ndim != 2 or fake.ndim != 2 or real.shape[1] != fake.shape[1]:
        raise ValueError(
            f"expected (n, d) feature matrices with equal d, got "
            f"{real.shape} and {fake.shape}"
        )
    m = int(min(subset_size, len(real), len(fake)))
    if m >= len(real) and m >= len(fake):
        # both pools fit in one subset: every draw is a permutation of the
        # same full sets and MMD^2 is permutation-invariant — compute once
        # and report honestly that there is no subset spread to estimate
        return {
            "kid_mean": polynomial_mmd2(real, fake),
            "kid_std": 0.0,
            "kid_subset_size": m,
            "kid_n_subsets": 1,
        }
    rng = np.random.default_rng(seed)
    vals = np.empty((n_subsets,), np.float64)
    for i in range(n_subsets):
        r = real[rng.choice(len(real), m, replace=False)]
        f = fake[rng.choice(len(fake), m, replace=False)]
        vals[i] = polynomial_mmd2(r, f)
    return {
        "kid_mean": float(vals.mean()),
        "kid_std": float(vals.std()),
        "kid_subset_size": m,
        "kid_n_subsets": int(n_subsets),
    }
