"""Inception Score (IS, arXiv:1606.03498 §4).

IS = exp( E_x KL( p(y|x) || p(y) ) ), reported as mean +/- std over
``splits`` equal chunks of the sample set (the standard protocol).

The reference repo scores quality with FID only
(/root/reference/src/modules/fid_score.py); IS is an additional metric of
this framework.  Because the InceptionV3 classifier head is a single
linear layer on the 2048-d pool features (evals/inception.py::
inception_logits), IS here is computed host-side from the SAME teed pool
features the FID/P&R/KID paths already produce — no second Inception
forward: logits = feats @ fc.w + fc.b.

Comparability caveat: with random fallback weights (no
PDDM_INCEPTION_WEIGHTS) the pipeline runs but absolute IS values are not
comparable to published numbers — same caveat as FID.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["inception_score_from_logits", "inception_score_from_features"]


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def inception_score_from_logits(
    logits: np.ndarray, splits: int = 10
) -> Dict[str, float]:
    """IS mean/std over ``splits`` chunks of ``logits`` [n, num_classes].

    Each chunk c: exp( mean_i KL(p(y|x_i) || mean_j p(y|x_j)) ), KL in
    nats.  Chunks shorter than 2 rows are rejected (need a marginal)."""
    logits = np.asarray(logits, np.float64)
    if logits.ndim != 2:
        raise ValueError(f"expected [n, classes] logits, got {logits.shape}")
    n = len(logits)
    splits = int(min(splits, n // 2)) or 1
    if n < 2:
        raise ValueError("need >=2 samples for an inception score")
    # floor: softmax can underflow to exactly 0.0 in float (max-logit
    # margin > ~745), and 0 * log(0) would be NaN; 1e-300 keeps the
    # p*log(p) contribution of such entries at a true ~0
    probs = np.maximum(_softmax(logits), 1e-300)
    scores = []
    for chunk in np.array_split(probs, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = np.sum(chunk * (np.log(chunk) - np.log(marginal)), axis=1)
        scores.append(float(np.exp(kl.mean())))
    scores = np.asarray(scores)
    return {
        "is_mean": float(scores.mean()),
        "is_std": float(scores.std()),
        "is_splits": int(splits),
    }


def inception_score_from_features(
    pool_features: np.ndarray, inception_params: Dict, splits: int = 10
) -> Dict[str, float]:
    """IS from [n, 2048] pool features + the loaded Inception param tree
    (reuses the fc head; see module docstring)."""
    if "fc" not in inception_params:
        raise ValueError(
            "inception param tree has no 'fc' head — re-load weights with "
            "a checkpoint (or random_params) that includes the classifier"
        )
    fc = inception_params["fc"]
    w = np.asarray(fc["w"], np.float64)
    b = np.asarray(fc["b"], np.float64)
    logits = np.asarray(pool_features, np.float64) @ w + b
    return inception_score_from_logits(logits, splits=splits)
