"""Improved precision & recall for generative models (Kynkäänniemi et
al., arXiv:1904.06991) — beyond the reference, whose only distributional
metric is FID (src/modules/fid_score.py).  Fidelity (precision) and
coverage (recall) separate the two failure modes a single Fréchet number
conflates: precision drops when samples leave the data manifold, recall
drops when the model mode-collapses.

Manifold estimate: a point y is "on" the manifold of a feature set X if
||y - x_j|| <= r_j for some j, where r_j is x_j's distance to its own
k-th nearest neighbour inside X.  precision = fraction of generated
points on the real manifold; recall = fraction of real points on the
generated manifold.

TPU shape: one jitted program per direction — the [N, M] pairwise
distance matrix is a single matmul-shaped reduction (MXU-friendly), the
k-NN radius a lax.top_k.  Works on any feature space (the on-device
InceptionV3 pool features from evals/fid.py, or the interpretable
features the synthetic-data studies use).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["knn_precision_recall"]


def _sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N,D],[M,D] -> [N,M] squared euclidean distances (one matmul)."""
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True)
    return jnp.maximum(aa - 2.0 * (a @ b.T) + bb.T, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def _manifold_fraction(x: jax.Array, y: jax.Array, k: int) -> jax.Array:
    """Fraction of y's rows inside the k-NN manifold of x."""
    d_xx = _sq_dists(x, x)
    # k-th NN excluding self: take k+1 smallest (self-distance 0 included)
    neg_topk = jax.lax.top_k(-d_xx, k + 1)[0]
    radius = -neg_topk[:, k]  # [N] squared radii
    d_yx = _sq_dists(y, x)  # [M, N]
    inside = jnp.any(d_yx <= radius[None, :], axis=1)
    return jnp.mean(inside.astype(jnp.float32))


def knn_precision_recall(real, gen, k: int = 3) -> dict:
    """precision/recall of ``gen`` against ``real`` feature sets [*, D].

    k=3 is the paper's default.  Returns python floats; compute is two
    jitted single-matmul programs (batch if N*M blows HBM — at the 2048-
    sample scales of the study scripts it is one tile)."""
    real = jnp.asarray(np.asarray(real, np.float32))
    gen = jnp.asarray(np.asarray(gen, np.float32))
    assert real.ndim == 2 and gen.ndim == 2 and real.shape[1] == gen.shape[1]
    assert real.shape[0] > k and gen.shape[0] > k, "need more than k points"
    return {
        "precision": float(_manifold_fraction(real, gen, k)),
        "recall": float(_manifold_fraction(gen, real, k)),
    }
