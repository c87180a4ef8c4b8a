"""Consistency models: one/few-step generation by learning the
probability-flow ODE's solution map (Song et al., "Consistency Models",
arXiv:2303.01469; training improvements from "Improved Techniques for
Training Consistency Models" (iCT), arXiv:2310.14189).

Beyond the reference (which trains the discrete-T DDPM objective only,
src/engine.py:263-307, and samples ancestrally at full T,
src/engine.py:385-403): a consistency model f(x, sigma) maps ANY point
of a PF-ODE trajectory straight to the trajectory's endpoint at
sigma_min, so sampling is a single forward pass (or a handful, with
noise re-injection between them).  This completes the few-step trilogy
next to progressive distillation (train/distill.py — halve the chain
round by round) and reflow (train/reflow.py — straighten the ODE, then
take big Euler steps): consistency models keep the teacher's marginals
while compressing the whole solver into the network.

Parameterization (arXiv:2303.01469 app. C): the boundary condition
f(x, sigma_min) = x is built in, not learned —

    f(x, sigma) = c_skip(sigma) x + c_out(sigma) F(c_in(sigma) x,
                                                   c_noise(sigma))
    c_skip = sd^2 / ((sigma - sigma_min)^2 + sd^2)
    c_out  = sd (sigma - sigma_min) / sqrt(sigma^2 + sd^2)
    c_in   = 1 / sqrt(sigma^2 + sd^2)          (sd = sigma_data)
    c_noise = ln(sigma) / 4

c_skip(sigma_min) = 1 and c_out(sigma_min) = 0 exactly, so the boundary
holds for any network output.  c_in/c_noise match the EDM conventions
(core/edm.py) — a student warm-started from an EDM teacher sees the
same input scaling and time conditioning it was trained with.

Training pairs adjacent noise levels sigma_lo < sigma_hi on the
rho-warped Karras grid (core/edm.py::karras_sigma_grid) and pulls
f(x_hi, sigma_hi) toward stopgrad(f(x_lo, sigma_lo)), where x_lo is
* consistency DISTILLATION (CD): one teacher Heun ODE step down from
  x_hi (train/consistency.py::make_cd_step), or
* consistency TRAINING (CT, teacher-free): x0 + sigma_lo z with the
  SAME z that built x_hi = x0 + sigma_hi z — the unbiased trajectory
  estimator (arXiv:2303.01469 thm. 2; train/step.py wires it as the
  engine's prediction_type="consistency" train step).
Both default to the iCT choices: stopgrad(theta) as the target network
theta^- (no separate EMA copy), the pseudo-Huber metric, and the
1/(sigma_hi - sigma_lo) weighting; ``target="ema"`` switches theta^- to
the state's EMA params (the original CM alg. 2/3), and CT can anneal
its grid per iCT §3.4 (``grid_init``/``anneal_steps``).

This module holds the pure math; the CD driver lives in
train/consistency.py and the sampler in
sample/sampler.py::consistency_sample_loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "ConsistencyConfig", "cm_precond", "cm_apply", "cm_metric",
    "pair_weight",
]


class ConsistencyConfig(NamedTuple):
    """Consistency-model hyperparameters (defaults = the papers' CIFAR-10
    settings: sigma range/rho from EDM, grid/metric/weighting from iCT
    §3).  ``grid_size`` is N, the training discretization of [sigma_min,
    sigma_max] — iCT anneals it upward during long CT runs; a fixed
    mid-size grid is the right single choice for distillation."""

    sigma_data: float = 0.5
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    grid_size: int = 32
    # "pseudo_huber" (iCT eq. 5; c<=0 means the dimension default
    # 0.00054*sqrt(D)) or "l2" (the original CD squared error)
    metric: str = "pseudo_huber"
    huber_c: float = 0.0
    # "ict": lambda = 1/(sigma_hi - sigma_lo) (iCT eq. 10); or "none"
    weighting: str = "ict"
    # target network: "stopgrad" (theta^- = stopgrad(theta), the iCT
    # choice) or "ema" (theta^- = the state's EMA params, the original
    # CM alg. 2/3 choice — requires the engine's ema to be set)
    target: str = "stopgrad"
    # iCT §3.4 N-annealing for CT: when grid_init > 0, the training grid
    # DOUBLES from grid_init up to grid_size over anneal_steps optimizer
    # steps (coarse grids early = strong learning signal, fine grids
    # late = low estimator bias).  0 = fixed grid_size (the default; CD
    # always uses the fixed grid).
    grid_init: int = 0
    anneal_steps: int = 0

    def validate(self):
        if not (0.0 < self.sigma_min < self.sigma_max):
            raise ValueError(
                f"need 0 < sigma_min < sigma_max, got "
                f"[{self.sigma_min}, {self.sigma_max}]"
            )
        if self.grid_size < 2:
            raise ValueError("grid_size must be >= 2 (adjacent pairs)")
        if self.metric not in ("pseudo_huber", "l2"):
            raise ValueError(f'unknown metric "{self.metric}"')
        if self.weighting not in ("ict", "none"):
            raise ValueError(f'unknown weighting "{self.weighting}"')
        if self.target not in ("stopgrad", "ema"):
            raise ValueError(f'unknown target "{self.target}"')
        if self.grid_init:
            if not (2 <= self.grid_init <= self.grid_size):
                raise ValueError(
                    f"grid_init={self.grid_init} must be in "
                    f"[2, grid_size={self.grid_size}]"
                )
            if self.anneal_steps < 1:
                raise ValueError("grid annealing needs anneal_steps >= 1")
        return self


def cm_precond(sigma, sigma_data: float, sigma_min: float):
    """Boundary-condition preconditioning coefficients (app. C) for an
    array of sigmas: (c_skip, c_out, c_in, c_noise), each shaped like
    ``sigma``.  c_skip -> 1 and c_out -> 0 exactly at sigma_min."""
    sd2 = sigma_data * sigma_data
    d = sigma - sigma_min
    c_skip = sd2 / (jnp.square(d) + sd2)
    denom = jnp.sqrt(jnp.square(sigma) + sd2)
    c_out = sigma_data * d / denom
    c_in = 1.0 / denom
    c_noise = jnp.log(sigma) / 4.0
    return c_skip, c_out, c_in, c_noise


def cm_apply(apply_fn, params, x, sigma, y, cfg: ConsistencyConfig,
             **kwargs):
    """f(x, sigma) = c_skip x + c_out F(c_in x, c_noise) for a per-sample
    sigma vector [b] (broadcast over trailing dims).  ``apply_fn`` is the
    RAW network — CFG wrapping composes (a lerp on F is a lerp on f:
    affine at fixed x, sigma)."""
    c_skip, c_out, c_in, c_noise = cm_precond(
        sigma, cfg.sigma_data, cfg.sigma_min
    )
    bshape = (-1,) + (1,) * (x.ndim - 1)
    out = apply_fn(params, c_in.reshape(bshape) * x, c_noise, y, **kwargs)
    return c_skip.reshape(bshape) * x + c_out.reshape(bshape) * out


def cm_metric(a, b, metric: str, huber_c: float):
    """Per-sample distance d(a, b): iCT pseudo-Huber
    sqrt(||a-b||_2^2 + c^2) - c (whole-sample L2 norm; c <= 0 selects the
    paper's dimension default 0.00054*sqrt(D)), or plain squared error
    averaged over pixels ("l2", the original CD choice — same scale as
    every other loss here)."""
    axes = tuple(range(1, a.ndim))
    if metric == "l2":
        return jnp.mean(jnp.square(a - b), axis=axes)
    dim = 1
    for s in a.shape[1:]:
        dim *= s
    c = float(huber_c) if huber_c > 0 else 0.00054 * float(dim) ** 0.5
    sq = jnp.sum(jnp.square(a - b), axis=axes)
    return jnp.sqrt(sq + c * c) - c


def pair_weight(sig_hi, sig_lo, weighting: str):
    """lambda(sigma_hi, sigma_lo): iCT's 1/(sigma_hi - sigma_lo) focuses
    the objective on the dense small-sigma end of the rho-warped grid."""
    if weighting == "ict":
        return 1.0 / (sig_hi - sig_lo)
    return jnp.ones_like(sig_hi)
