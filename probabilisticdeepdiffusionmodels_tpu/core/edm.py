"""EDM: continuous-sigma diffusion training and sampling primitives
(Karras et al., "Elucidating the Design Space of Diffusion-Based
Generative Models", arXiv:2206.00364).

Beyond the reference (which trains the discrete-T DDPM objective only,
src/engine.py:263-307): EDM reframes the model as a *denoiser*
D(x; sigma) ~= E[x0 | x0 + sigma*n = x] over a continuous noise scale,
with an input/output preconditioning that keeps the network's effective
inputs and targets unit-variance at every sigma (§5, eq. 7):

    D(x; sigma) = c_skip(sigma) x + c_out(sigma) F(c_in(sigma) x,
                                                   c_noise(sigma))
    c_skip = sd^2 / (sigma^2 + sd^2)          (sd = sigma_data)
    c_out  = sigma sd / sqrt(sigma^2 + sd^2)
    c_in   = 1 / sqrt(sigma^2 + sd^2)
    c_noise = ln(sigma) / 4

Training (§5, eq. 8): sigma is drawn log-normally (ln sigma ~
N(P_mean, P_std^2)) and the denoising loss is weighted by
lambda(sigma) = (sigma^2 + sd^2) / (sigma sd)^2 — exactly 1/c_out^2, so
the effective regression target of the raw network F is unit-variance.

Sampling (§3, Table 1 + Alg. 2): the probability-flow ODE in sigma space
is dx/dsigma = (x - D(x; sigma))/sigma, integrated with Heun's 2nd-order
method over the rho-warped grid

    sigma_i = (sigma_max^(1/rho) + i/(N-1) (sigma_min^(1/rho)
               - sigma_max^(1/rho)))^rho,   sigma_N = 0.

This module holds the pure math (NumPy/JAX-agnostic scalars in, arrays
out); the train step lives in train/step.py::make_edm_train_step, the
sampler in sample/sampler.py::edm_sample_loop, and the table-driven
compatibility view (so every discrete-T consumer — ancestral/DDIM/DPM++
loops, NLL, CFG, FID — can drive an EDM-trained model) in
sample/sampler.py::make_edm_to_eps_apply_fn.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "EDMConfig", "precond", "edm_denoise", "loss_weight",
    "karras_sigma_grid",
]


class EDMConfig(NamedTuple):
    """EDM hyperparameters (defaults = the paper's CIFAR-10 config,
    arXiv:2206.00364 Table 1 "EDM" column; sigma_data = 0.5 assumes data
    normalized to roughly unit range, e.g. the `oneone` normalization)."""

    sigma_data: float = 0.5
    # training sigma distribution: ln sigma ~ N(P_mean, P_std^2)
    P_mean: float = -1.2
    P_std: float = 1.2
    # sampling grid range + warp
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0


def precond(sigma, sigma_data: float):
    """EDM preconditioning coefficients (eq. 7) for an array of sigmas.

    Returns (c_skip, c_out, c_in, c_noise), each the same shape as
    ``sigma``.  All four are smooth and well-defined for sigma > 0.
    """
    sd2 = sigma_data * sigma_data
    s2 = jnp.square(sigma)
    denom = s2 + sd2
    c_skip = sd2 / denom
    c_out = sigma * sigma_data / jnp.sqrt(denom)
    c_in = 1.0 / jnp.sqrt(denom)
    c_noise = jnp.log(sigma) / 4.0
    return c_skip, c_out, c_in, c_noise


def edm_denoise(apply_fn, params, x, sigma, sigma_data: float, y=None,
                **kwargs):
    """D(x; sigma) = c_skip x + c_out F(c_in x, c_noise) — the one
    composition of eq. 7 with the raw network, shared by the native
    sampler, the consistency teacher denoiser, and the exact ODE
    likelihood (a convention change lands in ONE place; the eps-view
    wrapper keeps its own fused copy because its feature/cache
    passthrough interleaves with the composition).  ``sigma`` is a
    scalar (one noise level for the whole batch) or a per-sample [b]
    vector; the conditioning vector is always [b]."""
    sigma = jnp.asarray(sigma, jnp.float32)
    c_skip, c_out, c_in, c_noise = precond(sigma, sigma_data)
    b = x.shape[0]
    t_vec = jnp.broadcast_to(jnp.atleast_1d(c_noise), (b,))
    if sigma.ndim:  # per-sample: broadcast coefficients over the image
        bshape = (-1,) + (1,) * (x.ndim - 1)
        c_skip, c_out, c_in = (
            c.reshape(bshape) for c in (c_skip, c_out, c_in)
        )
    out = apply_fn(params, c_in * x, t_vec, y, **kwargs)
    return c_skip * x + c_out * out


def loss_weight(sigma, sigma_data: float):
    """lambda(sigma) = (sigma^2 + sd^2)/(sigma sd)^2 (eq. 8).  Satisfies
    lambda * c_out^2 == 1, making the raw-network regression target
    unit-variance at every sigma (tested in tests/test_edm.py)."""
    sd2 = sigma_data * sigma_data
    s2 = jnp.square(sigma)
    return (s2 + sd2) / (s2 * sd2)


def karras_sigma_grid(
    n: int, sigma_min: float = 0.002, sigma_max: float = 80.0,
    rho: float = 7.0,
) -> np.ndarray:
    """The EDM sampling grid (eq. 5): ``n`` sigmas, descending from
    sigma_max to sigma_min, warped by rho (larger rho spends more steps
    at small sigma).  The terminal sigma=0 is NOT included — samplers
    append it (the last integration step targets the clean image).

    Distinct from sample/space_timesteps' "karrasN" mode, which *snaps*
    this grid onto an existing discrete schedule's sigma table; this is
    the continuous grid an EDM-trained denoiser is evaluated on directly.
    """
    if n < 1:
        raise ValueError("need at least 1 sampling step")
    if n == 1:
        return np.asarray([float(sigma_max)])
    inv = 1.0 / rho
    ramp = np.linspace(0.0, 1.0, n, dtype=np.float64)
    grid = (sigma_max**inv + ramp * (sigma_min**inv - sigma_max**inv)) ** rho
    return grid.astype(np.float64)
