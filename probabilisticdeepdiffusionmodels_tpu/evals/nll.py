"""Exact NLL (variational bound) evaluation in bits/dim.

TPU-native rewrite of the reference's likelihood evaluator
(reference: src/engine.py:417-506, implementing DDPM eq. (5)):
  * L_0: discretized Gaussian decoder NLL at t=1 (engine.py:492-506)
  * L_intermediate: sum over t=2..T of KL(q(x_{t-1}|x_t,x_0) || p_theta),
    a FRESH noising at each t (engine.py:446-475)
  * L_T: KL(q(x_T|x_0) || N(0, I)) (engine.py:437-444)
All divided by ln 2 -> bits/dim.  The reference runs a T-step Python loop of
separate forward passes; here the whole bound is one lax.scan inside a
single jit — the batch stays in HBM for all T model calls.

Semantics notes for parity:
  * the model mean uses the UNCLIPPED eps->mu path (the reference calls
    model_mean_std with default clip=False at engine.py:461);
  * predicted std is the fixed sigma table entry at t-1 (engine.py:351);
    for learned-sigma models (our IDDPM extension; the reference has none)
    the predicted log-variance is the v-interpolation between beta and
    beta-tilde instead;
  * MSE is collected per t as mean over the raw squared error tensor
    (engine.py:472-473, averaged at engine.py:425).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diffusion as D
from ..core.diffusion import DiffusionTables

__all__ = ["calculate_likelihood"]


def calculate_likelihood(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x0: jax.Array,
    key: jax.Array,
    *,
    sigma_mode: str = "beta",
    y: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Full variational bound for a batch; returns bits/dim terms.

    Output dict: L_0 [B], L_T [B], L_intermediate [B] (summed over t),
    L_intermediate_per_t [T-1, B], nll [B] aggregates, MSE scalar.
    """
    T = tables.diffusion_steps
    b = x0.shape[0]
    ln2 = np.log(2.0)
    sigma_table = tables.sigma_table(sigma_mode)

    # ---- L_T (engine.py:437-444)
    q_mean, q_std = D.q_mean_std(tables, x0, jnp.full((b,), T, jnp.int32))
    L_T = D.mean_flat(D.normal_kl(q_mean, 2.0 * jnp.log(q_std), 0.0, 0.0)) / ln2

    # ---- L_0 (engine.py:492-506)
    key, k0 = jax.random.split(key)
    t1 = jnp.ones((b,), jnp.int32)
    noise0 = jax.random.normal(k0, x0.shape, x0.dtype)
    x_1 = D.q_sample(tables, x0, noise0, t1)
    eps0, v0 = _eps_and_v(apply_fn, params, x_1, t1, y)
    mean0 = D.model_mean_from_epsilon(tables, x_1, t1, eps0)
    if v0 is not None:
        log_scale0 = 0.5 * _learned_logvar(tables, t1, v0, x0.ndim)
    else:
        log_scale0 = jnp.log(sigma_table[0]) * jnp.ones_like(x0)
    L_0 = (
        -D.mean_flat(D.discretized_gaussian_log_likelihood(x0, mean0, log_scale0))
        / ln2
    )

    # ---- L_intermediate: scan over t = 2..T (engine.py:446-475)
    def body(carry_key, t_step):
        carry_key, k = jax.random.split(carry_key)
        t = jnp.full((b,), t_step, jnp.int32)
        noise = jax.random.normal(k, x0.shape, x0.dtype)
        x_t = D.q_sample(tables, x0, noise, t)
        mean_t, var_t = D.q_posterior(tables, t, x0, x_t)

        eps, v = _eps_and_v(apply_fn, params, x_t, t, y)
        pred_mean = D.model_mean_from_epsilon(tables, x_t, t, eps)
        if v is not None:
            pred_logvar = _learned_logvar(tables, t, v, x0.ndim)
        else:
            pred_logvar = 2.0 * jnp.log(D.expand_to(sigma_table, t, x0.ndim))

        kl = D.normal_kl(mean_t, jnp.log(var_t), pred_mean, pred_logvar)
        L_i = D.mean_flat(kl) / ln2
        mse_i = jnp.mean(jnp.square(eps - noise))
        return carry_key, (L_i, mse_i)

    ts = jnp.arange(2, T + 1)
    _, (L_list, mse_list) = jax.lax.scan(body, key, ts)

    L_intermediate = jnp.sum(L_list, axis=0)
    nll = L_0 + L_intermediate + L_T
    return {
        "L_0": L_0,
        "L_T": L_T,
        "L_intermediate": L_intermediate,
        "L_intermediate_per_t": L_list,
        "nll": nll,
        "MSE": jnp.mean(mse_list),
        "MSE_per_t": mse_list,
    }


def _eps_and_v(apply_fn, params, x, t, y):
    out = apply_fn(params, x, t, y)
    if out.shape[-1] == 2 * x.shape[-1]:
        eps, v = jnp.split(out, 2, axis=-1)
        return eps, v
    return out, None


def _learned_logvar(tables, t, v, ndim):
    """IDDPM learned log-variance interpolation (matches the sampler's
    _learned_sigma in sample/sampler.py)."""
    frac = (v + 1.0) / 2.0
    log_beta = jnp.log(D.expand_to(tables.betas, t, ndim))
    log_beta_tilde = D.expand_to(tables.posterior_log_variance_clipped, t, ndim)
    return frac * log_beta + (1.0 - frac) * log_beta_tilde
