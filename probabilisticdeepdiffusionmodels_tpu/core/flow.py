"""Flow matching / rectified flow: continuous-time training and sampling
primitives (Lipman et al., "Flow Matching for Generative Modeling",
arXiv:2210.02747; Liu et al., "Rectified Flow", arXiv:2209.03003; the
logit-normal time distribution and resolution shift follow SD3, Esser et
al., arXiv:2403.03206 §3).

Beyond the reference (which trains the discrete-T DDPM objective only,
src/engine.py:263-307): flow matching replaces the curved VP diffusion
path with the straight-line interpolant

    x_t = (1 - t) x0 + t e,      t in (0, 1],  e ~ N(0, I)

and regresses the network onto the constant velocity of that line,
u = e - x0 (the conditional flow-matching objective; for this
interpolant it equals the rectified-flow objective):

    L = E_{t, x0, e} || F(x_t, t) - (e - x0) ||^2.

Sampling integrates the learned ODE dx/dt = F(x, t) from t=1 (noise)
down to t=0 (data) — with straight target trajectories, few Euler steps
go far, which is why this is the parameterization of choice for fast
production serving (SD3, Flux).

The straight path also embeds in the VP family: x_t rescaled by
1/sqrt((1-t)^2 + t^2) is a VP state with abar = (1-t)^2/((1-t)^2+t^2),
i.e. every discrete VP timestep has a flow twin at t = s/(a+s) with
a = sqrt(abar), s = sqrt(1-abar).  That algebra powers the eps-view
(sample/sampler.py::make_flow_to_eps_apply_fn) that lets every
table-driven consumer — ancestral/DDIM/DPM++ loops, the NLL evaluator,
CFG, FID — drive a flow-trained model unchanged.

This module holds the pure math; the train step lives in
train/step.py::make_flow_train_step and the native Euler/Heun sampler in
sample/sampler.py::flow_sample_loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FlowConfig", "TIME_SCALE", "sample_t", "interpolate",
    "flow_time_grid", "vp_t_to_flow_t",
]

# The network's timestep-embedding slot expects O(1..1000) magnitudes
# (core/diffusion.py::timestep_embedding's frequency range is tuned for
# discrete-T inputs); flow time in (0, 1] is fed as t * TIME_SCALE, the
# SD3 convention.  Training and every sampler/view must agree on this.
TIME_SCALE = 1000.0


class FlowConfig(NamedTuple):
    """Flow-matching hyperparameters (defaults = SD3's base recipe,
    arXiv:2403.03206 §3.1: logit-normal time density centered at t=0.5)."""

    # training time distribution: "lognorm" draws t = sigmoid(z),
    # z ~ N(logit_mean, logit_std^2) (SD3 eq. 11); "uniform" draws
    # t ~ U(0, 1) (the original flow-matching / rectified-flow choice)
    t_dist: str = "lognorm"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    # sampling-grid timestep shift (SD3 eq. 23): higher-resolution images
    # need more of the step budget near t=1; shift=1 is the identity
    shift: float = 1.0


def sample_t(key: jax.Array, batch: int, cfg: FlowConfig) -> jax.Array:
    """Per-sample training times in (0, 1) under cfg.t_dist."""
    if cfg.t_dist == "lognorm":
        z = cfg.logit_mean + cfg.logit_std * jax.random.normal(
            key, (batch,), jnp.float32
        )
        return jax.nn.sigmoid(z)
    if cfg.t_dist == "uniform":
        # open interval: t=0 has zero noise (degenerate target weighting
        # is fine, but t=0 wastes a sample), t=1 has no data signal
        u = jax.random.uniform(key, (batch,), jnp.float32)
        return jnp.clip(u, 1e-5, 1.0 - 1e-5)
    raise ValueError(f'unknown t_dist {cfg.t_dist!r} (lognorm | uniform)')


def interpolate(x0: jax.Array, e: jax.Array, t: jax.Array):
    """(x_t, u): the straight-line point and its constant velocity target.

    ``t`` is per-sample (batch,) and broadcasts over the image dims.
    """
    t_img = t.reshape((-1,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
    x_t = (1.0 - t_img) * x0 + t_img * e
    return x_t, e - x0


def flow_time_grid(n: int, shift: float = 1.0) -> np.ndarray:
    """n+1 integration times descending 1 -> 0 for an n-step ODE solve.

    ``shift`` > 1 warps the uniform grid toward t=1 (more steps at high
    noise) via SD3's resolution shift t = shift*u / (1 + (shift-1)*u) —
    monotone, fixes the endpoints 0 and 1.
    """
    if n < 1:
        raise ValueError("need at least 1 sampling step")
    u = np.linspace(1.0, 0.0, n + 1, dtype=np.float64)
    s = float(shift)
    if s <= 0.0:
        raise ValueError("shift must be positive")
    return (s * u) / (1.0 + (s - 1.0) * u)


def vp_t_to_flow_t(alphas_hat: jax.Array) -> jax.Array:
    """Map a VP abar table to the flow times of the same marginals:
    t = s/(a+s) with a = sqrt(abar), s = sqrt(1-abar).  The VP state
    then relates to the flow state by x_flow = x_vp / (a + s)."""
    a = jnp.sqrt(alphas_hat)
    s = jnp.sqrt(1.0 - alphas_hat)
    return s / (a + s)
