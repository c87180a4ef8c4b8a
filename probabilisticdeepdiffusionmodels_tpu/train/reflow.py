"""Reflow / 2-rectification (Liu et al., "Rectified Flow",
arXiv:2209.03003 §3.2; applied to pretrained models by InstaFlow,
arXiv:2309.06380) — beyond the reference (which trains the discrete-T
DDPM objective only, src/engine.py:263-307): straighten a generative ODE
by retraining a flow-matching student on the teacher's OWN deterministic
couplings (z, x(z)) instead of independent (noise, data) pairs.

Why it works: conditional flow matching trains on straight lines between
*independently paired* noise and data, so the learned marginal velocity
field curves where lines cross.  Sampling the trained ODE yields a
*deterministic* coupling z -> x(z) with the same marginals; retraining
on those pairs ("reflow") provably reduces the transport cost and
straightens the trajectories, so after one round 1-4 Euler steps sample
well — the production recipe behind 1-step InstaFlow/SD3-turbo-style
serving.

Teacher flexibility: ANY engine with a deterministic sampler provides
couplings —
* a flow teacher couples z -> x via its native Euler/Heun ODE;
* an eps/v/x0/edm teacher couples z -> x via the eps-view DDIM (eta=0)
  or DPM-Solver++ chain.
Every deterministic sampler here integrates from exactly the
standard-normal ``x_T`` it is given, so (z, x) is a valid coupling for
the straight-interpolant frame (at the VP chain's t=T end the flow and
VP states coincide up to the marginal-matching scale, core/flow.py).

The student is always a flow engine (``prediction_type="flow"``),
warm-started from the teacher's weights when the model configs match
(the InstaFlow initialization).

TPU shape: coupling generation reuses the engine's cached sampling jits
(one trace per sampler config); training is one jitted step over
(x, z, t) with the same optimizer/EMA/loss-history plumbing as
make_flow_train_step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import DiffusionTables
from ..core.flow import interpolate, sample_t, vp_t_to_flow_t
from .state import TrainState
from .step import global_norm

__all__ = [
    "reflow_student", "make_reflow_step", "generate_couplings",
    "reflow_round",
]


def reflow_student(teacher, lr: float = None, ema: float = 0.995,
                   flow_config: Optional[dict] = None,
                   use_ema_teacher: bool = True, warm_start: bool = True):
    """Build the flow student for one reflow round.

    Same model config and schedule tables as the teacher (the tables
    only serve the student's eps-view/NLL consumers);
    ``prediction_type="flow"``; params (and EMA) copied from the teacher
    when ``warm_start`` (shapes always match — same model config).
    ``flow_config`` defaults to the teacher's own when the teacher is a
    flow engine (so a 2-rectified student keeps the 1-rectified time
    density), else to the FlowConfig defaults.
    """
    from ..engine import DiffusionEngine

    hp = dict(teacher.hparams)
    if dict(hp["model_config"]).get("learn_sigma") or \
            hp.get("loss_type") == "hybrid":
        raise NotImplementedError(
            "reflowing a learned-sigma (hybrid) teacher is not defined: "
            "the flow student regresses a C-channel velocity, and "
            "warm-starting its head from a 2C-channel teacher conv is "
            "shape-incompatible.  Reflow an eps/v/x0/edm/flow teacher."
        )
    if flow_config is None and teacher.flow is not None:
        flow_config = teacher.flow._asdict()
    oc = dict(hp["optimizer_config"])
    if lr is not None:
        oc["lr"] = float(lr)
    student = DiffusionEngine(
        model_config=dict(hp["model_config"]),
        optimizer_config=oc,
        diffusion_steps=teacher.diffusion_steps,
        mode=hp.get("mode", "linear"),
        betas=teacher.schedule.betas,
        sigma_mode=hp.get("sigma_mode", "beta"),
        resolution=hp.get("resolution", 32),
        clip_while_generating=hp.get("clip_while_generating", False),
        ema=ema,
        seed=hp.get("seed", 0),
        prediction_type="flow",
        flow_config=flow_config,
        in_channels=teacher.in_channels,
    )
    if warm_start:
        src = teacher.params(use_ema=use_ema_teacher)
        student.state = student.state.replace(
            params=jax.tree.map(jnp.copy, src),
            ema_params=(
                jax.tree.map(jnp.copy, src)
                if student.state.ema_params is not None else None
            ),
        )
    return student


def make_reflow_step(
    apply_fn: Callable,
    tables: DiffusionTables,
    flow,
) -> Callable[[TrainState, jax.Array, jax.Array, any], Tuple[TrainState, Dict]]:
    """The reflow train step: (state, x, z, y) -> (state, metrics).

    Identical to make_flow_train_step except the endpoints are GIVEN —
    ``x`` is the teacher's sample and ``z`` the exact standard-normal
    that produced it — instead of data paired with fresh noise.  The
    regression target along the line x_t = (1-t) x + t z is its constant
    velocity u = z - x; the per-t loss-history ring keeps filling through
    the VP<->flow bucket map (logging only)."""
    T = tables.diffusion_steps
    t_flow_of_vp = vp_t_to_flow_t(tables.alphas_hat)

    def step(state: TrainState, x: jax.Array, z: jax.Array, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_t, _ = jax.random.split(rng)
        t = sample_t(key_t, x.shape[0], flow)
        x_t, u = interpolate(x, z, t)

        def loss_fn(params):
            # shared helper keeps the TIME_SCALE convention and the
            # per-sample MSE in ONE place with make_flow_train_step
            from .step import _flow_per_sample_loss

            per_sample = _flow_per_sample_loss(
                apply_fn, params, (x_t, t, u), y
            )
            return jnp.mean(per_sample), per_sample

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        t_bucket = jnp.clip(
            jnp.searchsorted(t_flow_of_vp, t) + 1, 1, T
        ).astype(jnp.int32)
        state = state.replace(
            loss_history=state.loss_history.update(
                t_bucket, jax.lax.stop_gradient(per_sample)
            )
        )
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "grad_norm": global_norm(grads)}

    return step


def generate_couplings(teacher, n: int, key: jax.Array, minibatch: int = 64,
                       sampler_kwargs: Optional[dict] = None,
                       use_ema: bool = True, y=None):
    """Deterministic teacher couplings: draw z ~ N(0, I), integrate the
    teacher's ODE from it, return (z, x) as host arrays (paired row-wise).

    ``sampler_kwargs`` picks the deterministic sampler (default: the
    native flow ODE for a flow teacher, DDIM-50 otherwise) and is passed
    straight to ``teacher.generate_images`` along with ``x_T=z``."""
    if sampler_kwargs is None:
        sampler_kwargs = (
            dict(flow=True, num_sample_steps=50)
            if teacher.prediction_type == "flow"
            else dict(ddim=True, num_sample_steps=50)
        )
    shape = (n, *(teacher.resolution,) * teacher.dims, teacher.in_channels)
    z = jax.random.normal(key, shape, jnp.float32)
    x = teacher.generate_images(
        n=n, minibatch=min(minibatch, n), x_T=z, use_ema=use_ema, y=y,
        **sampler_kwargs,
    )
    return np.asarray(z), np.asarray(x)


def reflow_round(student, teacher, key: jax.Array, n_couplings: int = 4096,
                 batch_size: int = 64, epochs: int = 8,
                 minibatch_gen: int = 64,
                 sampler_kwargs: Optional[dict] = None,
                 use_ema_teacher: bool = True, y=None,
                 log_every: int = 50, log=print) -> Dict:
    """Drive one rectification round: generate ``n_couplings`` teacher
    pairs, then train ``student`` over them for ``epochs`` shuffled
    passes.  Small host loop around one jitted step.

    ``y``: optional [n_couplings] labels for a conditional teacher — the
    SAME label conditions the coupling generation and the student step,
    so conditional ODEs rectify per class.  ``use_ema_teacher`` selects
    the teacher weight set for BOTH the couplings and the student's warm
    start (pass the same value to reflow_student)."""
    if n_couplings < batch_size:
        # the drop-last batching below would otherwise run ZERO steps and
        # silently hand back the warm-start weights as a "reflowed" model
        raise ValueError(
            f"n_couplings={n_couplings} < batch_size={batch_size}: "
            "no training step would run"
        )
    key_gen, key_perm = jax.random.split(key)
    log(f"[reflow] generating {n_couplings} couplings "
        f"({sampler_kwargs or 'default deterministic sampler'})")
    z, x = generate_couplings(
        teacher, n_couplings, key_gen, minibatch=minibatch_gen,
        sampler_kwargs=sampler_kwargs, use_ema=use_ema_teacher, y=y,
    )
    y = None if y is None else np.asarray(y)

    step = jax.jit(make_reflow_step(
        student._apply_raw, student.tables, student.flow,
    ), donate_argnums=(0,))
    state = student.state
    last, i = {}, 0
    for ep in range(epochs):
        key_perm, key_ep = jax.random.split(key_perm)
        perm = np.asarray(jax.random.permutation(key_ep, n_couplings))
        for lo in range(0, n_couplings - batch_size + 1, batch_size):
            idx = perm[lo:lo + batch_size]
            state, metrics = step(
                state, jnp.asarray(x[idx]), jnp.asarray(z[idx]),
                None if y is None else jnp.asarray(y[idx]),
            )
            if log_every and (i % log_every == 0):
                log(f"[reflow] epoch {ep} step {i} "
                    f"loss={float(metrics['loss']):.5f}")
            i += 1
            last = metrics
    student.state = state
    return {k: float(v) for k, v in last.items()}
