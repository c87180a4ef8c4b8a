"""Progressive distillation (Salimans & Ho, arXiv:2202.00512 §3) — beyond
the reference (eps-only, full-T sampling; src/engine.py:399-403): halve
the sampling chain by training a student to match TWO teacher DDIM (eta=0)
steps with ONE of its own.  Repeatedly halving turns a T=1000 teacher into
a few-step sampler at far better quality than naively striding the
original model.

TPU shape: the distillation step is one jitted program — q_sample, two
teacher forwards, the implied one-step target, the student's v-space MSE,
Adam, EMA — with the teacher's (frozen) params passed as a traced argument
so they live once in HBM.

Unit convention: the student is a self-contained engine over the RESPACED
schedule (its beta table realizes the teacher's alpha-bar at every kept
step, sample.respaced_schedule), and is conditioned on its OWN timestep
units 1..T/2 — so every engine endpoint (samplers, NLL, CFG, checkpoints)
works on the student unchanged, with no timestep_map to carry around.
The timestep embedding shift (student t vs teacher 2t) is absorbed during
distillation (the embedding is sinusoidal; the time-MLP adapts).  The
student trains in v-parameterization as the paper prescribes — at few
steps the eps-parameterization is ill-conditioned near t=T where
x0 = (x - sqrt(1-ab)*eps)/sqrt(ab) divides by ab ~ 0.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diffusion as D
from ..core.diffusion import DiffusionTables
from .samplers import sample_uniform
from .state import TrainState

__all__ = ["halved_student", "make_distill_step", "distill_round"]


def halved_student(teacher, lr: float = None, ema: float = 0.995,
                   use_ema_teacher: bool = True):
    """Build the student engine for one halving round.

    Same model config; diffusion_steps = teacher.T // 2 realized by the
    respaced beta table (alpha-bar matches the teacher at even steps);
    prediction_type="v"; params (and EMA) initialized from the teacher's
    weights (the paper's warm start).  Returns the student DiffusionEngine.
    """
    from ..engine import DiffusionEngine
    from ..sample.sampler import respaced_schedule, space_timesteps

    T = teacher.diffusion_steps
    assert T % 2 == 0 and T >= 2, f"cannot halve T={T}"
    if dict(teacher.hparams["model_config"]).get("learn_sigma") or \
            teacher.hparams.get("loss_type") == "hybrid":
        raise NotImplementedError(
            "distilling a learned-sigma (hybrid) teacher is not defined "
            "here: the student regresses a v-space mean target only, and "
            "warm-starting its C-channel head from a 2C-channel teacher "
            "conv is shape-incompatible.  Distill an eps/v/x0 teacher."
        )
    kept = list(range(2, T + 1, 2))
    sub_sched, _ = respaced_schedule(teacher.schedule, kept)

    hp = dict(teacher.hparams)
    mc = dict(hp["model_config"])
    oc = dict(hp["optimizer_config"])
    if lr is not None:
        oc["lr"] = float(lr)
    student = DiffusionEngine(
        model_config=mc,
        optimizer_config=oc,
        diffusion_steps=T // 2,
        mode=f"respaced[{teacher.schedule.mode}]x0.5",
        betas=sub_sched.betas,
        sigma_mode=hp.get("sigma_mode", "beta"),
        resolution=hp.get("resolution", 32),
        clip_while_generating=hp.get("clip_while_generating", False),
        ema=ema,
        seed=hp.get("seed", 0),
        prediction_type="v",
        in_channels=teacher.in_channels,
    )
    src = teacher.params(use_ema=use_ema_teacher)
    student.state = student.state.replace(
        params=jax.tree.map(jnp.copy, src),
        ema_params=(
            jax.tree.map(jnp.copy, src)
            if student.state.ema_params is not None else None
        ),
    )
    return student


def make_distill_step(
    student_apply_raw: Callable,
    teacher_apply_eps: Callable,
    student_tables: DiffusionTables,
    teacher_tables: DiffusionTables,
    clip_target: bool = True,
) -> Callable[[TrainState, jax.Array, any], Tuple[TrainState, Dict]]:
    """Build the jitted distillation step: (state, x0, teacher_params).

    Student timestep t_s ~ U{1..T_s} maps to teacher t_hi = 2*t_s.  The
    teacher runs two eta=0 DDIM steps t_hi -> t_hi-1 -> t_hi-2 from
    z ~ q(x_{t_s} | x0); the student's one-step target is the x0 that
    makes ONE eta=0 DDIM step from z land exactly on the teacher's
    endpoint (paper eq. 9):

        x0* = (z'' - (s_p/s_t) z) / (a_p - (s_p/s_t) a_t)

    (a = sqrt(ab), s = sqrt(1-ab) at the student's source/target levels;
    at t_s=1 the target level is clean, s_p=0, so x0* = z'' directly).
    Loss = MSE in v-space (= the paper's SNR+1-truncated x0 weighting).

    ``clip_target`` clamps x0* to [-1, 1]: at high t the denominator
    a_p - (s_p/s_t) a_t is a difference of small numbers, so an
    inconsistent teacher can imply unbounded x0* — clipping to the data
    range bounds the target (and matches clip_while_generating, which the
    distilled sampler runs with anyway).  A converged teacher's targets
    stay in range, so the clamp is inactive in the paper's regime.
    """
    T_s = student_tables.diffusion_steps
    assert teacher_tables.diffusion_steps == 2 * T_s

    def ddim_step(x, t, eps):
        # one eta=0 DDIM step on the teacher chain (teacher units)
        x0 = D.xstart_from_epsilon(teacher_tables, x, t, eps)
        a_prev = D.expand_to(teacher_tables.alphas_hat_prev, t, x.ndim)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

    def step(state: TrainState, x0: jax.Array, teacher_params, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_t, key_noise = jax.random.split(rng)
        b = x0.shape[0]
        t_s, _ = sample_uniform(key_t, b, T_s)
        noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
        z = D.q_sample(student_tables, x0, noise, t_s)

        # two teacher DDIM steps (teacher units t_hi = 2 t_s); class
        # labels thread through both forwards, so conditional teachers
        # distill into conditional students — and a CFG-wrapped
        # teacher_apply_eps distills GUIDED sampling into one plain
        # forward (Meng et al., arXiv:2210.03142, fixed-w variant)
        c = x0.shape[-1]

        def teacher_eps(x, t):
            out = teacher_apply_eps(teacher_params, x, t, y)
            # a learned-sigma teacher emits [eps | var-interp]; the DDIM
            # steps need only the mean head
            return out[..., :c] if out.shape[-1] == 2 * c else out

        t_hi = 2 * t_s
        z1 = ddim_step(z, t_hi, teacher_eps(z, t_hi))
        z2 = ddim_step(z1, t_hi - 1, teacher_eps(z1, t_hi - 1))
        z2 = jax.lax.stop_gradient(z2)

        # implied one-step student target (student units)
        a_t = D.expand_to(student_tables.alphas_hat_sqrt, t_s, x0.ndim)
        s_t = D.expand_to(student_tables.one_min_alphas_hat_sqrt, t_s, x0.ndim)
        ab_p = D.expand_to(student_tables.alphas_hat_prev, t_s, x0.ndim)
        a_p, s_p = jnp.sqrt(ab_p), jnp.sqrt(1.0 - ab_p)
        ratio = s_p / s_t
        x0_star = (z2 - ratio * z) / (a_p - ratio * a_t)
        if clip_target:
            x0_star = jnp.clip(x0_star, -1.0, 1.0)
        v_star = (a_t * z - x0_star) / s_t

        def loss_fn(params):
            v_pred = student_apply_raw(params, z, t_s, y)
            per_sample = D.mean_flat(jnp.square(v_star - v_pred))
            return jnp.mean(per_sample), per_sample

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.replace(
            loss_history=state.loss_history.update(
                t_s, jax.lax.stop_gradient(per_sample)
            )
        )
        state = state.apply_gradients(grads)
        from .step import global_norm

        return state, {"loss": loss, "grad_norm": global_norm(grads)}

    return step


def distill_round(student, teacher, batches, log_every: int = 50,
                  log=print, guidance_scale=None,
                  use_ema_teacher: bool = True) -> Dict:
    """Drive one halving round: train ``student`` to mimic two-step
    ``teacher`` over an iterable of x0 (or (x0, y)) batches.  Small host
    loop around one jitted step (teacher params passed as a traced arg —
    resident in HBM once, never retraced).

    ``guidance_scale`` distills CLASSIFIER-FREE-GUIDED teacher sampling at
    a fixed scale w into the student's single forward (Meng et al.,
    arXiv:2210.03142, fixed-w variant): the teacher's two DDIM steps run
    through make_cfg_apply_fn, so the student learns the guided score.
    Requires a class-conditional teacher trained with a cfg_null_class
    row, and labeled batches.

    ``use_ema_teacher`` selects which teacher weight set supplies the
    distillation targets — pass the same value given to halved_student so
    the warm start and the targets come from ONE weight set (ADVICE r3:
    a silent EMA/raw mismatch degrades the student for no visible
    reason)."""
    teacher_apply = teacher._apply
    if guidance_scale is not None:
        if not getattr(teacher.model, "cfg_null_class", False):
            raise ValueError(
                "guided distillation needs a teacher trained with "
                "cfg_null_class=True (otherwise the null-half gather "
                "silently clamps to the last real class inside jit)"
            )
        from ..sample.sampler import make_cfg_apply_fn

        teacher_apply = make_cfg_apply_fn(
            teacher_apply, float(guidance_scale), teacher.model.num_classes
        )
    step = jax.jit(make_distill_step(
        student._apply_raw, teacher_apply,
        student.tables, teacher.tables,
    ), donate_argnums=(0,))
    tp = teacher.params(use_ema=use_ema_teacher)
    state = student.state
    last = {}
    for i, batch in enumerate(batches):
        if isinstance(batch, (tuple, list)):
            x0, y = batch
            y = jnp.asarray(np.asarray(y)) if y is not None else None
        else:
            x0, y = batch, None
        if guidance_scale is not None:
            assert y is not None, "guided distillation needs labels"
        x0 = jnp.asarray(np.asarray(x0))
        state, metrics = step(state, x0, tp, y)
        if log_every and (i % log_every == 0):
            log(f"[distill] step {i} loss={float(metrics['loss']):.5f}")
        last = metrics
    student.state = state
    return {k: float(v) for k, v in last.items()}
