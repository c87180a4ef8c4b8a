"""Consistency distillation and consistency training (Song et al.,
arXiv:2303.01469; iCT improvements arXiv:2310.14189) — the third
few-step family next to progressive distillation (train/distill.py) and
reflow (train/reflow.py), beyond the reference (discrete-T DDPM
training only, src/engine.py:263-307).

Two ways to fit the consistency function f(x, sigma) -> x_{sigma_min}
(math in core/consistency.py):

* DISTILLATION (CD, here): x_hi = x0 + sigma_hi z, one teacher Heun ODE
  step down to x_lo at the adjacent grid sigma, and f(x_hi) is pulled
  toward stopgrad(f(x_lo)).  The teacher can be ANY engine — a
  continuous one (edm, flow) is queried at the exact sigma; a
  table-trained one (epsilon/v/x0) through its eps-view at the nearest
  discrete timestep (the same retrofit heun_sample_loop uses).
* TRAINING (CT, teacher-free): x_lo = x0 + sigma_lo z with the SAME z —
  the unbiased single-sample trajectory estimator; no teacher needed.
  The engine wires this as ``prediction_type="consistency"`` so
  cli.train grows one-step generation as a first-class training mode.

TPU shape: both steps are ONE jitted function over (state, x0[, y]) —
no scan, two or three UNet applies fused into one XLA program; the
teacher's params ride as a traced argument (resident in HBM once).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.consistency import (
    ConsistencyConfig, cm_apply, cm_metric, pair_weight,
)
from ..core.diffusion import DiffusionTables
from ..core.edm import karras_sigma_grid
from .state import TrainState
from .step import global_norm

__all__ = [
    "make_teacher_denoiser", "make_cd_step", "make_ct_train_step",
    "make_ct_eval_step", "consistency_student", "consistency_distill_round",
]


def make_teacher_denoiser(teacher) -> Callable:
    """A uniform VE-coordinate denoiser D(params, x, sigma[b], y) ~=
    E[x0 | x0 + sigma n = x] over any teacher engine:

    * ``edm``: the preconditioned denoiser at the exact sigma
      (core/edm.py eq. 7).
    * ``flow``: the straight interpolant x_t = (1-t) x0 + t e gives
      sigma = t/(1-t); rescale x to the flow frame, query the velocity,
      and read off x0 = x_t - t u (exact, continuous).
    * tables (``epsilon``/``v``/``x0``): eps-view at the NEAREST discrete
      timestep by sigma, then D = x - sigma eps with the exact continuous
      sigma — the heun_sample_loop churn retrofit: exact in scaling,
      approximate only in the conditioning timestep.

    Learned-sigma (hybrid) teachers are rejected by consistency_student
    (2C head is warm-start-incompatible), so eps-view outputs are always
    C channels here.
    """
    pt = teacher.prediction_type
    if pt == "edm":
        from ..core.edm import edm_denoise

        sigma_data = teacher.edm.sigma_data
        raw = teacher._apply_raw

        def denoise(params, x, sigma, y):
            return edm_denoise(raw, params, x, sigma, sigma_data, y)

        return denoise

    if pt == "flow":
        from ..core.flow import TIME_SCALE

        raw = teacher._apply_raw

        def denoise(params, x, sigma, y):
            t = sigma / (1.0 + sigma)  # flow time of VE level sigma
            bshape = (-1,) + (1,) * (x.ndim - 1)
            x_flow = x / (1.0 + sigma.reshape(bshape))
            u = raw(params, x_flow, t * TIME_SCALE, y)
            return x_flow - t.reshape(bshape) * u

        return denoise

    # table-trained teacher through the eps-view
    eps_view = teacher._apply
    tables = teacher.tables

    def denoise(params, x, sigma, y):
        t = _nearest_t_by_sigma(tables, sigma)
        bshape = (-1,) + (1,) * (x.ndim - 1)
        sig = sigma.reshape(bshape)
        x_vp = x / jnp.sqrt(1.0 + jnp.square(sig))  # abar = 1/(1+sigma^2)
        eps = eps_view(params, x_vp, t, y)
        return x - sig * eps

    return denoise


def _pair_draw(cfg: ConsistencyConfig, key, batch: int):
    """Adjacent sigma pairs off the descending Karras grid: per-sample
    uniform index i in [0, N-2], returning (sigma_hi, sigma_lo) = (g[i],
    g[i+1])."""
    g = karras_sigma_grid(
        cfg.grid_size, cfg.sigma_min, cfg.sigma_max, cfg.rho
    )
    hi_tab = jnp.asarray(g[:-1], jnp.float32)
    lo_tab = jnp.asarray(g[1:], jnp.float32)
    i = jax.random.randint(key, (batch,), 0, cfg.grid_size - 1)
    return hi_tab[i], lo_tab[i]


def _anneal_tables(cfg: ConsistencyConfig):
    """Precomputed pair tables for iCT N-annealing (§3.4): one row per
    doubling level grid_init, 2*grid_init, ..., grid_size, each a Karras
    grid of that size padded (with its own last pair) to a common width
    so the whole schedule is ONE static [K, grid_size-1] gather inside
    jit.  Returns (hi[K, W], lo[K, W], n_pairs[K], steps_per_level)."""
    sizes = [cfg.grid_init]
    while sizes[-1] < cfg.grid_size:
        sizes.append(min(sizes[-1] * 2, cfg.grid_size))
    width = cfg.grid_size - 1
    his, los, n_pairs = [], [], []
    for n in sizes:
        g = karras_sigma_grid(n, cfg.sigma_min, cfg.sigma_max, cfg.rho)
        pad = width - (n - 1)
        his.append(np.concatenate([g[:-1], np.full(pad, g[-2])]))
        los.append(np.concatenate([g[1:], np.full(pad, g[-1])]))
        n_pairs.append(n - 1)
    # K levels have K-1 transitions: the LAST level activates at step
    # ~anneal_steps (not (K-1)/K of it), matching the documented "doubles
    # from grid_init to grid_size over anneal_steps"
    steps_per = max(1, int(cfg.anneal_steps) // max(1, len(sizes) - 1))
    return (
        jnp.asarray(np.stack(his), jnp.float32),
        jnp.asarray(np.stack(los), jnp.float32),
        jnp.asarray(n_pairs, jnp.int32),
        steps_per,
    )


def _pair_draw_annealed(cfg: ConsistencyConfig, tabs, key, batch: int,
                        step):
    """Per-sample adjacent pairs from the annealing level active at
    ``step`` (a traced scalar): level = step // steps_per_level, clamped
    to the last level once the schedule is exhausted."""
    hi_tab, lo_tab, n_pairs, steps_per = tabs
    level = jnp.clip(step // steps_per, 0, hi_tab.shape[0] - 1)
    i = jax.random.randint(key, (batch,), 0, n_pairs[level])
    return hi_tab[level, i], lo_tab[level, i], n_pairs[level] + 1


def _sigma_table(tables: DiffusionTables):
    """The schedule's own VE sigma per 1-indexed timestep (ascending)."""
    return jnp.sqrt((1.0 - tables.alphas_hat) / tables.alphas_hat)


def _nearest_t_by_sigma(tables: DiffusionTables, sigma):
    """The 1-indexed timestep whose table sigma is NEAREST to ``sigma``
    in log-sigma (geometric midpoint tie-break) — the conditioning
    lookup for table-teacher denoisers.  A plain searchsorted is a
    ceiling lookup and would bias every off-grid sigma one step high."""
    sig_vp = _sigma_table(tables)
    T = tables.diffusion_steps
    i_hi = jnp.clip(jnp.searchsorted(sig_vp, sigma), 0, T - 1)
    i_lo = jnp.maximum(i_hi - 1, 0)
    log_s = jnp.log(sigma)
    pick_lo = (log_s - jnp.log(sig_vp[i_lo])) <= (
        jnp.log(sig_vp[i_hi]) - log_s
    )
    return jnp.where(pick_lo, i_lo, i_hi).astype(jnp.int32) + 1


def _vp_bucket(tables: DiffusionTables, sigma):
    """Map a continuous sigma onto the engine's discrete VP grid for the
    loss-history ring (logging only; the ceiling convention, same as
    make_edm_train_step's bucketing)."""
    return jnp.clip(
        jnp.searchsorted(_sigma_table(tables), sigma) + 1,
        1, tables.diffusion_steps,
    ).astype(jnp.int32)


def make_cd_step(
    student_apply_raw: Callable,
    denoise_teacher: Callable,
    cfg: ConsistencyConfig,
    tables: DiffusionTables,
) -> Callable[..., Tuple[TrainState, Dict]]:
    """The consistency-distillation step: (state, teacher_params, x0, y)
    -> (state, metrics).

    x_hi = x0 + sigma_hi z; the teacher integrates ONE Heun step of
    dx/dsigma = (x - D(x; sigma))/sigma down to the adjacent grid sigma
    (arXiv:2303.01469 alg. 2 with the Heun solver); the student's
    f(x_hi, sigma_hi) regresses stopgrad(f(x_lo, sigma_lo)) under the
    iCT metric/weighting.  The target network theta^- is stopgrad(theta)
    — the iCT choice (arXiv:2310.14189 §3.2) — or the state's EMA params
    with ``cfg.target="ema"`` (the original CM alg. 2, where theta^- is
    exactly EMA(theta) at the sampling-EMA decay).

    Grid annealing is a CT mechanism (the papers distill on ONE fixed
    grid); rejecting the knob here beats silently ignoring it."""
    cfg.validate()
    if cfg.grid_init:
        raise ValueError(
            "grid_init/anneal_steps (iCT N-annealing) apply to "
            "consistency TRAINING only; distillation uses the fixed "
            f"grid_size={cfg.grid_size} grid — clear grid_init"
        )

    def step(state: TrainState, teacher_params, x0: jax.Array, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_i, key_z = jax.random.split(rng)
        b = x0.shape[0]
        sig_hi, sig_lo = _pair_draw(cfg, key_i, b)
        bshape = (-1,) + (1,) * (x0.ndim - 1)
        hi, lo = sig_hi.reshape(bshape), sig_lo.reshape(bshape)
        z = jax.random.normal(key_z, x0.shape, jnp.float32)
        x_hi = x0 + hi * z

        # one teacher Heun step hi -> lo (both > 0: no terminal special
        # case; the grid never touches sigma=0)
        d1 = (x_hi - denoise_teacher(teacher_params, x_hi, sig_hi, y)) / hi
        x_euler = x_hi + (lo - hi) * d1
        d2 = (
            x_euler - denoise_teacher(teacher_params, x_euler, sig_lo, y)
        ) / lo
        x_lo = jax.lax.stop_gradient(x_hi + (lo - hi) * 0.5 * (d1 + d2))
        tp = _target_params(cfg, state)

        def loss_fn(params):
            pred = cm_apply(student_apply_raw, params, x_hi, sig_hi, y, cfg)
            tgt = jax.lax.stop_gradient(
                cm_apply(
                    student_apply_raw,
                    params if tp is None else tp,
                    x_lo, sig_lo, y, cfg,
                )
            )
            per_sample = pair_weight(sig_hi, sig_lo, cfg.weighting) * \
                cm_metric(pred, tgt, cfg.metric, cfg.huber_c)
            return jnp.mean(per_sample), per_sample

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.replace(
            loss_history=state.loss_history.update(
                _vp_bucket(tables, sig_hi),
                jax.lax.stop_gradient(per_sample),
            )
        )
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "grad_norm": global_norm(grads)}

    return step


def _ct_parts(cfg: ConsistencyConfig, rng, x0, tabs=None, step=None):
    """Shared CT noising: adjacent pair + the SAME z at both levels
    (the theorem-2 unbiased trajectory estimator).  With ``tabs``/
    ``step``, the pair comes from the iCT annealing level active at
    that step; grid_n (the active N) rides along for logging."""
    key_i, key_z = jax.random.split(rng)
    if tabs is not None:
        sig_hi, sig_lo, grid_n = _pair_draw_annealed(
            cfg, tabs, key_i, x0.shape[0], step
        )
    else:
        sig_hi, sig_lo = _pair_draw(cfg, key_i, x0.shape[0])
        grid_n = jnp.asarray(cfg.grid_size, jnp.int32)
    bshape = (-1,) + (1,) * (x0.ndim - 1)
    z = jax.random.normal(key_z, x0.shape, jnp.float32)
    x_hi = x0 + sig_hi.reshape(bshape) * z
    x_lo = x0 + sig_lo.reshape(bshape) * z
    return x_hi, sig_hi, x_lo, sig_lo, grid_n


def _ct_per_sample_loss(apply_fn, params, parts, y, cfg,
                        target_params=None, **kwargs):
    """``target_params`` selects the target network theta^- (defaults to
    ``params`` = the iCT stopgrad choice; pass EMA params for the
    original CM choice)."""
    x_hi, sig_hi, x_lo, sig_lo = parts[:4]
    pred = cm_apply(apply_fn, params, x_hi, sig_hi, y, cfg, **kwargs)
    tgt = jax.lax.stop_gradient(
        cm_apply(
            apply_fn,
            params if target_params is None else target_params,
            x_lo, sig_lo, y, cfg, **kwargs,
        )
    )
    return pair_weight(sig_hi, sig_lo, cfg.weighting) * \
        cm_metric(pred, tgt, cfg.metric, cfg.huber_c)


def _target_params(cfg: ConsistencyConfig, state: TrainState):
    """theta^- per cfg.target: None (= use theta, stopgrad'd by the loss)
    or the state's EMA params (original CM), which must exist."""
    if cfg.target == "stopgrad":
        return None
    if state.ema_params is None:
        raise ValueError(
            'consistency target="ema" needs EMA params: set the '
            "engine's ema decay (or use target=\"stopgrad\", the iCT "
            "default)"
        )
    return state.ema_params


def make_ct_train_step(
    apply_fn: Callable,
    tables: DiffusionTables,
    cfg: ConsistencyConfig,
    *,
    dropout: bool = False,
    watch: bool = False,
    class_dropout_prob: float = 0.0,
    null_class: int = None,
) -> Callable[..., Tuple[TrainState, Dict[str, jax.Array]]]:
    """Teacher-free consistency training (CT, arXiv:2303.01469 §5 with
    the iCT estimator/metric/weighting) — the
    ``prediction_type="consistency"`` twin of make_train_step: same
    optimizer/EMA/metrics plumbing, the loss-history ring bucketed onto
    the VP grid by sigma_hi (logging only).  ``class_dropout_prob``
    composes exactly as everywhere else (CFG training).

    ``cfg.grid_init`` > 0 enables iCT §3.4 N-annealing: the training
    grid doubles from grid_init to grid_size over anneal_steps,
    selected per step INSIDE the one jitted program (a [K, N-1] table
    gather — no retraces); the active N is reported as ``grid_n``.
    ``cfg.target="ema"`` targets the state's EMA params (original CM)
    instead of stopgrad(theta) (iCT)."""
    cfg.validate()
    if class_dropout_prob and null_class is None:
        raise ValueError("class_dropout_prob needs null_class (the index "
                         "of the model's cfg_null_class embedding row)")
    tabs = _anneal_tables(cfg) if cfg.grid_init else None

    def step(state: TrainState, x0: jax.Array, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_noise, key_drop = jax.random.split(rng)
        if class_dropout_prob:
            key_drop, key_cfg = jax.random.split(key_drop)
            drop = jax.random.bernoulli(
                key_cfg, class_dropout_prob, (x0.shape[0],)
            )
            y = jnp.where(drop, jnp.full_like(y, null_class), y)
        parts = _ct_parts(cfg, key_noise, x0, tabs=tabs, step=state.step)
        tp = _target_params(cfg, state)

        def loss_fn(params):
            kwargs = (
                dict(rngs={"dropout": key_drop}, train=True) if dropout else {}
            )
            per_sample = _ct_per_sample_loss(
                apply_fn, params, parts, y, cfg, target_params=tp, **kwargs
            )
            return jnp.mean(per_sample), per_sample

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.replace(
            loss_history=state.loss_history.update(
                _vp_bucket(tables, parts[1]),
                jax.lax.stop_gradient(per_sample),
            )
        )
        state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": global_norm(grads)}
        if tabs is not None:
            metrics["grid_n"] = parts[4]
        if watch:
            metrics["grad_norm_per_module"] = {
                k: global_norm(v) for k, v in grads.items()
            }
        return state, metrics

    return step


def make_ct_eval_step(apply_fn: Callable, tables: DiffusionTables,
                      cfg: ConsistencyConfig) -> Callable:
    """Validation loss for ``prediction_type="consistency"``: the same
    CT objective under a given key, for a given param set, mirroring
    make_eval_step.

    Always SELF-targeted (pred and target from the one given param set,
    stopgrad semantics) regardless of ``cfg.target`` — by design: the
    eval receives a single param set (params or EMA), and the
    self-consistency violation is the one metric comparable across
    target="stopgrad" and target="ema" twins.  Uses the full
    ``grid_size`` grid (no annealing: validation measures the final
    objective)."""
    cfg.validate()

    def step(params, rng: jax.Array, x0: jax.Array, y=None):
        parts = _ct_parts(cfg, rng, x0)
        return jnp.mean(_ct_per_sample_loss(apply_fn, params, parts, y, cfg))

    return step


def consistency_student(teacher, lr: float = None, ema: float = 0.995,
                        consistency_config: Optional[dict] = None,
                        use_ema_teacher: bool = True,
                        warm_start: bool = True):
    """Build the consistency student for distillation: same model config
    and schedule tables as the teacher (the tables only feed the
    loss-history bucketing), ``prediction_type="consistency"``, params
    (and EMA) copied from the teacher when ``warm_start``.

    ``consistency_config`` defaults to the teacher's own sigma frame
    when the teacher is an EDM engine (sigma_data/min/max/rho — so the
    student trains exactly where the teacher is calibrated), else to the
    ConsistencyConfig defaults."""
    from ..engine import DiffusionEngine

    hp = dict(teacher.hparams)
    if dict(hp["model_config"]).get("learn_sigma") or \
            hp.get("loss_type") == "hybrid":
        raise NotImplementedError(
            "distilling a learned-sigma (hybrid) teacher into a "
            "consistency model is not defined: f regresses a C-channel "
            "image, and warm-starting its head from a 2C-channel teacher "
            "conv is shape-incompatible.  Distill an eps/v/x0/edm/flow "
            "teacher."
        )
    if consistency_config is None and teacher.prediction_type == "edm":
        e = teacher.edm
        consistency_config = dict(
            sigma_data=e.sigma_data, sigma_min=e.sigma_min,
            sigma_max=e.sigma_max, rho=e.rho,
        )
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
        prediction_type="consistency",
        consistency_config=consistency_config,
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


def consistency_distill_round(student, teacher, batches,
                              log_every: int = 50, log=print,
                              use_ema_teacher: bool = True) -> Dict:
    """Drive consistency distillation: train ``student`` against one
    teacher Heun step over an iterable of x0 (or (x0, y)) batches.
    Small host loop around one jitted step (teacher params traced —
    resident in HBM once, never retraced).

    ``use_ema_teacher`` selects the teacher weight set for BOTH the
    targets and the student's warm start — pass the same value to
    consistency_student (a silent EMA/raw mismatch degrades the student
    for no visible reason; ADVICE r3)."""
    step = jax.jit(make_cd_step(
        student._apply_raw, make_teacher_denoiser(teacher),
        student.cm, student.tables,
    ), donate_argnums=(0,))
    tp = teacher.params(use_ema=use_ema_teacher)
    state = student.state
    last, n_steps = {}, 0
    for i, batch in enumerate(batches):
        if isinstance(batch, (tuple, list)):
            x0, y = batch
            y = jnp.asarray(np.asarray(y)) if y is not None else None
        else:
            x0, y = batch, None
        x0 = jnp.asarray(np.asarray(x0))
        state, metrics = step(state, tp, x0, y)
        if log_every and (i % log_every == 0):
            log(f"[consistency] step {i} loss={float(metrics['loss']):.5f}")
        last = metrics
        n_steps += 1
    if n_steps == 0:
        raise ValueError("consistency_distill_round got zero batches: "
                         "no training step would run")
    student.state = state
    return {k: float(v) for k, v in last.items()}
