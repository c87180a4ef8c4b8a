"""The jitted training / validation step.

Fuses into one XLA program what the reference splits across
``Engine.training_step`` (src/engine.py:279-307), the timestep sampler call
(engine.py:282), ``get_q_t`` noising (engine.py:283-284), the loss with
optional importance weights (``get_loss``, engine.py:263-277), Lightning's
backward + Adam step, the EMA update (engine.py:217-224) and the per-t loss
bookkeeping the reference does on the host with a forced GPU->CPU sync each
step (engine.py:268-271) — here a device-side scatter into the
LossHistory ring.

Loss semantics preserved exactly:
  * eps-prediction MSE, per-sample mean over pixels (mean_flat of squared
    error, engine.py:266);
  * weighted path SUMS w*loss, unweighted path MEANS (engine.py:274-277);
    during importance warmup w == 1/B so both coincide.

Extension (off by default, BASELINE config #2): ``loss_type='hybrid'`` adds
the IDDPM L_vlb term with a learned-sigma head (model out_channels == 2*C:
eps and the v-interpolation of log-variance), with stop-gradient on the mean
inside the vlb term as in IDDPM.  The reference hard-codes learn_sigma=False
(src/modules/__init__.py:34-39); we default to parity.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import diffusion as D
from ..core.diffusion import DiffusionTables
from .samplers import sample_importance, sample_uniform
from .state import TrainState

__all__ = [
    "make_train_step",
    "make_fused_train_step",
    "make_eval_step",
    "make_edm_train_step",
    "make_edm_eval_step",
    "make_flow_train_step",
    "make_flow_eval_step",
    "global_norm",
]


def make_fused_train_step(step):
    """Fuse K train steps into ONE program: a ``lax.scan`` of ``step`` over
    stacked ``[K, B, ...]`` batches.

    Identical math and RNG stream to K sequential ``step`` calls — each
    iteration folds ``state.rng`` with ``state.step``, which increments
    inside the scan exactly as it does between dispatches — but the host
    issues ONE dispatch and ONE transfer per chunk instead of K.  (Not
    bitwise vs the solo-jitted step: XLA fuses the scan body differently,
    reassociating float ops at the ~1e-6 level.)  On a
    remote-TPU tunnel (per-dispatch latency ~10s of ms) this removes the
    host-side floor that kept the 16-step synthetic epochs at ~1.5 s wall
    regardless of compute dtype (docs/KERNELS.md training section); on
    local hardware it still collapses K dispatch overheads.

    ``step`` must be the UNJITTED step builder output (jit the fused fn
    instead); metrics come back stacked along axis 0, one row per step.
    """

    def fused(state, xs, ys=None):
        if ys is None:
            def body(st, x):
                return step(st, x, None)
            return jax.lax.scan(body, state, xs)

        def body(st, xy):
            return step(st, xy[0], xy[1])

        return jax.lax.scan(body, state, (xs, ys))

    return fused


def global_norm(tree) -> jax.Array:
    """Global L2 norm over a pytree (reference compute_grad_norm,
    src/engine.py:332-346)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def _vlb_term(tables, params, apply_fn, x0, x_t, t, eps_pred, v_pred):
    """IDDPM L_vlb for one (x0, x_t, t) with learned sigma interpolation.

    log sigma^2 = v*log(beta_t) + (1-v)*log(beta_tilde_t); KL against the
    true posterior, in bits/dim; L_0 via the discretized decoder at t==1.
    Mean uses stop_grad(eps) so L_vlb only trains the variance head.
    """
    frac = (v_pred + 1.0) / 2.0
    log_beta = jnp.log(D.expand_to(tables.betas, t, x0.ndim))
    log_beta_tilde = D.expand_to(tables.posterior_log_variance_clipped, t, x0.ndim)
    model_logvar = frac * log_beta + (1.0 - frac) * log_beta_tilde

    eps_sg = jax.lax.stop_gradient(eps_pred)
    model_mean = D.model_mean_from_epsilon(tables, x_t, t, eps_sg)

    true_mean, true_var = D.q_posterior(tables, t, x0, x_t)
    kl = D.normal_kl(true_mean, jnp.log(true_var), model_mean, model_logvar)
    kl = D.mean_flat(kl) / jnp.log(2.0)

    decoder_nll = -D.discretized_gaussian_log_likelihood(
        x0, model_mean, 0.5 * model_logvar
    )
    decoder_nll = D.mean_flat(decoder_nll) / jnp.log(2.0)

    return jnp.where(t == 1, decoder_nll, kl)


def _pred_target(tables, prediction_type, x0, noise, t):
    """Training target per parameterization: eps (reference), v
    (arXiv:2202.00512), or x0 (improved-diffusion ``predict_xstart``)."""
    if prediction_type == "epsilon":
        return noise
    if prediction_type == "v":
        return D.v_target(tables, x0, noise, t)
    return x0  # "x0" (validated by the callers)


def _pred_to_eps(tables, prediction_type, x_t, t, pred):
    """Convert a native prediction head to eps (for the vlb term)."""
    if prediction_type == "epsilon":
        return pred
    if prediction_type == "v":
        return D.eps_from_v(tables, x_t, t, pred)
    return D.eps_from_xstart(tables, x_t, t, pred)


def make_train_step(
    apply_fn: Callable,
    tables: DiffusionTables,
    *,
    sampling: str = "uniform",
    min_counts: int = 10,
    loss_type: str = "simple",
    vlb_weight: float = 1e-3,
    dropout: bool = False,
    watch: bool = False,
    class_dropout_prob: float = 0.0,
    null_class: int = None,
    prediction_type: str = "epsilon",
    loss_weighting: str = "none",
    snr_gamma: float = 5.0,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the pure train step: (state, x0 [, y]) -> (state, metrics).

    jit/pjit this once; under a Mesh with the batch sharded over 'data' the
    XLA SPMD partitioner inserts the gradient all-reduce over ICI.

    ``class_dropout_prob`` p > 0 enables classifier-free-guidance training
    (Ho & Salimans, arXiv:2207.12598): each label is independently replaced
    by ``null_class`` (the model's reserved ``cfg_null_class`` embedding
    row) with probability p, so one model learns both the conditional and
    the unconditional score.  Requires labels every step.

    ``prediction_type``: "epsilon" (reference semantics), "v"
    (arXiv:2202.00512: regress v = sqrt(ab)*eps - sqrt(1-ab)*x0), or "x0"
    (improved-diffusion ``predict_xstart``: regress the clean image) —
    each an SNR-dependent loss reweighting; inference converts back via
    sample.make_{v,x0}_to_eps_apply_fn.

    ``loss_weighting``: "none" (reference semantics) or "min_snr"
    (arXiv:2303.09556) — multiply the per-sample MSE by the clamped-SNR
    weight ``snr_gamma`` before reduction.  Applied to the objective
    itself, so the loss history (and thus importance sampling) tracks the
    weighted loss actually being optimized.
    """
    T = tables.diffusion_steps
    if sampling not in ("uniform", "importance"):
        raise ValueError(f'Unknown sampling option: "{sampling}"')
    if class_dropout_prob and null_class is None:
        raise ValueError("class_dropout_prob needs null_class (the index "
                         "of the model's cfg_null_class embedding row)")
    if prediction_type not in ("epsilon", "v", "x0"):
        raise ValueError(f'Unknown prediction_type: "{prediction_type}"')
    if loss_weighting not in ("none", "min_snr"):
        raise ValueError(f'Unknown loss_weighting: "{loss_weighting}"')

    def step(state: TrainState, x0: jax.Array, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_t, key_noise, key_drop = jax.random.split(rng, 3)
        b = x0.shape[0]

        if class_dropout_prob:
            # split off the CFG stream from key_drop so the t/noise streams
            # (and therefore all non-CFG runs) stay bitwise unchanged
            key_drop, key_cfg = jax.random.split(key_drop)
            drop = jax.random.bernoulli(key_cfg, class_dropout_prob, (b,))
            y = jnp.where(drop, jnp.full_like(y, null_class), y)

        if sampling == "importance":
            t, weights = sample_importance(key_t, b, state.loss_history, min_counts)
        else:
            t, weights = sample_uniform(key_t, b, T)

        noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
        x_t = D.q_sample(tables, x0, noise, t)
        target = _pred_target(tables, prediction_type, x0, noise, t)

        def loss_fn(params):
            kwargs = dict(rngs={"dropout": key_drop}, train=True) if dropout else {}
            out = apply_fn(params, x_t, t, y, **kwargs)
            if loss_type == "hybrid":
                eps_pred, v_pred = jnp.split(out, 2, axis=-1)
            else:
                eps_pred, v_pred = out, None
            per_sample = D.mean_flat(jnp.square(target - eps_pred))
            if loss_weighting == "min_snr":
                per_sample = per_sample * D.min_snr_weight(
                    tables, t, snr_gamma, prediction_type
                )
            if weights is not None:
                loss = jnp.sum(weights * per_sample)  # engine.py:274-275
            else:
                loss = jnp.mean(per_sample)           # engine.py:276-277
            aux = {"mse_per_sample": per_sample}
            if loss_type == "hybrid":
                # the vlb term is eps-parameterized; under "v"/"x0" the
                # model's first head must be converted for the posterior
                vlb_eps = _pred_to_eps(
                    tables, prediction_type, x_t, t, eps_pred
                )
                vlb = _vlb_term(tables, params, apply_fn, x0, x_t, t, vlb_eps, v_pred)
                loss = loss + vlb_weight * jnp.mean(vlb)
                aux["vlb"] = jnp.mean(vlb)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        new_history = state.loss_history.update(
            t, jax.lax.stop_gradient(aux["mse_per_sample"])
        )
        state = state.replace(loss_history=new_history)
        state = state.apply_gradients(grads)

        metrics = {
            "loss": loss,
            "grad_norm": global_norm(grads),
        }
        if watch:
            # per-module gradient norms, on device (the reference gets
            # gradient histograms from wandb logger.watch,
            # scripts/train.py:136-137; scalars per top-level module are the
            # sync-free equivalent)
            metrics["grad_norm_per_module"] = {
                k: global_norm(v) for k, v in grads.items()
            }
        if "vlb" in aux:
            metrics["vlb"] = aux["vlb"]
        return state, metrics

    return step


def make_eval_step(
    apply_fn: Callable, tables: DiffusionTables,
    prediction_type: str = "epsilon",
    loss_weighting: str = "none",
    snr_gamma: float = 5.0,
) -> Callable:
    """Validation loss (uniform t, no weights, no dropout), computed for a
    given param set — callers pass params or ema_params to reproduce the
    reference's val_loss / val_loss_no_ema pair (src/engine.py:309-330).
    Under ``prediction_type="v"`` the loss targets v (matching training);
    ``loss_weighting="min_snr"`` applies the same objective reweighting as
    the train step so val_loss stays comparable (early stopping / best-k
    checkpointing monitor it)."""
    T = tables.diffusion_steps
    if prediction_type not in ("epsilon", "v", "x0"):
        raise ValueError(f'Unknown prediction_type: "{prediction_type}"')

    def step(params, rng: jax.Array, x0: jax.Array, y=None):
        key_t, key_noise = jax.random.split(rng)
        t, _ = sample_uniform(key_t, x0.shape[0], T)
        noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
        x_t = D.q_sample(tables, x0, noise, t)
        target = _pred_target(tables, prediction_type, x0, noise, t)
        out = apply_fn(params, x_t, t, y)
        pred = (
            jnp.split(out, 2, axis=-1)[0] if out.shape[-1] == 2 * x0.shape[-1] else out
        )
        per_sample = D.mean_flat(jnp.square(target - pred))
        if loss_weighting == "min_snr":
            per_sample = per_sample * D.min_snr_weight(
                tables, t, snr_gamma, prediction_type
            )
        return jnp.mean(per_sample)

    return step


def _edm_noise_and_precond(edm, key_sig, key_noise, x0):
    """Shared EDM noising: draw sigma log-normally (arXiv:2206.00364
    eq. 8: ln sigma ~ N(P_mean, P_std^2)), noise x0 in sigma space, and
    return everything the preconditioned loss needs."""
    from ..core.edm import loss_weight, precond

    b = x0.shape[0]
    ln_sigma = edm.P_mean + edm.P_std * jax.random.normal(key_sig, (b,))
    sigma = jnp.exp(ln_sigma)
    sig_img = sigma.reshape((b,) + (1,) * (x0.ndim - 1))
    noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
    x_sigma = x0 + sig_img * noise
    c_skip, c_out, c_in, c_noise = precond(sig_img, edm.sigma_data)
    w = loss_weight(sigma, edm.sigma_data)
    return x_sigma, sigma, c_skip, c_out, c_in, c_noise.reshape((b,)), w


def _edm_per_sample_loss(apply_fn, params, edm_parts, x0, y, **kwargs):
    """lambda(sigma) * mean_pixels (D(x_sigma; sigma) - x0)^2 per sample."""
    x_sigma, _, c_skip, c_out, c_in, c_noise, w = edm_parts
    out = apply_fn(params, c_in * x_sigma, c_noise, y, **kwargs)
    denoised = c_skip * x_sigma + c_out * out
    return w * D.mean_flat(jnp.square(denoised - x0))


def make_edm_train_step(
    apply_fn: Callable,
    tables: DiffusionTables,
    edm,
    *,
    dropout: bool = False,
    watch: bool = False,
    class_dropout_prob: float = 0.0,
    null_class: int = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """The continuous-sigma EDM train step (arXiv:2206.00364 §5), the
    ``prediction_type="edm"`` twin of make_train_step: same optimizer /
    EMA / metrics plumbing, but sigma is drawn log-normally per sample
    instead of a discrete t, the state is noised in sigma space
    (x = x0 + sigma n — VE coordinates, no sqrt(ab) scaling), and the
    loss is the preconditioned denoising objective

        lambda(sigma) || c_skip x + c_out F(c_in x, c_noise) - x0 ||^2,

    whose effective raw-network target is unit-variance at every sigma.

    The per-t loss-history ring (quartile logging) is kept live by
    bucketing each sigma onto the engine's discrete VP grid
    (t = searchsorted over the schedule's own sigma table) — logging
    only; importance sampling over sigma is a different mechanism
    (P_mean/P_std already encode EDM's importance choice) and the engine
    rejects sampling="importance" with EDM.  ``class_dropout_prob``
    composes exactly as in make_train_step (CFG training).

    ``tables`` is used ONLY for the history bucketing.
    """
    if class_dropout_prob and null_class is None:
        raise ValueError("class_dropout_prob needs null_class (the index "
                         "of the model's cfg_null_class embedding row)")
    T = tables.diffusion_steps
    # ascending-in-t VP sigma table for the history bucket map
    sig_vp = jnp.sqrt((1.0 - tables.alphas_hat) / tables.alphas_hat)

    def step(state: TrainState, x0: jax.Array, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_sig, key_noise, key_drop = jax.random.split(rng, 3)

        if class_dropout_prob:
            key_drop, key_cfg = jax.random.split(key_drop)
            drop = jax.random.bernoulli(
                key_cfg, class_dropout_prob, (x0.shape[0],)
            )
            y = jnp.where(drop, jnp.full_like(y, null_class), y)

        parts = _edm_noise_and_precond(edm, key_sig, key_noise, x0)
        sigma = parts[1]

        def loss_fn(params):
            kwargs = (
                dict(rngs={"dropout": key_drop}, train=True) if dropout else {}
            )
            per_sample = _edm_per_sample_loss(
                apply_fn, params, parts, x0, y, **kwargs
            )
            return jnp.mean(per_sample), {"mse_per_sample": per_sample}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        t_bucket = jnp.clip(
            jnp.searchsorted(sig_vp, sigma) + 1, 1, T
        ).astype(jnp.int32)
        new_history = state.loss_history.update(
            t_bucket, jax.lax.stop_gradient(aux["mse_per_sample"])
        )
        state = state.replace(loss_history=new_history)
        state = state.apply_gradients(grads)

        metrics = {"loss": loss, "grad_norm": global_norm(grads)}
        if watch:
            metrics["grad_norm_per_module"] = {
                k: global_norm(v) for k, v in grads.items()
            }
        return state, metrics

    return step


def make_edm_eval_step(apply_fn: Callable, edm) -> Callable:
    """Validation loss for ``prediction_type="edm"``: the same
    preconditioned objective under the same log-normal sigma draw, for a
    given param set (params / ema_params), mirroring make_eval_step."""

    def step(params, rng: jax.Array, x0: jax.Array, y=None):
        key_sig, key_noise = jax.random.split(rng)
        parts = _edm_noise_and_precond(edm, key_sig, key_noise, x0)
        return jnp.mean(
            _edm_per_sample_loss(apply_fn, params, parts, x0, y)
        )

    return step


def _flow_per_sample_loss(apply_fn, params, flow_parts, y, **kwargs):
    """mean_pixels (F(x_t, t*TIME_SCALE) - (e - x0))^2 per sample."""
    from ..core.flow import TIME_SCALE

    x_t, t, u = flow_parts
    out = apply_fn(params, x_t, t * TIME_SCALE, y, **kwargs)
    return D.mean_flat(jnp.square(out - u))


def make_flow_train_step(
    apply_fn: Callable,
    tables: DiffusionTables,
    flow,
    *,
    dropout: bool = False,
    watch: bool = False,
    class_dropout_prob: float = 0.0,
    null_class: int = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """The flow-matching train step (arXiv:2210.02747 / 2209.03003), the
    ``prediction_type="flow"`` twin of make_train_step: same optimizer /
    EMA / metrics plumbing, but t is drawn continuously (logit-normal or
    uniform, core/flow.py::sample_t), the state is the straight-line
    interpolant x_t = (1-t) x0 + t e, and the loss is the unweighted
    velocity regression || F(x_t, t) - (e - x0) ||^2 — the time density
    itself carries the weighting (SD3, arXiv:2403.03206 eq. 11).

    The per-t loss-history ring (quartile logging) is kept live by
    bucketing each flow time onto the engine's discrete VP grid through
    the marginal-matching map t_vp <-> t_flow (core/flow.py::
    vp_t_to_flow_t) — logging only; the engine rejects
    sampling="importance" with flow (the t density is the importance
    choice).  ``class_dropout_prob`` composes exactly as in
    make_train_step (CFG training).  ``tables`` is used ONLY for the
    history bucketing.
    """
    from ..core.flow import interpolate, sample_t, vp_t_to_flow_t

    if class_dropout_prob and null_class is None:
        raise ValueError("class_dropout_prob needs null_class (the index "
                         "of the model's cfg_null_class embedding row)")
    T = tables.diffusion_steps
    # ascending-in-t_vp flow-time table for the history bucket map
    t_flow_of_vp = vp_t_to_flow_t(tables.alphas_hat)

    def step(state: TrainState, x0: jax.Array, y=None):
        rng = jax.random.fold_in(state.rng, state.step)
        key_t, key_noise, key_drop = jax.random.split(rng, 3)

        if class_dropout_prob:
            key_drop, key_cfg = jax.random.split(key_drop)
            drop = jax.random.bernoulli(
                key_cfg, class_dropout_prob, (x0.shape[0],)
            )
            y = jnp.where(drop, jnp.full_like(y, null_class), y)

        t = sample_t(key_t, x0.shape[0], flow)
        noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
        x_t, u = interpolate(x0, noise, t)
        parts = (x_t, t, u)

        def loss_fn(params):
            kwargs = (
                dict(rngs={"dropout": key_drop}, train=True) if dropout else {}
            )
            per_sample = _flow_per_sample_loss(
                apply_fn, params, parts, y, **kwargs
            )
            return jnp.mean(per_sample), {"mse_per_sample": per_sample}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        t_bucket = jnp.clip(
            jnp.searchsorted(t_flow_of_vp, t) + 1, 1, T
        ).astype(jnp.int32)
        new_history = state.loss_history.update(
            t_bucket, jax.lax.stop_gradient(aux["mse_per_sample"])
        )
        state = state.replace(loss_history=new_history)
        state = state.apply_gradients(grads)

        metrics = {"loss": loss, "grad_norm": global_norm(grads)}
        if watch:
            metrics["grad_norm_per_module"] = {
                k: global_norm(v) for k, v in grads.items()
            }
        return state, metrics

    return step


def make_flow_eval_step(apply_fn: Callable, flow) -> Callable:
    """Validation loss for ``prediction_type="flow"``: the same velocity
    regression under the same time draw, for a given param set
    (params / ema_params), mirroring make_eval_step."""
    from ..core.flow import interpolate, sample_t

    def step(params, rng: jax.Array, x0: jax.Array, y=None):
        key_t, key_noise = jax.random.split(rng)
        t = sample_t(key_t, x0.shape[0], flow)
        noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
        x_t, u = interpolate(x0, noise, t)
        return jnp.mean(
            _flow_per_sample_loss(apply_fn, params, (x_t, t, u), y)
        )

    return step
