"""Reverse-diffusion sampling as a single jitted lax.scan.

TPU-native redesign of the reference's Python-loop sampler
(reference: src/engine.py:385-403 denoising_step/sample_from_step,
src/engine.py:510-554 sample_and_return_steps, engine.py:556-602 batch
endpoints).  The reference runs T=1000 sequential model calls from Python,
one CUDA launch chain per step; here the whole trajectory is ONE compiled
XLA program — ``lax.scan`` over the timestep vector with a donated carry, so
x_t never leaves HBM and the model never recompiles across steps.

Parity notes:
  * identical update math via core.diffusion.p_step (mu - sigma*z, no noise
    at t==1, optional x0-clipping) — given the same z sequence the fp32 CPU
    trajectory matches the reference bit-for-bit (tested);
  * ``steps_to_return`` reproduces sample_and_return_steps: after the step
    at t, if t is in the list, x_{t-1} is recorded (descending-t order);
  * ``return_stds`` records std(x) before the loop and after every step
    (engine.py:538-549).

Extensions (absent in the reference, required by BASELINE config #3):
  * strided ancestral sampling over a subsequence of timesteps via schedule
    respacing (IDDPM-style: new betas from the alpha-bar values at the kept
    steps; the model is fed the ORIGINAL timestep values);
  * DDIM sampling with eta.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diffusion as D
from ..core.diffusion import DiffusionTables
from ..core.schedules import NoiseSchedule

__all__ = [
    "p_sample_loop",
    "ddim_sample_loop",
    "ddim_invert_loop",
    "dpmpp_sample_loop",
    "heun_sample_loop",
    "edm_sample_loop",
    "inpaint_sample_loop",
    "make_cfg_apply_fn",
    "make_v_to_eps_apply_fn",
    "make_x0_to_eps_apply_fn",
    "make_edm_to_eps_apply_fn",
    "space_timesteps",
    "respaced_schedule",
]


def _make_to_eps_apply_fn(apply_fn, tables: DiffusionTables, convert):
    """Shared eps-view wrapper: ``convert(tables, x, t, head)`` maps the
    model's native prediction head to eps per call, so every downstream
    consumer (all sampling loops, the NLL evaluator, FID, CFG guidance)
    works unchanged.

    ``tables`` must be the FULL-schedule tables: the wrapper sees
    original-unit timesteps (the loops apply ``timestep_map`` before the
    model call), so respaced sampling converts with the right ab_t.
    With a learned-sigma head (out channels == 2*C) only the first half
    is converted; the variance interpolation passes through.
    ``return_features`` calls pass through untouched (a feature dict has
    no eps to convert)."""

    def eps_apply(params, x, t, y, **kwargs):
        out = apply_fn(params, x, t, y, **kwargs)
        if kwargs.get("return_features"):
            return out
        cache = None
        if kwargs.get("return_cache"):
            out, cache = out
        c = x.shape[-1]
        if out.shape[-1] == 2 * c:
            head, var_head = jnp.split(out, 2, axis=-1)
            eps = convert(tables, x.astype(head.dtype), t, head)
            out = jnp.concatenate([eps, var_head], axis=-1)
        else:
            out = convert(tables, x.astype(out.dtype), t, out)
        if kwargs.get("return_cache"):
            return out, cache
        return out

    return eps_apply


def make_v_to_eps_apply_fn(apply_fn, tables: DiffusionTables):
    """Eps-view of a v-parameterized model (Salimans & Ho,
    arXiv:2202.00512) — see _make_to_eps_apply_fn for the contract."""
    return _make_to_eps_apply_fn(apply_fn, tables, D.eps_from_v)


def make_x0_to_eps_apply_fn(apply_fn, tables: DiffusionTables):
    """Eps-view of an x0-parameterized model (improved-diffusion's
    ``predict_xstart`` option, the reference's upstream) — see
    _make_to_eps_apply_fn for the contract."""
    return _make_to_eps_apply_fn(apply_fn, tables, D.eps_from_xstart)


def make_edm_to_eps_apply_fn(apply_fn, tables: DiffusionTables,
                             sigma_data: float):
    """Eps-view of an EDM-preconditioned denoiser (arXiv:2206.00364) over
    a discrete VP schedule, so every table-driven consumer — the
    ancestral/DDIM/DPM++/Heun loops, the NLL evaluator, CFG, FID — can
    drive an EDM-trained model unchanged.

    Unlike the v/x0 wrappers (output-only conversions), EDM changes the
    *model call itself*: the VP state x_t = sqrt(ab) x0 + sqrt(1-ab) eps
    is rescaled to EDM's coordinates x_ve = x_t/sqrt(ab) = x0 + sigma n
    with sigma = sqrt((1-ab)/ab), the network runs on the preconditioned
    input (c_in x_ve, c_noise) — NOT on (x_t, t) — and the denoised
    output converts back:

        D = c_skip x_ve + c_out F(c_in x_ve, c_noise)
        eps = (x_ve - D) / sigma.

    ``t`` stays in original schedule units (the loops apply timestep_map
    before this wrapper, exactly as for the other views), so respaced /
    karras-snapped sampling evaluates at the right sigmas.
    ``return_features`` / encoder-cache calls go through the same input
    transform (an EDM model is only in-distribution on preconditioned
    inputs) with the output passed through untouched.
    """
    from ..core.edm import precond

    def eps_apply(params, x, t, y, **kwargs):
        abar = D.expand_to(tables.alphas_hat, t, x.ndim)
        sqrt_abar = jnp.sqrt(abar)
        sigma = jnp.sqrt((1.0 - abar) / abar)
        x_ve = x / sqrt_abar
        c_skip, c_out, c_in, _ = precond(sigma, sigma_data)
        # c_noise needs vector (not broadcast-to-image) shape for the
        # model's timestep-embedding slot
        abar_vec = D.gather(tables.alphas_hat, t)
        sigma_vec = jnp.sqrt((1.0 - abar_vec) / abar_vec)
        c_noise = jnp.log(sigma_vec) / 4.0
        out = apply_fn(params, c_in * x_ve, c_noise, y, **kwargs)
        if kwargs.get("return_features"):
            return out
        cache = None
        if kwargs.get("return_cache"):
            out, cache = out
        denoised = c_skip * x_ve + c_out * out
        eps = (x_ve - denoised) / sigma
        if kwargs.get("return_cache"):
            return eps, cache
        return eps

    return eps_apply


def make_flow_to_eps_apply_fn(apply_fn, tables: DiffusionTables):
    """Eps-view of a flow-matching velocity model (arXiv:2210.02747) over
    a discrete VP schedule, so every table-driven consumer — the
    ancestral/DDIM/DPM++/Heun loops, the NLL evaluator, CFG, FID — can
    drive a flow-trained model unchanged.

    Like the EDM wrapper, this changes the *model call itself*: the
    straight-line interpolant shares marginals with VP up to a scale
    (core/flow.py): at VP time t with a = sqrt(ab), s = sqrt(1-ab), the
    matching flow time is tau = s/(a+s) and the flow state is
    x_flow = x_vp / (a+s).  The network predicts the line's velocity
    u = e - x0, from which

        eps = x_flow + (1 - tau) u

    (substituting x_flow = (1-tau) x0 + tau e).  ``t`` stays in original
    schedule units; ``return_features`` / encoder-cache calls go through
    the same input transform with the output passed through untouched.
    """
    from ..core.flow import TIME_SCALE

    def eps_apply(params, x, t, y, **kwargs):
        abar = D.expand_to(tables.alphas_hat, t, x.ndim)
        a = jnp.sqrt(abar)
        s = jnp.sqrt(1.0 - abar)
        tau = s / (a + s)
        x_flow = x / (a + s)
        abar_vec = D.gather(tables.alphas_hat, t)
        a_vec = jnp.sqrt(abar_vec)
        s_vec = jnp.sqrt(1.0 - abar_vec)
        tau_vec = s_vec / (a_vec + s_vec)
        out = apply_fn(params, x_flow, tau_vec * TIME_SCALE, y, **kwargs)
        if kwargs.get("return_features"):
            return out
        cache = None
        if kwargs.get("return_cache"):
            out, cache = out
        eps = x_flow + (1.0 - tau) * out
        if kwargs.get("return_cache"):
            return eps, cache
        return eps

    return eps_apply


def make_cfg_apply_fn(apply_fn, guidance_scale: float, null_class: int,
                      interval=None, guidance_rescale: float = 0.0,
                      tables: Optional[DiffusionTables] = None):
    """Classifier-free guidance wrapper (Ho & Salimans, arXiv:2207.12598).

    Returns an ``apply_fn`` with the same ``(params, x, t, y, **kw)``
    signature whose eps output is ``eps_u + s*(eps_c - eps_u)`` — so every
    sampling loop (ancestral / DDIM / DPM-Solver++) gets guidance without
    knowing about it.  TPU-shaped: ONE doubled-batch model call ([x;x] with
    [y;null]) instead of two half-filled ones, keeping the MXU matmuls
    large; the null half uses the reserved ``cfg_null_class`` embedding row
    the model trained on under ``class_dropout_prob``.

    ``s=1`` reduces to conditional sampling, ``s=0`` to unconditional.
    With a learned-sigma head (out channels == 2*C) only eps is guided; the
    variance interpolation ``v`` is taken from the conditional half (the
    IDDPM-guidance convention).  Composes with the encoder cache: the
    cache produced/consumed through this wrapper is doubled-batch, and the
    cached null-half features stay null-conditioned.

    ``interval=(lo, hi)`` (original-schedule timestep units, inclusive)
    applies guidance only when lo <= t <= hi ("Applying Guidance in a
    Limited Interval Improves Sample and Distribution Quality",
    Kynkäänniemi et al., arXiv:2404.07724): outside the window the step
    runs ONE plain conditional forward — a real `lax.cond`, so the
    off-interval steps cost a single-batch forward, not a masked doubled
    one.  Not composable with the encoder cache (the two branches would
    carry different cache batch sizes).

    ``guidance_rescale`` = phi in (0, 1] applies the CFG-rescale fix of
    arXiv:2305.08891 §3.4: high guidance scales inflate the per-sample
    std of the implied clean image, washing samples out; the guided
    prediction's x0 view is rescaled to the conditional branch's
    per-sample std and blended back with weight phi (paper default 0.7).
    Defined on the eps-view through the x0 relation, so it needs the
    FULL-schedule ``tables`` (the wrapper sees original-unit timesteps)
    and only applies to table-driven samplers — the native EDM/flow/
    consistency loops reject it at the engine."""
    s = float(guidance_scale)
    phi = float(guidance_rescale or 0.0)
    if phi:
        if not 0.0 < phi <= 1.0:
            raise ValueError(f"guidance_rescale must be in (0, 1], got {phi}")
        if tables is None:
            raise ValueError("guidance_rescale needs the full-schedule "
                             "tables (engine callers pass them)")

    def _rescaled(x, t, eps_cfg, eps_cond):
        """Std-match the guided x0 view to the conditional branch's."""
        x32 = x.astype(eps_cfg.dtype)
        x0_cfg = D.xstart_from_epsilon(tables, x32, t, eps_cfg)
        x0_cond = D.xstart_from_epsilon(tables, x32, t, eps_cond)
        axes = tuple(range(1, x.ndim))
        std_cfg = jnp.std(x0_cfg, axis=axes, keepdims=True)
        std_cond = jnp.std(x0_cond, axis=axes, keepdims=True)
        x0_fix = x0_cfg * (std_cond / (std_cfg + 1e-8))
        x0_out = phi * x0_fix + (1.0 - phi) * x0_cfg
        return D.eps_from_xstart(tables, x32, t, x0_out)

    def guided(params, x, t, y, **kwargs):
        b = x.shape[0]
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        yy = jnp.concatenate([y, jnp.full_like(y, null_class)], axis=0)
        out = apply_fn(params, xx, tt, yy, **kwargs)
        cache = None
        if kwargs.get("return_cache"):
            out, cache = out
        c = x.shape[-1]
        if out.shape[-1] == 2 * c:
            eps2, v2 = jnp.split(out, 2, axis=-1)
            eps = eps2[b:] + s * (eps2[:b] - eps2[b:])
            if phi:
                eps = _rescaled(x, t, eps, eps2[:b])
            out = jnp.concatenate([eps, v2[:b]], axis=-1)
        else:
            eps = out[b:] + s * (out[:b] - out[b:])
            if phi:
                eps = _rescaled(x, t, eps, out[:b])
            out = eps
        if kwargs.get("return_cache"):
            return out, cache
        return out

    def cfg_apply(params, x, t, y, **kwargs):
        assert y is not None, "guidance requires class labels"
        if interval is None:
            return guided(params, x, t, y, **kwargs)
        assert not (kwargs.get("cache") is not None
                    or kwargs.get("return_cache")), (
            "guidance_interval does not compose with the encoder cache"
        )
        lo, hi = interval
        in_window = jnp.logical_and(t[0] >= lo, t[0] <= hi)
        return jax.lax.cond(
            in_window,
            lambda x, t, y: guided(params, x, t, y, **kwargs),
            lambda x, t, y: apply_fn(params, x, t, y, **kwargs),
            x, t, y,
        )

    return cfg_apply


def _model_eps(apply_fn, params, tables, x, t, y, timestep_map=None,
               **model_kwargs):
    """Model call; handles learned-sigma heads and respaced timestep maps.

    ``model_kwargs`` (cache= / return_cache=) are forwarded to ``apply_fn``
    only when present so plain ``(params, x, t, y)`` callables keep working.
    """
    t_model = t if timestep_map is None else jnp.take(timestep_map, t - 1)
    out = apply_fn(params, x, t_model, y, **model_kwargs)
    cache = None
    if model_kwargs.get("return_cache"):
        out, cache = out
    if out.shape[-1] == 2 * x.shape[-1]:
        eps, v = jnp.split(out, 2, axis=-1)
    else:
        eps, v = out, None
    if model_kwargs.get("return_cache"):
        return eps, v, cache
    return eps, v


def _learned_sigma(tables, t, v, ndim):
    """IDDPM learned-sigma interpolation between beta and beta-tilde."""
    frac = (v + 1.0) / 2.0
    log_beta = jnp.log(D.expand_to(tables.betas, t, ndim))
    log_beta_tilde = D.expand_to(tables.posterior_log_variance_clipped, t, ndim)
    logvar = frac * log_beta + (1.0 - frac) * log_beta_tilde
    return jnp.exp(0.5 * logvar)


def p_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    t_start: Optional[int] = None,
    sigma_mode: str = "beta",
    clip: bool = False,
    mean_only: bool = False,
    y: Optional[jax.Array] = None,
    steps_to_return: Optional[Sequence[int]] = None,
    return_stds: bool = False,
    noise: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
    encoder_reuse: int = 1,
    reuse_exact_head: int = 0,
    reuse_exact_tail: int = 0,
    reuse_sigma_boost: float = 0.0,
    reuse_prior_noise: float = 0.0,
    reuse_cache_middle: bool = False,
):
    """Ancestral sampling from t_start down to 1 in one lax.scan.

    ``noise``: optional pre-drawn z stack [t_start, *x.shape] (z for t=t_start
    first); used by parity harnesses to inject a reference RNG stream.
    Either ``key`` or ``noise`` must be given unless mean_only.

    ``encoder_reuse=k`` (k>1) enables encoder-feature reuse ("Faster
    Diffusion", arXiv:2312.09608): the UNet encoder runs only every k-th
    step; in between, the decoder reruns on the cached skip features with
    the fresh timestep embedding.  Exact when k=1 (default); an
    approximation otherwise (the model must support cache=/return_cache=,
    i.e. UNetModel).  Saves the encoder's share of FLOPs and HBM traffic on
    (k-1)/k of the steps.

    ``reuse_exact_head`` / ``reuse_exact_tail``: with encoder_reuse>1, run
    the first ``head`` steps (t near t_start) and the last ``tail`` steps
    (t near 1) exactly, reusing only in between.  (Measured: the quality
    loss is distributed along the chain, so these windows alone do not
    recover it — docs/results/encoder_reuse_sweep.json.)

    ``reuse_sigma_boost`` g: at cached steps scale the injected noise by
    sqrt(1+g).  ``reuse_prior_noise`` lambda: at cached steps add
    lambda * x_T after the update ("Faster Diffusion" §3.3 prior noise
    injection).  Both compensate the texture/variance loss caused by the
    cached (x-independent) eps-hat; calibrate on a trained model with
    scripts/sweep_reuse_quality.py.

    ``reuse_cache_middle``: with encoder_reuse>1, cache the *post-middle*
    activation instead of the encoder output, so cached steps skip the
    middle block too and only the decoder reruns ("Cache Me if You Can"
    block caching; a deeper approximation — the middle block's fresh
    timestep embedding is lost on cached steps).

    Returns x_0, plus (if steps_to_return) the recorded intermediate steps
    [B, S, ...] in descending-t order, plus (if return_stds) the per-step
    std trace [t_start+1].
    """
    T = t_start if t_start is not None else tables.diffusion_steps
    b = x_t.shape[0]
    img_ndim = x_t.ndim

    if encoder_reuse and encoder_reuse > 1:
        assert steps_to_return is None and not return_stds and noise is None, (
            "encoder_reuse composes only with the plain sampling path"
        )
        return _p_sample_loop_encoder_reuse(
            apply_fn, params, tables, x_t, key, int(encoder_reuse), T,
            sigma_mode=sigma_mode, clip=clip, mean_only=mean_only, y=y,
            timestep_map=timestep_map,
            exact_head=int(reuse_exact_head), exact_tail=int(reuse_exact_tail),
            sigma_boost=float(reuse_sigma_boost),
            prior_noise=float(reuse_prior_noise),
            cache_middle=bool(reuse_cache_middle),
        )

    if steps_to_return is not None:
        assert all(t < T for t in steps_to_return), "steps must be < t_start"
        steps_desc = sorted(set(steps_to_return), reverse=True)
        n_slots = len(steps_desc)
        # slot per scanned t (t = T - i); n_slots (OOB, dropped) when unrecorded
        slot_for_t = np.full(T + 1, n_slots, dtype=np.int32)
        for s_idx, t_val in enumerate(steps_desc):
            slot_for_t[t_val] = s_idx
        slots = jnp.asarray(slot_for_t[np.arange(T, 0, -1)])
        out_init = jnp.zeros((n_slots,) + x_t.shape, x_t.dtype)
    else:
        slots = jnp.zeros((T,), jnp.int32)
        out_init = None

    ts = jnp.arange(T, 0, -1)
    if noise is not None:
        zs = noise
    elif not mean_only:
        assert key is not None, "need a PRNG key (or explicit noise)"
        zs = None
    else:
        zs = None

    def body(carry, xs):
        x, out = carry
        t_step, slot = xs[0], xs[1]
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        eps, v = _model_eps(apply_fn, params, tables, x, t, y, timestep_map)

        if mean_only:
            z = None
        elif noise is not None:
            z = xs[2]
        else:
            z = jax.random.normal(
                jax.random.fold_in(key, t_step), x.shape, x.dtype
            )

        if v is not None and not mean_only:
            # learned-sigma reverse step (extension)
            mean = D.model_mean_from_epsilon(tables, x, t, eps, clip=clip)
            sigma = _learned_sigma(tables, t, v, x.ndim)
            nonterminal = D.expand_to_mask(t > 1, x.ndim).astype(x.dtype)
            x = mean - sigma * z * nonterminal
        else:
            x = D.p_step(
                tables, x, t, eps, z,
                sigma_mode=sigma_mode, clip=clip, mean_only=mean_only,
            )

        if out is not None:
            out = out.at[slot].set(x, mode="drop")

        std = jnp.std(x) if return_stds else jnp.zeros((), x.dtype)
        return (x, out), std

    xs = (ts, slots) + ((zs,) if noise is not None else ())
    init_std = jnp.std(x_t) if return_stds else None
    (x_final, out), stds = jax.lax.scan(body, (x_t, out_init), xs)

    results = [x_final]
    if steps_to_return is not None:
        # [S, B, ...] -> [B, S, ...] to match the reference's output layout
        results.append(jnp.moveaxis(out, 0, 1))
    if return_stds:
        results.append(jnp.concatenate([init_std[None], stds]))
    return results[0] if len(results) == 1 else tuple(results)


def _p_sample_loop_encoder_reuse(
    apply_fn, params, tables, x_t, key, k, T, *,
    sigma_mode, clip, mean_only, y, timestep_map,
    exact_head=0, exact_tail=0, sigma_boost=0.0, prior_noise=0.0,
    cache_middle=False,
):
    """Ancestral sampling with the encoder run every k-th step only.

    Steps are grouped into segments of k: the first step of a segment runs
    the full UNet and records the encoder cache; the k-1 following steps run
    middle+decoder on that cache with fresh timestep embeddings.  The scan
    carries only x — each segment rebuilds its own cache, so the schedule is
    static (no lax.cond) and XLA pipelines the whole segment as straight-line
    code.  A prologue of exact steps aligns the segments; ``exact_head`` /
    ``exact_tail`` widen the exact windows at the chain's ends (both run as
    their own exact scans, so head/tail length doesn't grow the program).
    """
    b = x_t.shape[0]

    def _update(x, t_step, eps, v, z_scale=1.0):
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        z = (
            None
            if mean_only
            else z_scale
            * jax.random.normal(
                jax.random.fold_in(key, t_step), x.shape, x.dtype
            )
        )
        if v is not None and not mean_only:
            mean = D.model_mean_from_epsilon(tables, x, t, eps, clip=clip)
            sigma = _learned_sigma(tables, t, v, x.ndim)
            nonterminal = D.expand_to_mask(t > 1, x.ndim).astype(x.dtype)
            return mean - sigma * z * nonterminal
        return D.p_step(
            tables, x, t, eps, z,
            sigma_mode=sigma_mode, clip=clip, mean_only=mean_only,
        )

    if not mean_only:
        assert key is not None, "need a PRNG key"

    exact_head = max(0, int(exact_head))
    exact_tail = max(0, int(exact_tail))
    assert exact_head + exact_tail <= T, "exact windows exceed the chain"
    # segments must divide the middle; spill the remainder into the head
    head_n = exact_head + (T - exact_head - exact_tail) % k

    def exact_body(x, t_step):
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        eps, v = _model_eps(apply_fn, params, tables, x, t, y, timestep_map)
        return _update(x, t_step, eps, v), None

    x = x_t
    if head_n:
        x, _ = jax.lax.scan(exact_body, x, jnp.arange(T, T - head_n, -1))

    mid_kw = {"cache_middle": True} if cache_middle else {}

    def seg_body(x, t0):
        t = jnp.full((b,), t0, dtype=jnp.int32)
        eps, v, cache = _model_eps(
            apply_fn, params, tables, x, t, y, timestep_map,
            return_cache=True, **mid_kw,
        )
        x = _update(x, t0, eps, v)
        boost = float(np.sqrt(1.0 + sigma_boost))
        for j in range(1, k):
            t_j = t0 - j
            t_vec = jnp.full((b,), t_j, dtype=jnp.int32)
            eps_j, v_j = _model_eps(
                apply_fn, params, tables, x, t_vec, y, timestep_map,
                cache=cache, **mid_kw,
            )
            x = _update(x, t_j, eps_j, v_j, z_scale=boost)
            if prior_noise:
                # Faster Diffusion §3.3: re-inject a sliver of the prior
                # noise at cached steps (never at the terminal t=1 step)
                live = D.expand_to_mask(t_vec > 1, x.ndim).astype(x.dtype)
                x = x + prior_noise * x_t * live
        return x, None

    seg_starts = jnp.arange(T - head_n, exact_tail, -k)
    if len(seg_starts):
        x, _ = jax.lax.scan(seg_body, x, seg_starts)
    if exact_tail:
        x, _ = jax.lax.scan(exact_body, x, jnp.arange(exact_tail, 0, -1))
    return x


def space_timesteps(diffusion_steps: int, section_counts,
                    alphas_hat: Optional[np.ndarray] = None) -> list:
    """Choose which original timesteps to keep for strided sampling.

    ``section_counts``: int N (evenly spaced N steps), "ddimN" for the DDIM
    stride-T/N spacing, "trailingN" for the trailing spacing of
    arXiv:2305.08891 Table 2 (steps round(T - i*T/N), i=0..N-1 — always
    includes t=T, so strided sampling starts from the schedule's actual
    terminal noise level; the paper's pairing with zero_terminal_snr,
    where skipping t=T would skip the only all-noise step),
    "karrasN" for Karras rho=7 sigma spacing
    (arXiv:2206.00364 eq. 5 — steps concentrated at low noise, the usual
    pairing with DPM-Solver++; needs ``alphas_hat`` to place the grid on
    this schedule's sigmas), or an IDDPM section-count list — "15,15,20" or
    [15, 15, 20] — which splits the T steps into len(counts) contiguous
    spans and picks counts[i] fractionally-strided steps inside span i
    (the improved-diffusion ``space_timesteps`` semantics; BASELINE
    config #3 cites this respacing family).  Returns kept original steps
    (1-indexed), ascending.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            n = int(section_counts[len("ddim"):])
            stride = diffusion_steps // n
            return list(range(1, diffusion_steps + 1, stride))[:n]
        if section_counts.startswith("trailing"):
            n = int(section_counts[len("trailing"):])
            if not 1 <= n <= diffusion_steps:
                raise ValueError(
                    f"trailingN needs 1 <= N <= T, got N={n}, "
                    f"T={diffusion_steps}"
                )
            step = diffusion_steps / n
            kept = {int(round(diffusion_steps - i * step))
                    for i in range(n)}
            return sorted(k for k in kept if k >= 1)
        if section_counts.startswith("karras"):
            if alphas_hat is None:
                raise ValueError(
                    "karrasN spacing places its grid on the schedule's "
                    "sigmas; pass alphas_hat (engine callers do this "
                    "automatically)"
                )
            return _karras_spaced(
                np.asarray(alphas_hat, np.float64),
                int(section_counts[len("karras"):]),
            )
        if "," in section_counts:
            section_counts = [int(s) for s in section_counts.split(",")]
        else:
            section_counts = int(section_counts)
    if isinstance(section_counts, (list, tuple)):
        return _section_spaced(diffusion_steps, section_counts)
    n = int(section_counts)
    if n >= diffusion_steps:
        return list(range(1, diffusion_steps + 1))
    idx = np.linspace(0, diffusion_steps - 1, n).round().astype(int)
    return sorted(set(int(i) + 1 for i in idx))


def _section_spaced(diffusion_steps: int, counts) -> list:
    """IDDPM per-section fractional striding (VERDICT r2 missing #6).

    Span i gets ``T // n_sections`` steps (+1 for the first ``T % n``
    spans) and contributes ``counts[i]`` of them at fractional stride
    (size-1)/(count-1), rounding an accumulated cursor — the
    improved-diffusion formula, restated here so our 1-indexed steps
    match its 0-indexed kept set shifted by one.
    """
    n_sec = len(counts)
    base, extra = divmod(int(diffusion_steps), n_sec)
    kept, start = [], 0
    for i, c in enumerate(counts):
        size = base + (1 if i < extra else 0)
        c = int(c)
        if c > size:
            raise ValueError(
                f"section {i} asks for {c} steps from a span of {size}"
            )
        stride = (size - 1) / (c - 1) if c > 1 else 1.0
        cursor = 0.0
        for _ in range(c):
            kept.append(start + round(cursor))
            cursor += stride
        start += size
    return sorted(set(k + 1 for k in kept))


def _karras_spaced(alphas_hat: np.ndarray, n: int, rho: float = 7.0) -> list:
    """Karras et al. sigma grid mapped to the nearest discrete timesteps.

    sigma_i = (smax^(1/rho) + i/(n-1)*(smin^(1/rho) - smax^(1/rho)))^rho
    over the schedule's own sigma range (sigma(t) = sqrt((1-ab_t)/ab_t)),
    each grid point snapped to the closest original step in log-sigma.
    Endpoints hit t=1 and t=T exactly; snapping can merge neighbors, so
    the kept set may be smaller than n at tiny T (documented, matches the
    k-diffusion discrete-model behavior).
    """
    sigmas = np.sqrt((1.0 - alphas_hat) / alphas_hat)  # ascending in t
    smin, smax = float(sigmas[0]), float(sigmas[-1])
    ramp = np.linspace(0.0, 1.0, int(n))
    grid = (
        smax ** (1.0 / rho) + ramp * (smin ** (1.0 / rho) - smax ** (1.0 / rho))
    ) ** rho
    log_s = np.log(sigmas)
    idx = np.abs(log_s[None, :] - np.log(grid)[:, None]).argmin(axis=1)
    return sorted(set(int(i) + 1 for i in idx))


def respaced_schedule(
    sched: NoiseSchedule, use_timesteps: Sequence[int]
) -> Tuple[NoiseSchedule, np.ndarray]:
    """Build the schedule over a kept subsequence of timesteps.

    New betas realize the original alpha-bar at the kept steps:
    beta'_i = 1 - abar[k_i]/abar[k_{i-1}] (IDDPM respacing).  Returns the new
    schedule and the timestep map (new 1-indexed t -> original 1-indexed t)
    to feed the model its original timestep embedding inputs.
    """
    kept = sorted(set(int(t) for t in use_timesteps))
    abar = sched.alphas_hat.astype(np.float64)
    last = 1.0
    new_betas = []
    for t in kept:
        a = abar[t - 1]
        # a zero_terminal_snr table can put the kept-step alpha-bar ratio
        # below f32 epsilon; 1 - ratio would round to exactly 1.0 and the
        # rebuilt table's alpha-bar to 0 (inf inverse buffers).  Cap beta
        # one f32 ulp under 1 — the implied terminal alpha-bar stays
        # numerically zero (abar_prev * 6e-8) with every buffer finite.
        new_betas.append(min(1.0 - a / last, 1.0 - 6e-8))
        last = a
    new = NoiseSchedule.create(
        diffusion_steps=len(kept),
        mode=f"respaced[{sched.mode}]",
        betas=np.asarray(new_betas, dtype=np.float32),
    )
    return new, np.asarray(kept, dtype=np.int32)


def ddim_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    t_start: Optional[int] = None,
    eta: float = 0.0,
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
    encoder_reuse: int = 1,
) -> jax.Array:
    """DDIM sampling (deterministic at eta=0) over the given tables.

    x_{t-1} = sqrt(abar_{t-1}) x0 + sqrt(1 - abar_{t-1} - s^2) eps + s z,
    s = eta * sqrt((1-abar_{t-1})/(1-abar_t)) * sqrt(1 - abar_t/abar_{t-1}).
    Combine with respaced_schedule for 50-step fast sampling
    (BASELINE config #3).  ``encoder_reuse=k`` composes the Faster-Diffusion
    encoder cache with DDIM exactly as in p_sample_loop (k=1 exact).
    """
    T = t_start if t_start is not None else tables.diffusion_steps
    b = x_t.shape[0]

    def update(x, t_step, eps):
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        x0 = D.xstart_from_epsilon(tables, x, t, eps, clip=clip)
        abar = D.expand_to(tables.alphas_hat, t, x.ndim)
        abar_prev = D.expand_to(tables.alphas_hat_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1.0 - abar_prev) / (1.0 - abar))
            * jnp.sqrt(1.0 - abar / abar_prev)
        )
        mean = (
            jnp.sqrt(abar_prev) * x0
            + jnp.sqrt(jnp.maximum(1.0 - abar_prev - sigma**2, 0.0)) * eps
        )
        if eta > 0.0:
            z = jax.random.normal(
                jax.random.fold_in(key, t_step), x.shape, x.dtype
            )
            nonterminal = D.expand_to_mask(t > 1, x.ndim).astype(x.dtype)
            return mean + sigma * z * nonterminal
        return mean

    def body(x, t_step):
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        eps, v = _model_eps(apply_fn, params, tables, x, t, y, timestep_map)
        return update(x, t_step, eps), None

    k = int(encoder_reuse or 1)
    if k <= 1:
        x_final, _ = jax.lax.scan(body, x_t, jnp.arange(T, 0, -1))
        return x_final

    # segmented encoder-reuse, same structure as the ancestral loop:
    # key step runs the full UNet and records the cache; the k-1 following
    # steps rerun middle+decoder on it with fresh timestep embeddings
    head_n = T % k
    x = x_t
    if head_n:
        x, _ = jax.lax.scan(body, x, jnp.arange(T, T - head_n, -1))

    def seg_body(x, t0):
        t = jnp.full((b,), t0, dtype=jnp.int32)
        eps, v, cache = _model_eps(
            apply_fn, params, tables, x, t, y, timestep_map, return_cache=True
        )
        x = update(x, t0, eps)
        for j in range(1, k):
            t_j = t0 - j
            t_vec = jnp.full((b,), t_j, dtype=jnp.int32)
            eps_j, _ = _model_eps(
                apply_fn, params, tables, x, t_vec, y, timestep_map,
                cache=cache,
            )
            x = update(x, t_j, eps_j)
        return x, None

    x, _ = jax.lax.scan(seg_body, x, jnp.arange(T - head_n, 0, -k))
    return x


def dpmpp_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    t_start: Optional[int] = None,
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
    order: int = 2,
) -> jax.Array:
    """DPM-Solver++ deterministic sampling (Lu et al., arXiv:2211.01095),
    data-prediction multistep form — one jitted lax.scan, like the other
    loops (a fast-sampling capability beyond the reference, whose sampler
    runs every step ancestrally, src/engine.py:385-403).

    Parameterization: alpha_t = sqrt(abar_t), sigma_t = sqrt(1-abar_t),
    half-log-SNR lambda_t = log(alpha_t/sigma_t).  Per step t -> t-1 with
    h = lambda_{t-1} - lambda_t:

        x_{t-1} = (sigma_{t-1}/sigma_t) x_t - alpha_{t-1} (e^{-h} - 1) D,

    where D is the x0 prediction (order=1; the DPM-Solver++ first-order
    step, identical to deterministic DDIM in this parameterization) or the
    2M two-step extrapolation (order=2):

        D = (1 + 1/(2r)) x0_t - 1/(2r) x0_prev,   r = h_prev / h.

    The final step (t=1 -> 0, where sigma_0 = 0 and lambda diverges)
    returns the plain x0 prediction — the standard "lower order final"
    choice.  Combine with respaced_schedule for N-step fast sampling; the
    ``key`` argument is accepted for endpoint-signature uniformity but
    unused (the solver is deterministic).
    """
    assert order in (1, 2), "dpmpp_sample_loop implements orders 1 and 2"
    T = t_start if t_start is not None else tables.diffusion_steps
    b = x_t.shape[0]
    ndim = x_t.ndim

    abar = tables.alphas_hat
    # lambda at the *target* of the t=1 step is +inf; every use below is
    # guarded by the t==1 selection, so clamp for finiteness only
    abar_prev_all = jnp.minimum(tables.alphas_hat_prev, 1.0 - 1e-12)

    def lam_of(a):
        return 0.5 * (jnp.log(a) - jnp.log1p(-a))

    def body(carry, t_step):
        x, x0_prev, h_prev, have_prev = carry
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        eps, _ = _model_eps(apply_fn, params, tables, x, t, y, timestep_map)
        x0 = D.xstart_from_epsilon(tables, x, t, eps, clip=clip)

        a_t = D.expand_to(abar, t, ndim)
        a_s = D.expand_to(abar_prev_all, t, ndim)  # abar at target t-1
        lam_t, lam_s = lam_of(a_t), lam_of(a_s)
        h = lam_s - lam_t

        if order == 2:
            safe_h_prev = jnp.where(have_prev, h_prev, 1.0)
            c = jnp.where(have_prev, h / (2.0 * safe_h_prev), 0.0)
            d_term = (1.0 + c) * x0 - c * x0_prev
        else:
            d_term = x0

        sigma_t = jnp.sqrt(1.0 - a_t)
        sigma_s = jnp.sqrt(1.0 - a_s)
        alpha_s = jnp.sqrt(a_s)
        x_next = (sigma_s / sigma_t) * x - alpha_s * jnp.expm1(-h) * d_term
        # t=1 -> 0: sigma_0 = 0, the exact limit of the first-order step
        x_next = jnp.where(t_step == 1, x0, x_next)
        return (x_next, x0, h, jnp.bool_(True)), None

    carry0 = (
        x_t,
        jnp.zeros_like(x_t),
        jnp.zeros((b,) + (1,) * (ndim - 1), x_t.dtype),
        jnp.bool_(False),
    )
    (x_final, _, _, _), _ = jax.lax.scan(
        body, carry0, jnp.arange(T, 0, -1)
    )
    return x_final


def heun_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    t_start: Optional[int] = None,
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
) -> jax.Array:
    """EDM Heun sampling (Karras et al., arXiv:2206.00364 Alg. 2; the
    default S_churn=0 is the deterministic Alg. 1) — a 2nd-order
    single-step ODE solver, complementing the multistep DPM-Solver++(2M):
    same O(h^2) local accuracy with no history carry, at 2 model evals per
    step (a fast-sampling capability beyond the reference, whose sampler
    runs every step ancestrally, src/engine.py:385-403).

    The probability-flow ODE in EDM's scaled coordinates
    (x_hat = x/sqrt(abar), sigma = sqrt(1-abar)/sqrt(abar)) is
    d x_hat / d sigma = eps(x, t), so per step t -> t-1:

        x_hat_euler = x_hat_t + (sigma_{t-1} - sigma_t) eps_t
        x_hat_{t-1} = x_hat_t + (sigma_{t-1} - sigma_t)
                      * (eps_t + eps(x_euler, t-1)) / 2

    The final step (t=1 -> 0, sigma_0 = 0) is Euler-only — the correction
    slope at sigma=0 is undefined; the Euler limit IS the x0 prediction.
    ``clip`` clamps the x0 view and rebuilds a consistent slope
    eps = (x_hat - clip(x0)) / sigma (unlike DDIM's clipped-x0 +
    unclipped-eps mix, which collapses at many steps — docs/RESULTS.md).
    Combine with respaced_schedule ("karrasN" spacing is the EDM-native
    choice); with ``s_churn=0`` the ``key`` argument is unused
    (deterministic).

    ``s_churn > 0`` enables EDM's stochastic churn (Alg. 2): per step,
    noise is first ADDED to raise sigma_t to sigma_hat =
    sigma_t*(1+gamma), gamma = min(s_churn/N, sqrt(2)-1) wherever
    sigma_t in [s_tmin, s_tmax], then the Heun step integrates down from
    sigma_hat.  The churned state is rescaled with the VP identity
    abar = 1/(1+sigma^2) before the model call; the model itself is
    evaluated at the nearest grid timestep (the standard discrete-model
    retrofit — exact in scaling, approximate only in the conditioning
    timestep, by at most the gamma factor).  Requires ``key``.

    Regime note (measured on the analytic Gaussian-data ODE,
    tests/test_heun.py): the 2nd-order gain kicks in from ~10 steps up
    (3.2x lower error than DDIM at 10 steps, 9.9x at 25 on linear-1000
    tables); at <=8 steps over a sigma_max~157 chain the long-step
    overshoot of any explicit 2nd-order corrector can lose to 1st order —
    EDM itself operates at >=10 steps.
    """
    T = t_start if t_start is not None else tables.diffusion_steps
    b = x_t.shape[0]
    ndim = x_t.ndim
    churn = float(s_churn) > 0.0
    if churn and key is None:
        raise ValueError("s_churn > 0 needs a PRNG key")

    abar = tables.alphas_hat
    abar_prev = tables.alphas_hat_prev  # exactly 1.0 at t=1 (sigma_0 = 0)
    gamma_max = min(float(s_churn) / max(T, 1), 2.0 ** 0.5 - 1.0)

    def slope(x, t, a, sigma):
        """d x_hat / d sigma at (x, t); == model eps, or the consistent
        clipped-x0 slope when clip is set."""
        eps, _ = _model_eps(apply_fn, params, tables, x, t, y, timestep_map)
        if clip:
            x0 = D.xstart_from_epsilon(tables, x, t, eps, clip=True)
            eps = (x / jnp.sqrt(a) - x0) / jnp.maximum(sigma, 1e-12)
        return eps

    def body(x, t_step):
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        a_t = D.expand_to(abar, t, ndim)
        a_s = D.expand_to(abar_prev, t, ndim)
        sig_t = jnp.sqrt((1.0 - a_t) / a_t)
        sig_s = jnp.sqrt(jnp.maximum(1.0 - a_s, 0.0) / a_s)

        if churn:
            # raise the noise level to sigma_hat, then integrate down from
            # there; the s_churn=0 build keeps the original bitwise path
            gamma = jnp.where(
                (sig_t >= s_tmin) & (sig_t <= s_tmax), gamma_max, 0.0
            )
            sig_hat = sig_t * (1.0 + gamma)
            z = jax.random.normal(
                jax.random.fold_in(key, t_step), x.shape, x.dtype
            )
            x_hat = x / jnp.sqrt(a_t) + jnp.sqrt(
                jnp.maximum(sig_hat**2 - sig_t**2, 0.0)
            ) * (s_noise * z)
            a_hat = 1.0 / (1.0 + sig_hat**2)  # VP: abar = 1/(1+sigma^2)
            d_t = slope(x_hat * jnp.sqrt(a_hat), t, a_hat, sig_hat)
        else:
            sig_hat = sig_t
            x_hat = x / jnp.sqrt(a_t)
            d_t = slope(x, t, a_t, sig_t)

        x_hat_euler = x_hat + (sig_s - sig_hat) * d_t
        x_euler = jnp.sqrt(a_s) * x_hat_euler

        # correction slope at the target time; on the final step (t=1,
        # sigma_0=0) the eval runs at a safe index and is discarded by the
        # where below
        s_safe = jnp.full((b,), jnp.maximum(t_step - 1, 1), dtype=jnp.int32)
        d_s = slope(x_euler, s_safe, a_s, sig_s)
        x_hat_heun = x_hat + (sig_s - sig_hat) * 0.5 * (d_t + d_s)
        x_heun = jnp.sqrt(a_s) * x_hat_heun
        return jnp.where(t_step == 1, x_euler, x_heun), None

    x_final, _ = jax.lax.scan(body, x_t, jnp.arange(T, 0, -1))
    return x_final


def edm_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    n_steps: int = 18,
    sigma_data: float = 0.5,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
) -> jax.Array:
    """Native EDM sampling (arXiv:2206.00364 Alg. 2) for a model trained
    with ``prediction_type="edm"``: Heun integration of the sigma-space
    probability-flow ODE dx/dsigma = (x - D(x; sigma))/sigma over the
    continuous rho-warped grid — no discrete schedule involved (contrast
    heun_sample_loop, which retrofits the same solver onto VP tables
    through the eps view).

    ``apply_fn`` is the RAW network F: this loop owns the EDM
    preconditioning (D = c_skip x + c_out F(c_in x, c_noise)), so wrapping
    ``apply_fn`` in make_cfg_apply_fn guides correctly — a lerp on F is a
    lerp on D (affine relation at fixed x, sigma).

    ``x_t`` is standard normal noise (endpoint-uniform with the other
    loops); the loop scales it to the prior x = sigma_0 * x_t itself.
    ``tables``/``timestep_map`` are accepted for signature uniformity and
    unused.  ``clip`` clamps the denoised image to [-1, 1] before the
    slope — consistent (slope rebuilt from the clipped D), like the Heun
    loop's clipped mode.  The final step (sigma -> 0) is Euler-only, as
    in heun_sample_loop.  ``s_churn`` > 0 enables the stochastic churn
    exactly as in Alg. 2 (here natively — no VP rescale needed);
    requires ``key``.
    """
    from ..core.edm import edm_denoise, karras_sigma_grid

    churn = float(s_churn) > 0.0
    if churn and key is None:
        raise ValueError("s_churn > 0 needs a PRNG key")
    n = int(n_steps)
    grid = karras_sigma_grid(n, sigma_min, sigma_max, rho)
    sig_cur = jnp.asarray(grid, jnp.float32)
    sig_next = jnp.asarray(
        np.concatenate([grid[1:], [0.0]]), jnp.float32
    )
    gamma_max = min(float(s_churn) / n, 2.0 ** 0.5 - 1.0)

    def denoise(x, sigma):
        """D(x; sigma) for a scalar (per-step) sigma."""
        denoised = edm_denoise(apply_fn, params, x, sigma, sigma_data, y)
        if clip:
            denoised = jnp.clip(denoised, -1.0, 1.0)
        return denoised

    def body(x, step):
        sig_t, sig_s, i = step
        if churn:
            gamma = jnp.where(
                (sig_t >= s_tmin) & (sig_t <= s_tmax), gamma_max, 0.0
            )
            sig_hat = sig_t * (1.0 + gamma)
            z = jax.random.normal(
                jax.random.fold_in(key, i), x.shape, x.dtype
            )
            x_hat = x + jnp.sqrt(
                jnp.maximum(sig_hat**2 - sig_t**2, 0.0)
            ) * (s_noise * z)
        else:
            sig_hat, x_hat = sig_t, x
        d_t = (x_hat - denoise(x_hat, sig_hat)) / sig_hat
        x_euler = x_hat + (sig_s - sig_hat) * d_t
        # correction slope at the target sigma; evaluated at a safe sigma
        # and discarded by the where on the final (sig_s == 0) step
        sig_safe = jnp.maximum(sig_s, sigma_min)
        d_s = (x_euler - denoise(x_euler, sig_safe)) / sig_safe
        x_heun = x_hat + (sig_s - sig_hat) * 0.5 * (d_t + d_s)
        return jnp.where(sig_s == 0.0, x_euler, x_heun), None

    x = sig_cur[0] * x_t
    steps = (sig_cur, sig_next, jnp.arange(n))
    x_final, _ = jax.lax.scan(body, x, steps)
    return x_final


def flow_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    n_steps: int = 25,
    shift: float = 1.0,
    heun: bool = False,
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
) -> jax.Array:
    """Native flow-matching sampling for a model trained with
    ``prediction_type="flow"``: integrate the learned ODE dx/dt = F(x, t)
    from t=1 (x = the given standard-normal noise) down to t=0 over the
    (optionally SD3-shifted) uniform grid — Euler by default (the
    rectified-flow workhorse: straight target trajectories make low-order
    steps accurate), Heun's 2nd-order corrector with ``heun=True``.

    ``apply_fn`` is the RAW velocity network; wrapping it in
    make_cfg_apply_fn guides correctly (velocity, eps and x0 are affine
    in F at fixed x, t, so a lerp on F is a lerp on all of them).
    ``clip`` clamps the implied clean image x0 = x - t F to [-1, 1] and
    rebuilds the slope v = (x - x0_clipped)/t — consistent clipping like
    the other ODE loops (guarded at tiny t, where x is already x0).
    ``key``/``tables``/``timestep_map`` are accepted for signature
    uniformity and unused.
    """
    from ..core.flow import TIME_SCALE, flow_time_grid

    grid = flow_time_grid(int(n_steps), shift)
    t_cur = jnp.asarray(grid[:-1], jnp.float32)
    t_next = jnp.asarray(grid[1:], jnp.float32)
    b = x_t.shape[0]

    def velocity(x, t):
        """F(x, t) for a scalar (per-step) t, optionally x0-clipped."""
        t_vec = jnp.full((b,), t * TIME_SCALE, jnp.float32)
        v = apply_fn(params, x, t_vec, y)
        if clip:
            x0_hat = jnp.clip(x - t * v, -1.0, 1.0)
            v = jnp.where(t > 1e-4, (x - x0_hat) / jnp.maximum(t, 1e-4), v)
        return v

    def body(x, ts):
        t_a, t_b = ts
        dt = t_b - t_a
        v_a = velocity(x, t_a)
        x_euler = x + dt * v_a
        if not heun:
            return x_euler, None
        v_b = velocity(x_euler, t_b)
        x_heun = x + dt * 0.5 * (v_a + v_b)
        # final step (t_b == 0): Euler only — the corrector would evaluate
        # exactly at the clean endpoint, where the clipped slope rebuild
        # degenerates; matches edm_sample_loop's convention
        return jnp.where(t_b == 0.0, x_euler, x_heun), None

    x_final, _ = jax.lax.scan(body, x_t, (t_cur, t_next))
    return x_final


def consistency_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    n_steps: int = 1,
    sigma_data: float = 0.5,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
) -> jax.Array:
    """Native sampling for a model trained with
    ``prediction_type="consistency"`` (Song et al., arXiv:2303.01469
    alg. 1): one forward pass maps noise straight to data —

        x0 = f(sigma_max * z, sigma_max)

    — and ``n_steps`` > 1 runs multistep consistency sampling: re-noise
    the current estimate to the next (lower) sigma on the rho-warped
    Karras grid and denoise again,

        x = x0 + sqrt(tau_k^2 - sigma_min^2) z_k;   x0 = f(x, tau_k).

    ``apply_fn`` is the RAW network F — this loop owns the
    boundary-condition preconditioning (core/consistency.py::cm_apply),
    so wrapping ``apply_fn`` in make_cfg_apply_fn guides correctly (a
    lerp on F is a lerp on f).  ``x_t`` is standard normal noise
    (endpoint-uniform with every other loop); re-noising draws from
    ``key`` (required only for ``n_steps`` > 1 — the 1-step path is
    deterministic given x_t).  ``clip`` clamps each f output to [-1, 1].
    ``tables``/``timestep_map`` are accepted for signature uniformity
    and unused.
    """
    from ..core.consistency import ConsistencyConfig, cm_apply

    n = int(n_steps)
    if n < 1:
        raise ValueError("need at least 1 consistency step")
    if n > 1 and key is None:
        raise ValueError("multistep consistency sampling re-noises between "
                         "steps and needs a PRNG key")
    cfg = ConsistencyConfig(
        sigma_data=sigma_data, sigma_min=sigma_min, sigma_max=sigma_max,
        rho=rho,
    )
    b = x_t.shape[0]

    def f(x, sigma):
        sig_vec = jnp.full((b,), sigma, jnp.float32)
        out = cm_apply(apply_fn, params, x, sig_vec, y, cfg)
        return jnp.clip(out, -1.0, 1.0) if clip else out

    x0 = f(sigma_max * x_t, jnp.float32(sigma_max))
    if n == 1:
        return x0

    from ..core.edm import karras_sigma_grid

    # the n-1 re-noise levels come from the INTERIOR of an (n+1)-point
    # grid: the endpoints would waste an NFE (a tau at sigma_max repeats
    # the first denoise's level; a tau at sigma_min makes f an exact
    # no-op through the boundary condition c_skip=1, c_out=0)
    taus = jnp.asarray(
        karras_sigma_grid(n + 1, sigma_min, sigma_max, rho)[1:-1],
        jnp.float32,
    )

    def body(x0, step):
        tau, i = step
        z = jax.random.normal(jax.random.fold_in(key, i), x0.shape, x0.dtype)
        x = x0 + jnp.sqrt(
            jnp.maximum(jnp.square(tau) - sigma_min**2, 0.0)
        ) * z
        return f(x, tau), None

    x_final, _ = jax.lax.scan(body, x0, (taus, jnp.arange(n - 1)))
    return x_final


def inpaint_sample_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x_t: jax.Array,
    key: jax.Array,
    *,
    x0_known: jax.Array,
    mask: jax.Array,
    sigma_mode: str = "beta",
    clip: bool = False,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
    resample_steps: int = 1,
):
    """RePaint-style inpainting (Lugmayr et al., arXiv:2201.09865) — beyond
    the reference, whose closest endpoint is full-image
    diffuse_and_reconstruct (src/engine.py:617-657).

    One lax.scan over the reverse chain; at every step the model denoises
    the full image, then the KNOWN region (``mask`` == 1) is overwritten
    with a fresh forward-noising of ``x0_known`` at the step's target time,
    so the unknown region is generated *conditioned on* consistent known
    content.  ``resample_steps`` R > 1 adds RePaint's time-travel
    resampling: each step is harmonized R times by re-noising
    x_{t-1} -> x_t through one forward kernel q(x_t|x_{t-1}) and denoising
    again (R model calls per step — NFE scales linearly).

    ``mask`` broadcasts to image shape; 1 = keep from x0_known, 0 = fill.
    Works on respaced chains via ``timestep_map`` like every other loop.
    """
    T = tables.diffusion_steps
    b = x_t.shape[0]
    ndim = x_t.ndim
    R = int(resample_steps)
    assert R >= 1
    mask = jnp.broadcast_to(mask, x_t.shape).astype(x_t.dtype)

    def body(x, t_step):
        t = jnp.full((b,), t_step, dtype=jnp.int32)

        def one(i, x):
            kk = jax.random.fold_in(jax.random.fold_in(key, t_step), i)
            k_z, k_known, k_renoise = jax.random.split(kk, 3)
            eps, v = _model_eps(apply_fn, params, tables, x, t, y,
                                timestep_map)
            z = jax.random.normal(k_z, x.shape, x.dtype)
            if v is not None:
                mean = D.model_mean_from_epsilon(tables, x, t, eps, clip=clip)
                sigma = _learned_sigma(tables, t, v, ndim)
                nonterminal = D.expand_to_mask(t > 1, ndim).astype(x.dtype)
                x_prev = mean - sigma * z * nonterminal
            else:
                x_prev = D.p_step(
                    tables, x, t, eps, z, sigma_mode=sigma_mode, clip=clip,
                )
            # known content at the step's target time t-1 (t-1 == 0 is the
            # clean image itself)
            noise_known = jax.random.normal(k_known, x.shape, x.dtype)
            known_prev = jnp.where(
                D.expand_to_mask(t > 1, ndim),
                D.q_sample(tables, x0_known, noise_known,
                           jnp.maximum(t - 1, 1)),
                x0_known,
            )
            x_prev = mask * known_prev + (1.0 - mask) * x_prev
            if R == 1:
                return x_prev
            # RePaint resampling: one forward kernel q(x_t|x_{t-1}) back up,
            # except after the final harmonization pass
            beta = D.expand_to(tables.betas, t, ndim)
            renoised = (
                jnp.sqrt(1.0 - beta) * x_prev
                + jnp.sqrt(beta) * jax.random.normal(k_renoise, x.shape,
                                                     x.dtype)
            )
            return jnp.where(i == R - 1, x_prev, renoised)

        x = jax.lax.fori_loop(0, R, one, x)
        return x, None

    x_final, _ = jax.lax.scan(body, x_t, jnp.arange(T, 0, -1))
    return x_final


def ddim_invert_loop(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x0: jax.Array,
    *,
    t_end: Optional[int] = None,
    y: Optional[jax.Array] = None,
    timestep_map: Optional[jax.Array] = None,
):
    """Deterministic DDIM inversion (encoding): x_0 -> x_T along the
    probability-flow ODE — beyond the reference, whose only encoder is the
    stochastic q_sample (get_noised_representation, src/engine.py:604-615).

    Scan ascending t = 1..t_end; the step to level t inverts the eta=0
    DDIM update algebraically, with eps evaluated at the TARGET timestep t
    on the source state:

        x0_implied = (x_{t-1} - sqrt(1-ab_{t-1}) eps) / sqrt(ab_{t-1})
        x_t        = sqrt(ab_t) x0_implied + sqrt(1-ab_t) eps

    so for an x-independent eps the roundtrip invert->ddim_sample(eta=0)
    is EXACT; for a real model the error is the usual O(1/steps) ODE
    discretization mismatch.  No x0-clipping (clipping is not invertible).
    Composes with respaced chains via ``timestep_map``; returns x_{t_end}.

    Conditioning note: the backward x0-recovery divides by sqrt(ab_t), so
    roundtrips through t with ab_t ~ 0 amplify any eps inconsistency by
    1/sqrt(ab_t) — fine for a trained (self-consistent) model, but prefer
    ``t_end`` < T for editing pipelines, exactly as SDEdit/RePaint do.
    """
    T = t_end if t_end is not None else tables.diffusion_steps
    b = x0.shape[0]
    ndim = x0.ndim

    def body(x, t_step):
        t = jnp.full((b,), t_step, dtype=jnp.int32)
        eps, _ = _model_eps(apply_fn, params, tables, x, t, y, timestep_map)
        abar = D.expand_to(tables.alphas_hat, t, ndim)
        abar_prev = D.expand_to(tables.alphas_hat_prev, t, ndim)
        x0_implied = (x - jnp.sqrt(1.0 - abar_prev) * eps) / jnp.sqrt(abar_prev)
        x_next = jnp.sqrt(abar) * x0_implied + jnp.sqrt(1.0 - abar) * eps
        return x_next, None

    x_final, _ = jax.lax.scan(body, x0, jnp.arange(1, T + 1))
    return x_final
