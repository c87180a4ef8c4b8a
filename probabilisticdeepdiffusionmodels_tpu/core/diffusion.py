"""Pure, stateless diffusion-process math on device.

TPU-first re-design of the forward/reverse process math the reference keeps
as Engine methods (reference: src/engine.py:251-277 forward process and loss,
src/engine.py:348-403 reverse process, src/engine.py:437-506 VLB terms).
Everything here is a pure function of (schedule tables, arrays); no classes,
no hidden state, fully jit/vmap/scan-compatible.

Conventions (kept identical to the reference so fp32 trajectories match
bit-for-bit given identical inputs):
  * timesteps t are 1-indexed in [1, T]; every table gather is at ``t - 1``
    (reference src/engine.py:255-256, 364-365, 379-380, 483-488).
  * the ancestral update is ``x <- mu - sigma * z`` (reference
    src/engine.py:395 subtracts the noise; distribution-equivalent to +).
  * images live in NHWC (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import NoiseSchedule

__all__ = [
    "DiffusionTables",
    "expand_to",
    "gather",
    "q_mean_std",
    "q_sample",
    "q_posterior",
    "xstart_from_epsilon",
    "model_mean_from_epsilon",
    "v_target",
    "eps_from_v",
    "eps_from_xstart",
    "min_snr_weight",
    "p_step",
    "mean_flat",
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "timestep_embedding",
]


class DiffusionTables(NamedTuple):
    """Device-resident schedule buffers, one jnp array per derived quantity.

    A NamedTuple so it is a pytree: it can be closed over by jitted functions
    or passed as an argument and donated/sharded like any other array bundle.
    """

    betas: jax.Array
    alphas: jax.Array
    alphas_sqrt: jax.Array
    alphas_hat: jax.Array
    alphas_hat_sqrt: jax.Array
    one_min_alphas_hat_sqrt: jax.Array
    alphas_hat_prev: jax.Array
    posterior_variance: jax.Array
    sqrt_recip_alphas_hat: jax.Array
    sqrt_recipm1_alphas_hat: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    denoising_coef: jax.Array
    posterior_log_variance_clipped: jax.Array
    sigma_beta: jax.Array        # sqrt(beta_t)
    sigma_beta_tilde: jax.Array  # sqrt(posterior variance)

    @classmethod
    def from_schedule(cls, sched: NoiseSchedule, dtype=jnp.float32) -> "DiffusionTables":
        def dev(x: np.ndarray) -> jax.Array:
            return jnp.asarray(x, dtype=dtype)

        return cls(
            betas=dev(sched.betas),
            alphas=dev(sched.alphas),
            alphas_sqrt=dev(sched.alphas_sqrt),
            alphas_hat=dev(sched.alphas_hat),
            alphas_hat_sqrt=dev(sched.alphas_hat_sqrt),
            one_min_alphas_hat_sqrt=dev(sched.one_min_alphas_hat_sqrt),
            alphas_hat_prev=dev(sched.alphas_hat_prev),
            posterior_variance=dev(sched.posterior_variance),
            sqrt_recip_alphas_hat=dev(sched.sqrt_recip_alphas_hat),
            sqrt_recipm1_alphas_hat=dev(sched.sqrt_recipm1_alphas_hat),
            posterior_mean_coef1=dev(sched.posterior_mean_coef1),
            posterior_mean_coef2=dev(sched.posterior_mean_coef2),
            denoising_coef=dev(sched.denoising_coef),
            posterior_log_variance_clipped=dev(sched.posterior_log_variance_clipped),
            sigma_beta=dev(sched.sigma("beta")),
            sigma_beta_tilde=dev(sched.sigma("beta_tilde")),
        )

    @property
    def diffusion_steps(self) -> int:
        return self.betas.shape[0]

    def sigma_table(self, sigma_mode: str) -> jax.Array:
        if sigma_mode == "beta":
            return self.sigma_beta
        if sigma_mode == "beta_tilde":
            return self.sigma_beta_tilde
        raise ValueError(f"Wrong sigma mode: {sigma_mode}")


# ---- parity-mode exact float32 arithmetic -------------------------------
#
# The BASELINE north star demands bit-for-bit fp32 CPU parity of sampler
# trajectories with the torch reference.  Two XLA-CPU behaviors break naive
# parity: (a) f32 division lowers to a reciprocal refinement ~1 ULP off
# IEEE, and (b) the fusion pass FMA-contracts a*b +/- c patterns inside
# fused loop bodies (optimization_barrier does NOT survive fusion there).
#
# The fix is algebraic rather than flag-based: in parity mode (x64 enabled
# by the harness) each elementwise op is computed in float64 and rounded to
# float32.  Products/sums/differences of f32-valued operands are EXACT in
# f64 (24+24 mantissa bits < 53), so the final round is precisely the IEEE
# f32 result of the separate op — and any f64 FMA contraction XLA performs
# is value-identical because the f64 intermediates carry no rounding.  On
# TPU / production builds (x64 off) these helpers are plain f32 ops and XLA
# fuses/contracts freely.


def _parity_mode() -> bool:
    return bool(jax.config.jax_enable_x64)


def _pm_round(x64: jax.Array) -> jax.Array:
    """Round an f64 value to float32 precision, un-elidably.

    A plain f64->f32->f64 convert pair inside an XLA:CPU fused loop gets
    kept in wide registers (the narrowing is skipped), which broke parity;
    ``lax.reduce_precision`` is an explicit rounding op that codegen must
    honor.  The result stays f64-typed but carries exactly the f32 value.
    """
    return jax.lax.reduce_precision(x64, exponent_bits=8, mantissa_bits=23)


def _pm2(op, a, b):
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    return _pm_round(op(a, b)).astype(jnp.float32)


def _pm_mul(a, b):
    if _parity_mode():
        return _pm2(jax.lax.mul, a, b)
    return a * b


def _pm_add(a, b):
    if _parity_mode():
        return _pm2(jax.lax.add, a, b)
    return a + b


def _pm_sub(a, b):
    if _parity_mode():
        return _pm2(jax.lax.sub, a, b)
    return a - b


def _strict_div(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 division, correctly rounded in parity mode (f64 is exactly
    rounded for division: 53 >= 2*24+2)."""
    if _parity_mode():
        return _pm2(jax.lax.div, a, b)
    return a / b


def gather(table: jax.Array, t: jax.Array) -> jax.Array:
    """table[t-1] for 1-indexed t (any shape of t)."""
    return jnp.take(table, t - 1, axis=0)


def expand_to(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """table[t-1] broadcast-shaped to [B, 1, ..., 1] with `ndim` total dims."""
    vals = gather(table, t)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def q_mean_std(tables: DiffusionTables, x0: jax.Array, t: jax.Array):
    """Mean/std of q(x_t | x_0) (reference src/engine.py:251-257)."""
    mean = _pm_mul(x0, expand_to(tables.alphas_hat_sqrt, t, x0.ndim))
    std = expand_to(tables.one_min_alphas_hat_sqrt, t, x0.ndim)
    return mean, std


def q_sample(tables: DiffusionTables, x0: jax.Array, noise: jax.Array, t: jax.Array):
    """Draw x_t = mean + noise*std given noise (reference src/engine.py:259-261)."""
    mean, std = q_mean_std(tables, x0, t)
    return _pm_add(mean, _pm_mul(noise, std))


def q_posterior(tables: DiffusionTables, t: jax.Array, x0: jax.Array, x_t: jax.Array):
    """Mean/variance of q(x_{t-1} | x_t, x_0), DDPM eq. (6)/(7)
    (reference src/engine.py:477-490)."""
    mean = _pm_add(
        _pm_mul(x0, expand_to(tables.posterior_mean_coef1, t, x0.ndim)),
        _pm_mul(x_t, expand_to(tables.posterior_mean_coef2, t, x0.ndim)),
    )
    var = expand_to(tables.posterior_variance, t, x0.ndim)
    return mean, var


def xstart_from_epsilon(
    tables: DiffusionTables,
    x_t: jax.Array,
    t: jax.Array,
    epsilon: jax.Array,
    clip: bool = False,
) -> jax.Array:
    """Recover x_0 estimate from predicted noise (reference src/engine.py:363-368)."""
    x0 = _pm_sub(
        _pm_mul(expand_to(tables.sqrt_recip_alphas_hat, t, x_t.ndim), x_t),
        _pm_mul(expand_to(tables.sqrt_recipm1_alphas_hat, t, x_t.ndim), epsilon),
    )
    if clip:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def model_mean_from_epsilon(
    tables: DiffusionTables,
    x_t: jax.Array,
    t: jax.Array,
    epsilon: jax.Array,
    clip: bool = False,
) -> jax.Array:
    """Posterior mean from predicted noise (reference src/engine.py:370-381).

    Unclipped path: mu = (x_t - eps * beta/sqrt(1-ab)) / sqrt(alpha).
    Clipped path: through clamped x0 and the posterior (identical to the
    reference's clip_while_generating branch).
    """
    if clip:
        x0 = xstart_from_epsilon(tables, x_t, t, epsilon, clip=True)
        mean, _ = q_posterior(tables, t, x0, x_t)
        return mean
    denois = expand_to(tables.denoising_coef, t, x_t.ndim)
    a_sqrt = expand_to(tables.alphas_sqrt, t, x_t.ndim)
    return _strict_div(_pm_sub(x_t, _pm_mul(epsilon, denois)), a_sqrt)


def v_target(tables: DiffusionTables, x0: jax.Array, noise: jax.Array,
             t: jax.Array) -> jax.Array:
    """v-parameterization training target (Salimans & Ho, Progressive
    Distillation, arXiv:2202.00512 — beyond the reference, which is
    eps-only): v = sqrt(ab_t)*eps - sqrt(1-ab_t)*x0."""
    a = expand_to(tables.alphas_hat_sqrt, t, x0.ndim)
    s = expand_to(tables.one_min_alphas_hat_sqrt, t, x0.ndim)
    return a * noise - s * x0


def eps_from_v(tables: DiffusionTables, x_t: jax.Array, t: jax.Array,
               v: jax.Array) -> jax.Array:
    """Invert the v-parameterization given the noised input:
    eps = sqrt(ab_t)*v + sqrt(1-ab_t)*x_t (and symmetrically
    x0 = sqrt(ab_t)*x_t - sqrt(1-ab_t)*v)."""
    a = expand_to(tables.alphas_hat_sqrt, t, x_t.ndim)
    s = expand_to(tables.one_min_alphas_hat_sqrt, t, x_t.ndim)
    return a * v + s * x_t


def eps_from_xstart(tables: DiffusionTables, x_t: jax.Array, t: jax.Array,
                    x0: jax.Array) -> jax.Array:
    """Invert the x0-parameterization given the noised input:
    eps = (x_t - sqrt(ab_t)*x0) / sqrt(1-ab_t) (the algebraic inverse of
    xstart_from_epsilon; x0-prediction is the improved-diffusion
    ``predict_xstart`` option the reference's upstream exposes)."""
    a = expand_to(tables.alphas_hat_sqrt, t, x_t.ndim)
    s = expand_to(tables.one_min_alphas_hat_sqrt, t, x_t.ndim)
    return (x_t - a * x0) / s


def min_snr_weight(tables: DiffusionTables, t: jax.Array, gamma: float,
                   prediction_type: str = "epsilon") -> jax.Array:
    """Min-SNR-gamma per-sample loss weight (Hang et al., arXiv:2303.09556
    — beyond the reference, which uses the uniform "simple" weighting).

    SNR(t) = ab_t / (1 - ab_t).  In x0-space the clamped weight is
    min(SNR, gamma); expressed on the loss actually computed here it is
      epsilon target: min(SNR, gamma) / SNR          (eq. 14)
      v target:       min(SNR, gamma) / (SNR + 1)    (eq. 17)
    so late (high-SNR, low-t) steps stop dominating the gradient.  Returns
    shape [B] to multiply the per-sample MSE."""
    ab = gather(tables.alphas_hat, t)
    snr = ab / (1.0 - ab)
    clamped = jnp.minimum(snr, gamma)
    if prediction_type == "epsilon":
        return clamped / snr
    if prediction_type == "v":
        return clamped / (snr + 1.0)
    if prediction_type == "x0":
        return clamped  # the weight is defined in x0-space (eq. 13)
    raise ValueError(f'Unknown prediction_type: "{prediction_type}"')


def p_step(
    tables: DiffusionTables,
    x_t: jax.Array,
    t: jax.Array,
    epsilon: jax.Array,
    z: Optional[jax.Array],
    sigma_mode: str = "beta",
    clip: bool = False,
    mean_only: bool = False,
) -> jax.Array:
    """One ancestral reverse step (reference src/engine.py:385-397).

    ``z`` is the standard-normal draw; pass None (or mean_only=True) to take
    the mean.  The t==1 no-noise rule is enforced with a mask so the function
    stays scan-friendly (reference uses a Python if at src/engine.py:390-394).
    Update sign matches the reference: x <- mu - sigma*z (src/engine.py:395).
    """
    mean = model_mean_from_epsilon(tables, x_t, t, epsilon, clip=clip)
    if mean_only or z is None:
        return mean
    sigma = expand_to(tables.sigma_table(sigma_mode), t, x_t.ndim)
    nonterminal = expand_to_mask(t > 1, x_t.ndim).astype(x_t.dtype)
    return _pm_sub(mean, _pm_mul(_pm_mul(sigma, z), nonterminal))


def expand_to_mask(mask: jax.Array, ndim: int) -> jax.Array:
    return mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))


def mean_flat(x: jax.Array) -> jax.Array:
    """Mean over all non-batch dims (reference src/utils.py:13-17)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Broadcasted KL between diagonal Gaussians (reference src/utils.py:50-77)."""
    mean1 = jnp.asarray(mean1, dtype=jnp.float32) if not isinstance(mean1, jax.Array) else mean1
    logvar1 = jnp.asarray(logvar1, dtype=jnp.float32) if not isinstance(logvar1, jax.Array) else logvar1
    mean2 = jnp.asarray(mean2, dtype=jnp.float32) if not isinstance(mean2, jax.Array) else mean2
    logvar2 = jnp.asarray(logvar2, dtype=jnp.float32) if not isinstance(logvar2, jax.Array) else logvar2
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jax.Array) -> jax.Array:
    """Tanh approximation of the standard-normal CDF (reference src/utils.py:80-85)."""
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(
    x: jax.Array, means: jax.Array, log_scales: jax.Array
) -> jax.Array:
    """Log-likelihood of images discretized to 256 bins under a Gaussian
    (reference src/utils.py:88-115).  x assumed rescaled to [-1, 1]."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal timestep embeddings (reference src/modules/nn.py:104-122).

    [cos | sin] ordering matches the reference (cos first).
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding
