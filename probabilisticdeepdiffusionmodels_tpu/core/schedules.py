"""Noise schedules and every derived diffusion buffer.

TPU-native re-design of the schedule math owned by the reference engine
(reference: src/engine.py:26-76 for beta construction, src/engine.py:121-150
for the derived buffers).  The reference computes these as torch tensors
attached to a LightningModule; here they are a frozen, immutable table built
once in float32 NumPy (bit-for-bit matching torch's float32 linspace/cumprod
semantics) and then placed on device.  Everything downstream (training loss,
ancestral sampler, NLL) consumes this table through pure functions.

Supported beta modes, mirroring the reference surface:
  - "linear":  DDPM linear betas, scaled by 1000/T when start/end unset
               (src/engine.py:58-64)
  - "cosine":  IDDPM cosine alpha-bar schedule (src/engine.py:33-43, 65-67)
  - "mixed":   0.5*linear-alpha-bar + 0.5*cosine-alpha-bar, a schedule novel
               to the reference repo (src/engine.py:46-52, 68-71)
  - "custom":  betas from a user-supplied alpha_bar callback
               (src/engine.py:72-74)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = [
    "NoiseSchedule",
    "get_betas",
    "linear_betas",
    "cosine_alpha_bar",
    "betas_for_alpha_bar",
    "mixed_alpha_bar",
    "rescale_zero_terminal_snr",
]


def linear_betas(
    diffusion_steps: int,
    beta_start: Optional[float] = None,
    beta_end: Optional[float] = None,
) -> np.ndarray:
    """Linear beta ramp in float32.

    When endpoints are unset, they scale with 1000/T exactly as the reference
    does (src/engine.py:60-63).  We reproduce ``torch.linspace`` float32 CPU
    semantics exactly (verified bitwise in tests/test_schedules.py): the
    endpoints and the step are rounded to float32, the fill is two-sided
    (``start + i*step`` below the halfway point, ``end - (T-1-i)*step``
    above) accumulated in float64, and the result is cast to float32.
    """
    if beta_start is None or beta_end is None:
        scale = 1000.0 / diffusion_steps
        beta_start = scale * 0.0001
        beta_end = scale * 0.02
    if diffusion_steps == 1:
        return np.asarray([beta_start], dtype=np.float32)
    s32 = np.float32(beta_start)
    e32 = np.float32(beta_end)
    step = (e32 - s32) / np.float32(diffusion_steps - 1)
    i = np.arange(diffusion_steps)
    lo = np.float64(s32) + i * np.float64(step)
    hi = np.float64(e32) - (diffusion_steps - 1 - i) * np.float64(step)
    out = np.where(i < diffusion_steps // 2, lo, hi)
    return out.astype(np.float32)


def cosine_alpha_bar(t: float) -> float:
    """IDDPM cosine alpha-bar, s=0.008 (src/engine.py:33-34)."""
    return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2


def betas_for_alpha_bar(
    alpha_bar: Callable[[float], float],
    diffusion_steps: int,
    max_beta: float = 0.999,
) -> np.ndarray:
    """Betas realizing a target alpha-bar curve (src/engine.py:37-43).

    beta_i = 1 - alpha_bar((i+1)/T) / alpha_bar(i/T), clipped at max_beta.
    Computed in float64 then cast, matching torch.tensor(list-of-py-floats).
    """
    betas = np.empty(diffusion_steps, dtype=np.float64)
    for i in range(diffusion_steps):
        t1 = i / diffusion_steps
        t2 = (i + 1) / diffusion_steps
        betas[i] = min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta)
    return betas.astype(np.float32)


try:  # host-side parity helper only; never on the device compute path
    import torch as _torch
except Exception:  # pragma: no cover - torch is present in supported envs
    _torch = None


def _sqrt_f32(x: np.ndarray) -> np.ndarray:
    """float32 sqrt matching the reference's torch-CPU results bitwise.

    torch routes large-tensor f32 sqrt through MKL VML's high-accuracy mode,
    which is within 1 ULP of round-to-nearest but NOT correctly rounded, so
    IEEE sqrt (numpy) differs on ~0.6% of entries.  Schedule tables are built
    once on host, so when torch is importable we use it directly to guarantee
    bit-for-bit parity with the reference buffers (src/engine.py:121-150);
    otherwise we fall back to IEEE sqrt (a <=1 ULP difference).
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    if _torch is not None:
        return _torch.sqrt(_torch.from_numpy(x)).numpy()
    return np.sqrt(x, dtype=np.float32)


def _cumprod_f32(x: np.ndarray) -> np.ndarray:
    """float32 cumprod with float64 accumulation.

    torch.cumprod on float32 CPU tensors accumulates the running product in
    double and rounds each output element to float32 (verified bitwise in
    tests/test_schedules.py); plain float32-accumulated cumprod drifts off by
    1 ULP within ~10 elements.
    """
    return np.cumprod(x.astype(np.float64)).astype(np.float32)


def _linear_alpha_bar_table(diffusion_steps: int) -> np.ndarray:
    """cumprod(1 - linear betas) in float32 (src/engine.py:26-30)."""
    betas = linear_betas(diffusion_steps)
    return _cumprod_f32((np.float32(1.0) - betas).astype(np.float32))


def mixed_alpha_bar(diffusion_steps: int) -> np.ndarray:
    """0.5*linear + 0.5*cosine alpha-bar table of length T+1.

    The linear table is extrapolated one step past T (src/engine.py:46-52).
    All arithmetic is float32 tensor math in the reference; kept f32 here.
    """
    lin = _linear_alpha_bar_table(diffusion_steps)
    last = np.float32(2.0) * lin[-1] - lin[-2]
    lin = np.concatenate([lin, np.asarray([last], dtype=np.float32)])
    cos = np.asarray(
        [cosine_alpha_bar(t / diffusion_steps) for t in range(diffusion_steps + 1)],
        dtype=np.float32,
    )
    return (np.float32(0.5) * lin + np.float32(0.5) * cos).astype(np.float32)


def get_betas(
    beta_start: Optional[float] = None,
    beta_end: Optional[float] = None,
    diffusion_steps: int = 1000,
    mode: str = "linear",
    max_beta: float = 0.999,
    custom_alpha_bar: Optional[Callable[[float], float]] = None,
) -> np.ndarray:
    """Beta table dispatch, same surface as the reference (src/engine.py:55-76)."""
    if mode == "linear":
        return linear_betas(diffusion_steps, beta_start, beta_end)
    if mode == "cosine":
        return betas_for_alpha_bar(cosine_alpha_bar, diffusion_steps, max_beta)
    if mode == "mixed":
        table = mixed_alpha_bar(diffusion_steps)
        return betas_for_alpha_bar(
            lambda t: table[int(t * diffusion_steps)], diffusion_steps, max_beta
        )
    if mode == "custom":
        if custom_alpha_bar is None:
            raise ValueError("custom mode requires custom_alpha_bar")
        return betas_for_alpha_bar(custom_alpha_bar, diffusion_steps, max_beta)
    raise ValueError(f"Wrong beta mode: {mode}")


def rescale_zero_terminal_snr(
    betas: np.ndarray, alpha_floor: float = 1e-4
) -> np.ndarray:
    """Rescale a beta table so the terminal SNR is (numerically) zero.

    Lin et al., "Common Diffusion Noise Schedules and Sampler Design Flaws"
    (arXiv:2305.08891, Algorithm 1): shift-and-scale sqrt(alpha-bar) so the
    first entry is preserved and the last hits exactly 0 — the forward
    process then actually reaches pure noise at t=T, removing the
    brightness/mean leak of conventional schedules (the reference's linear
    ramp leaves terminal SNR ~4e-5; SD's, the paper's target, ~4.7e-3).

    One deliberate deviation from the paper: an EXACT zero terminal
    alpha-bar makes the inverse tables (sqrt(1/ab), sqrt(1/ab - 1)) that
    every eps-view consumer gathers at t=T infinite — the eps
    parameterization carries no x0 information at ab=0.  Instead of
    threading a native-v x0 hook through every sampler, the terminal entry
    is floored at ``alpha_floor`` times its predecessor
    (ab_T = alpha_floor * ab_{T-1}; default 1e-4 puts terminal SNR at
    ~4e-13 for the linear-1000 ramp — eight orders below the value the
    paper criticizes, and far below what one f32 sample could resolve).
    The f32 cancellation this leaves in xstart_from_epsilon at the single
    t=T step is damped by sqrt(ab_{T-1}) ~ 1e-4 in every consumer (DDIM /
    DPM++ / posterior mean all multiply x0 by sqrt(ab_prev)), so it never
    reaches the trajectory at more than ~1e-5 amplitude.

    Requires a v- or x0-parameterized model (the eps target at t=T is
    pure input noise — unlearnable; paper §2.1); engine enforces this.
    """
    b = np.asarray(betas, np.float64)
    if b.ndim != 1 or b.shape[0] < 2:
        raise ValueError("rescale_zero_terminal_snr needs a 1-D beta table "
                         "with at least 2 steps")
    abar = np.cumprod(1.0 - b)
    s = np.sqrt(abar)
    s0, sT = s[0], s[-1]
    s = (s - sT) * (s0 / (s0 - sT))   # Algorithm 1: keep s[0], zero s[-1]
    abar = s * s
    abar[-1] = abar[-2] * float(alpha_floor)
    alphas = abar / np.concatenate([[1.0], abar[:-1]])
    out = (1.0 - alphas).astype(np.float32)
    if not (np.all(out > 0.0) and np.all(out < 1.0)):
        raise ValueError(
            "rescale_zero_terminal_snr produced betas outside (0, 1) — "
            "the input table is too short or too aggressive for Algorithm 1"
        )
    return out


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Immutable table of every derived diffusion quantity.

    Field-for-field the buffers the reference engine builds at
    src/engine.py:121-150, all float32 NumPy.  Index convention: the
    framework (like the reference) uses 1-indexed timesteps t in [1, T];
    arrays here are 0-indexed so lookups gather at ``t - 1``.
    """

    diffusion_steps: int
    mode: str
    betas: np.ndarray                     # beta_t
    alphas: np.ndarray                    # 1 - beta_t
    alphas_sqrt: np.ndarray               # sqrt(alpha_t)
    alphas_hat: np.ndarray                # cumprod alpha (alpha-bar)
    alphas_hat_sqrt: np.ndarray           # sqrt(alpha-bar)
    one_min_alphas_hat_sqrt: np.ndarray   # sqrt(1 - alpha-bar)
    alphas_hat_prev: np.ndarray           # alpha-bar_{t-1}, leading 1.0
    alphas_hat_next: np.ndarray           # alpha-bar_{t+1}, trailing 0.0
    posterior_variance: np.ndarray        # beta-tilde
    sqrt_recip_alphas_hat: np.ndarray     # sqrt(1/alpha-bar)
    sqrt_recipm1_alphas_hat: np.ndarray   # sqrt(1/alpha-bar - 1)
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    denoising_coef: np.ndarray            # beta / sqrt(1 - alpha-bar)
    # IDDPM learned-sigma support (not in the reference, which fixes sigma —
    # src/modules/__init__.py:34 hard-codes learn_sigma=False):
    posterior_log_variance_clipped: np.ndarray

    @classmethod
    def create(
        cls,
        diffusion_steps: int = 1000,
        mode: str = "linear",
        beta_start: Optional[float] = None,
        beta_end: Optional[float] = None,
        max_beta: float = 0.999,
        custom_alpha_bar: Optional[Callable[[float], float]] = None,
        betas: Optional[Sequence[float]] = None,
    ) -> "NoiseSchedule":
        if betas is None:
            betas_np = get_betas(
                beta_start, beta_end, diffusion_steps, mode, max_beta, custom_alpha_bar
            )
        else:
            betas_np = np.asarray(betas, dtype=np.float32)
        t = betas_np.shape[0]
        assert t == diffusion_steps
        if np.any(betas_np >= 1.0):
            # the reference's linear ramp scales by 1000/T (get_betas), so
            # T below ~50 yields beta >= 1 -> negative alpha -> NaN sqrt
            # buffers.  The reference fails silently; surface it loudly.
            import warnings

            warnings.warn(
                f"noise schedule has beta >= 1 (max {betas_np.max():.3g}); "
                "alpha goes non-positive and the sqrt buffers will be NaN. "
                "For the linear mode this happens at small T because betas "
                "scale by 1000/T (reference parity); use a larger T or "
                "explicit beta_start/beta_end.",
                RuntimeWarning,
                stacklevel=2,
            )

        alphas = (np.float32(1.0) - betas_np).astype(np.float32)
        alphas_sqrt = _sqrt_f32(alphas)
        alphas_hat = _cumprod_f32(alphas)
        alphas_hat_sqrt = _sqrt_f32(alphas_hat)
        one_min_alphas_hat_sqrt = _sqrt_f32(
            (np.float32(1.0) - alphas_hat).astype(np.float32)
        )
        alphas_hat_prev = np.append(np.float32(1.0), alphas_hat[:-1]).astype(np.float32)
        alphas_hat_next = np.append(alphas_hat[1:], np.float32(0.0)).astype(np.float32)
        posterior_variance = (
            betas_np * (np.float32(1.0) - alphas_hat_prev)
            / (np.float32(1.0) - alphas_hat)
        ).astype(np.float32)
        sqrt_recip = _sqrt_f32((np.float32(1.0) / alphas_hat).astype(np.float32))
        sqrt_recipm1 = _sqrt_f32(
            (np.float32(1.0) / alphas_hat - np.float32(1.0)).astype(np.float32)
        )
        coef1 = (
            betas_np * _sqrt_f32(alphas_hat_prev)
            / (np.float32(1.0) - alphas_hat)
        ).astype(np.float32)
        coef2 = (
            (np.float32(1.0) - alphas_hat_prev)
            * alphas_sqrt
            / (np.float32(1.0) - alphas_hat)
        ).astype(np.float32)
        denoising_coef = (betas_np / one_min_alphas_hat_sqrt).astype(np.float32)
        # log of posterior variance with t=0 entry backfilled (IDDPM-style;
        # used only by the learned-sigma extension, never by the parity path)
        pv = posterior_variance.copy()
        if t > 1:
            pv[0] = posterior_variance[1]
        pv = np.maximum(pv, np.float32(1e-20))
        post_logvar_clipped = np.log(pv, dtype=np.float32)

        return cls(
            diffusion_steps=diffusion_steps,
            mode=mode,
            betas=betas_np,
            alphas=alphas,
            alphas_sqrt=alphas_sqrt,
            alphas_hat=alphas_hat,
            alphas_hat_sqrt=alphas_hat_sqrt,
            one_min_alphas_hat_sqrt=one_min_alphas_hat_sqrt,
            alphas_hat_prev=alphas_hat_prev,
            alphas_hat_next=alphas_hat_next,
            posterior_variance=posterior_variance,
            sqrt_recip_alphas_hat=sqrt_recip,
            sqrt_recipm1_alphas_hat=sqrt_recipm1,
            posterior_mean_coef1=coef1,
            posterior_mean_coef2=coef2,
            denoising_coef=denoising_coef,
            posterior_log_variance_clipped=post_logvar_clipped,
        )

    def sigma(self, sigma_mode: str) -> np.ndarray:
        """Per-step fixed sigma table (src/engine.py:354-361).

        "beta" -> sqrt(beta_t); "beta_tilde" -> sqrt(posterior variance).
        Returned as a full table; consumers gather at t-1.
        """
        if sigma_mode == "beta":
            return _sqrt_f32(self.betas)
        if sigma_mode == "beta_tilde":
            return _sqrt_f32(self.posterior_variance)
        raise ValueError(f"Wrong sigma mode: {sigma_mode}")

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}
