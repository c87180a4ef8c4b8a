"""Bit-for-bit fp32 parity of noise schedules vs the reference formulas.

The reference builds its tables with torch (src/engine.py:26-76, 121-150).
torch (CPU) is available in the test env, so we recompute the reference
tables with torch here — from the published formulas, not by importing the
reference — and require exact float32 equality.
"""

import math

import numpy as np
import pytest
import torch

from probabilisticdeepdiffusionmodels_tpu.core import (
    NoiseSchedule,
    get_betas,
)


def torch_betas(mode, T, max_beta=0.999):
    """Reference beta construction (src/engine.py:26-76) in torch."""
    if mode == "linear":
        scale = 1000 / T
        return torch.linspace(scale * 0.0001, scale * 0.02, T)
    if mode == "cosine":
        f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        return torch.tensor(
            [min(1 - f((i + 1) / T) / f(i / T), max_beta) for i in range(T)]
        )
    if mode == "mixed":
        lin_betas = torch_betas("linear", T)
        lin_ab = torch.cumprod(1 - lin_betas, 0)
        last = 2 * lin_ab[-1] - lin_ab[-2]
        lin_ab = torch.cat([lin_ab, torch.tensor([1]) * last])
        cosf = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        cos_ab = torch.tensor([cosf(t / T) for t in range(T + 1)])
        mixed = 0.5 * lin_ab + 0.5 * cos_ab
        ab = lambda t: mixed[int(t * T)]
        return torch.tensor(
            [min(1 - (ab((i + 1) / T) / ab(i / T)).item(), max_beta) for i in range(T)]
        )
    raise ValueError(mode)


def torch_tables(betas):
    """Reference derived buffers (src/engine.py:121-150) in torch."""
    alphas = 1 - betas
    out = {}
    out["betas"] = betas
    out["alphas"] = alphas
    out["alphas_sqrt"] = torch.sqrt(alphas)
    ah = torch.cumprod(alphas, 0)
    out["alphas_hat"] = ah
    out["alphas_hat_sqrt"] = torch.sqrt(ah)
    out["one_min_alphas_hat_sqrt"] = torch.sqrt(1 - ah)
    ah_prev = torch.Tensor(np.append(1.0, ah[:-1].numpy()))
    out["alphas_hat_prev"] = ah_prev
    out["posterior_variance"] = betas * (1.0 - ah_prev) / (1.0 - ah)
    out["sqrt_recip_alphas_hat"] = torch.sqrt(1.0 / ah)
    out["sqrt_recipm1_alphas_hat"] = torch.sqrt(1.0 / ah - 1)
    out["posterior_mean_coef1"] = betas * torch.sqrt(ah_prev) / (1.0 - ah)
    out["posterior_mean_coef2"] = (1.0 - ah_prev) * out["alphas_sqrt"] / (1.0 - ah)
    out["denoising_coef"] = betas / out["one_min_alphas_hat_sqrt"]
    return out


@pytest.mark.parametrize("mode", ["linear", "cosine", "mixed"])
@pytest.mark.parametrize("T", [50, 250, 1000])
def test_betas_bitwise_parity(mode, T):
    ours = get_betas(diffusion_steps=T, mode=mode)
    ref = torch_betas(mode, T).to(torch.float32).numpy()
    assert ours.dtype == np.float32
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("mode", ["linear", "cosine"])
@pytest.mark.parametrize("T", [50, 1000])
def test_derived_buffers_bitwise_parity(mode, T):
    sched = NoiseSchedule.create(diffusion_steps=T, mode=mode)
    ref = torch_tables(torch_betas(mode, T).to(torch.float32))
    for name, ref_t in ref.items():
        ours = getattr(sched, name)
        np.testing.assert_array_equal(
            ours, ref_t.to(torch.float32).numpy(), err_msg=f"{name} mismatch"
        )


def test_linear_explicit_endpoints():
    ours = get_betas(0.001, 0.05, 100, "linear")
    ref = torch.linspace(0.001, 0.05, 100).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_sigma_tables():
    sched = NoiseSchedule.create(diffusion_steps=100, mode="linear")
    # sigma tables must match torch.sqrt bitwise (src/engine.py:354-361)
    np.testing.assert_array_equal(
        sched.sigma("beta"), torch.sqrt(torch.from_numpy(sched.betas)).numpy()
    )
    np.testing.assert_array_equal(
        sched.sigma("beta_tilde"),
        torch.sqrt(torch.from_numpy(sched.posterior_variance)).numpy(),
    )
    with pytest.raises(ValueError):
        sched.sigma("bogus")


def test_custom_alpha_bar():
    f = lambda t: 1.0 - 0.5 * t
    ours = get_betas(diffusion_steps=10, mode="custom", custom_alpha_bar=f)
    ref = torch.tensor(
        [min(1 - f((i + 1) / 10) / f(i / 10), 0.999) for i in range(10)]
    ).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_bad_mode_raises():
    with pytest.raises(ValueError):
        get_betas(diffusion_steps=10, mode="nope")
