"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.ops.attention import qkv_attention_xla
from probabilisticdeepdiffusionmodels_tpu.ops.attention_pallas import (
    qkv_attention_pallas,
)
from probabilisticdeepdiffusionmodels_tpu.ops.groupnorm_pallas import (
    group_norm_silu_pallas,
    group_norm_silu_xla,
)


@pytest.mark.parametrize("num_heads", [1, 4])
def test_pallas_attention_matches_xla(num_heads):
    rng = np.random.RandomState(0)
    qkv = rng.randn(2, 64, 3 * 128).astype(np.float32)
    ref = np.asarray(qkv_attention_xla(jnp.asarray(qkv), num_heads))
    out = np.asarray(
        qkv_attention_pallas(jnp.asarray(qkv), num_heads, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pallas_groupnorm_silu_matches_xla():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 64).astype(np.float32)
    gamma = rng.randn(64).astype(np.float32)
    beta = rng.randn(64).astype(np.float32)
    ref = np.asarray(group_norm_silu_xla(jnp.asarray(x), gamma, beta, num_groups=32))
    out = np.asarray(
        group_norm_silu_pallas(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
            num_groups=32, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_pallas_groupnorm_no_silu():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 32).astype(np.float32)
    gamma = np.ones(32, np.float32)
    beta = np.zeros(32, np.float32)
    ref = np.asarray(
        group_norm_silu_xla(jnp.asarray(x), gamma, beta, num_groups=32, silu=False)
    )
    out = np.asarray(
        group_norm_silu_pallas(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
            num_groups=32, silu=False, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
    # normalized output: zero mean/unit variance per group
    assert abs(float(out.mean())) < 1e-3
