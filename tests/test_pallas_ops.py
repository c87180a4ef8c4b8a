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


def test_fused_gn_in_model_matches_and_trains():
    """use_pallas_gn routes GroupNorm+SiLU through the fused op with an
    identical param tree; gradients flow via the XLA-derived backward.
    (Interpret-mode Pallas on CPU.)"""
    import unittest.mock as mock
    import probabilisticdeepdiffusionmodels_tpu.ops.groupnorm_pallas as gnp
    from probabilisticdeepdiffusionmodels_tpu.models import get_model

    orig = gnp.group_norm_silu_pallas
    with mock.patch.object(
        gnp, "group_norm_silu_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    ):
        cfg = dict(name="unet", in_channels=3, model_channels=32,
                   num_res_blocks=1, attention_resolutions=[], channel_mult=[1])
        m_ref = get_model(8, dict(cfg))
        m_fused = get_model(8, dict(cfg, use_pallas_gn=True))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        t = jnp.ones((2,), jnp.int32)
        params = m_ref.init(jax.random.PRNGKey(1), x, t)["params"]
        # identical param trees (checkpoint compatibility)
        p2 = m_fused.init(jax.random.PRNGKey(1), x, t)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(p2)

        # perturb so zero-init branches contribute
        leaves, tree = jax.tree.flatten(params)
        leaves = [l + 0.02 * jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(2), i), l.shape)
            for i, l in enumerate(leaves)]
        params = jax.tree.unflatten(tree, leaves)

        ref = m_ref.apply({"params": params}, x, t)
        out = m_fused.apply({"params": params}, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

        # gradient flows through the fused op
        def loss(p):
            return jnp.mean(jnp.square(m_fused.apply({"params": p}, x, t)))
        g = jax.grad(loss)(params)
        gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
        assert np.isfinite(gn) and gn > 0
