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


@pytest.mark.parametrize("num_heads", [1, 4])
def test_pallas_attention_matches_xla_bf16(num_heads):
    """bf16 kernel path (native bf16 MXU matmuls, f32 accumulate/softmax)
    matches the XLA bf16 einsum path to bf16 tolerance."""
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(
        rng.randn(2, 64, 3 * 128).astype(np.float32), jnp.bfloat16
    )
    ref = np.asarray(qkv_attention_xla(qkv, num_heads), np.float32)
    out = np.asarray(
        qkv_attention_pallas(qkv, num_heads, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


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


def test_attention_min_tokens_gate(monkeypatch):
    """use_pallas routes through the fused kernel only at >= min_tokens
    (measured win only at the 256-token site — docs/KERNELS.md)."""
    import probabilisticdeepdiffusionmodels_tpu.ops.attention_pallas as ap
    from probabilisticdeepdiffusionmodels_tpu.ops.attention import qkv_attention

    calls = []
    orig = ap.qkv_attention_pallas

    def spy(qkv, num_heads, **kw):
        calls.append(qkv.shape[1])
        return orig(qkv, num_heads, interpret=True, **kw)

    monkeypatch.setattr(ap, "qkv_attention_pallas", spy)
    small = jnp.ones((1, 64, 3 * 32), jnp.float32)
    big = jnp.ones((1, 256, 3 * 32), jnp.float32)
    qkv_attention(small, 1, use_pallas=True, min_tokens=256)
    assert calls == []  # small site stays on XLA
    qkv_attention(big, 1, use_pallas=True, min_tokens=256)
    assert calls == [256]


def _manual_gn_silu_conv(x, gamma, beta, w, bias, num_groups, emb=None,
                         film=None):
    """Unfused composition: GN(f32) [+emb|FiLM] -> SiLU -> conv3x3."""
    xf = x.astype(jnp.float32)
    if emb is not None:
        xf = xf + emb.astype(jnp.float32)[:, None, None, :]
    b, h, wd, c = xf.shape
    g = num_groups
    r = xf.reshape(b, h * wd, g, c // g)
    mean = jnp.mean(r, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(r - mean), axis=(1, 3), keepdims=True)
    xn = ((r - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, wd, c)
    y = xn * gamma[None, None, None, :] + beta[None, None, None, :]
    if film is not None:
        s, shift = film
        y = y * (1.0 + s.astype(jnp.float32))[:, None, None, :] + shift[
            :, None, None, :
        ].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    out = jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + bias[None, None, None, :]


@pytest.mark.parametrize("mode", ["plain", "emb", "film"])
def test_gn_silu_conv_xla_matches_composition(mode):
    from probabilisticdeepdiffusionmodels_tpu.ops.gn_conv_pallas import (
        gn_silu_conv3x3_xla,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    gamma = jnp.asarray(rng.randn(64).astype(np.float32))
    beta = jnp.asarray(rng.randn(64).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, 64, 32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))
    emb = jnp.asarray(rng.randn(2, 64).astype(np.float32)) if mode == "emb" else None
    film = (
        (
            jnp.asarray(rng.randn(2, 64).astype(np.float32)),
            jnp.asarray(rng.randn(2, 64).astype(np.float32)),
        )
        if mode == "film"
        else None
    )
    ref = _manual_gn_silu_conv(x, gamma, beta, w, bias, 32, emb=emb, film=film)
    out = gn_silu_conv3x3_xla(
        x, gamma, beta, w, bias, num_groups=32, emb=emb, film=film
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["plain", "emb", "film"])
def test_gn_silu_conv_pallas_matches_xla(mode):
    from probabilisticdeepdiffusionmodels_tpu.ops.gn_conv_pallas import (
        gn_affine,
        gn_silu_conv3x3_pallas,
        gn_silu_conv3x3_xla,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    gamma = jnp.asarray(rng.randn(64).astype(np.float32))
    beta = jnp.asarray(rng.randn(64).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, 64, 32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))
    emb = jnp.asarray(rng.randn(2, 64).astype(np.float32)) if mode == "emb" else None
    film = (
        (
            jnp.asarray(rng.randn(2, 64).astype(np.float32)),
            jnp.asarray(rng.randn(2, 64).astype(np.float32)),
        )
        if mode == "film"
        else None
    )
    ref = gn_silu_conv3x3_xla(
        x, gamma, beta, w, bias, num_groups=32, emb=emb, film=film
    )
    a, off = gn_affine(x, gamma, beta, 32, 1e-5, emb=emb, film=film)
    out = gn_silu_conv3x3_pallas(x, a, off, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_scale_shift", [False, True])
def test_fused_gn_conv_in_model_matches_and_trains(use_scale_shift):
    """use_pallas_conv routes GN+SiLU+conv3x3 (with the emb add / FiLM
    folded in) through the fused op with an identical param tree."""
    import unittest.mock as mock
    import probabilisticdeepdiffusionmodels_tpu.ops.gn_conv_pallas as gcp
    from probabilisticdeepdiffusionmodels_tpu.models import get_model

    orig = gcp.gn_silu_conv3x3_pallas
    with mock.patch.object(
        gcp, "gn_silu_conv3x3_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    ):
        cfg = dict(name="unet", in_channels=3, model_channels=32,
                   num_res_blocks=1, attention_resolutions=[],
                   channel_mult=[1, 2], use_scale_shift_norm=use_scale_shift)
        m_ref = get_model(8, dict(cfg))
        m_fused = get_model(8, dict(cfg, use_pallas_conv=True))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        t = jnp.ones((2,), jnp.int32)
        params = m_ref.init(jax.random.PRNGKey(1), x, t)["params"]
        p2 = m_fused.init(jax.random.PRNGKey(1), x, t)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(p2)

        leaves, tree = jax.tree.flatten(params)
        leaves = [l + 0.02 * jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(2), i), l.shape)
            for i, l in enumerate(leaves)]
        params = jax.tree.unflatten(tree, leaves)

        ref = m_ref.apply({"params": params}, x, t)
        out = m_fused.apply({"params": params}, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)

        def loss(p):
            return jnp.mean(jnp.square(m_fused.apply({"params": p}, x, t)))

        g = jax.grad(loss)(params)
        gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
        assert np.isfinite(gn) and gn > 0

        # grads match the unfused model (backward is the same math)
        def loss_ref(p):
            return jnp.mean(jnp.square(m_ref.apply({"params": p}, x, t)))

        g_ref = jax.grad(loss_ref)(params)
        for a_, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=5e-3, atol=5e-4)


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
