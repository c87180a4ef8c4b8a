"""Encoder-feature-reuse sampling acceleration (Faster Diffusion,
arXiv:2312.09608 — a capability extension absent in the reference).

Contract under test:
  * UNet ``return_cache`` / ``cache=`` round-trip is exact: decoding from the
    cache of the same (x, t) reproduces the full forward bit-for-bit;
  * ``p_sample_loop(encoder_reuse=1)`` is the exact sampler (bitwise equal);
  * k>1 runs (with a T % k prologue), stays finite, and differs from exact
    once the model output actually depends on its input;
  * the engine endpoint accepts the flag.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticdeepdiffusionmodels_tpu.core import (
    DiffusionTables,
    NoiseSchedule,
)
from probabilisticdeepdiffusionmodels_tpu.models import get_model
from probabilisticdeepdiffusionmodels_tpu.sample import p_sample_loop


@pytest.fixture(scope="module")
def small_unet():
    model = get_model(
        8,
        dict(
            name="unet",
            in_channels=3,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=[4],
            channel_mult=[1, 2],
            num_heads=2,
        ),
    )
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    t = jnp.ones((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    # un-zero the output conv so eps depends on the input (zero-init makes
    # every sampler trajectory identical regardless of caching)
    # un-zero the zero-init convs so eps depends on input AND timestep
    # (at init every ResBlock's second conv and the output conv are zeroed,
    # making the whole net input- and t-independent)
    params = jax.tree_util.tree_map(lambda p: p, params)
    for name in ("out_conv", "up0_0_res", "mid0_0_res"):
        sub = params[name]
        sub = sub["out_conv"] if "out_conv" in sub else sub
        sub["conv"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(7), sub["conv"]["kernel"].shape)
            * 0.05
        )

    def apply_fn(p, xx, tt, yy=None, **kw):
        return model.apply({"params": p}, xx, tt, yy, **kw)

    return model, params, apply_fn


def test_cache_roundtrip_exact(small_unet):
    model, params, apply_fn = small_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 5, jnp.int32)
    full, cache = apply_fn(params, x, t, return_cache=True)
    h_enc, skips = cache
    assert h_enc.shape[0] == 2 and len(skips) >= 2
    cached = apply_fn(params, x, t, cache=cache)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


def test_cached_step_ignores_new_x_depends_on_t(small_unet):
    """The cached decoder depends on x only through the cache — and still
    moves with t (fresh timestep embedding)."""
    model, params, apply_fn = small_unet
    x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3), jnp.float32)
    x2 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3), jnp.float32)
    t5 = jnp.full((2,), 5, jnp.int32)
    t4 = jnp.full((2,), 4, jnp.int32)
    _, cache = apply_fn(params, x1, t5, return_cache=True)
    a = apply_fn(params, x2, t5, cache=cache)
    b = apply_fn(params, x1, t5, cache=cache)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = apply_fn(params, x1, t4, cache=cache)
    assert not np.allclose(np.asarray(b), np.asarray(c))


def test_reuse1_is_exact(small_unet):
    model, params, apply_fn = small_unet
    sched = NoiseSchedule.create(diffusion_steps=10, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    key = jax.random.PRNGKey(4)
    x_T = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    exact = p_sample_loop(apply_fn, params, tables, x_T, key, clip=True)
    k1 = p_sample_loop(
        apply_fn, params, tables, x_T, key, clip=True, encoder_reuse=1
    )
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(k1))


@pytest.mark.parametrize("k", [2, 3, 4])  # 10 % 3 != 0 exercises the prologue
def test_reuse_k_runs_and_approximates(small_unet, k):
    model, params, apply_fn = small_unet
    sched = NoiseSchedule.create(diffusion_steps=10, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    key = jax.random.PRNGKey(5)
    x_T = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    exact = p_sample_loop(apply_fn, params, tables, x_T, key, clip=True)

    fn = jax.jit(
        lambda p, xt, kk: p_sample_loop(
            apply_fn, p, tables, xt, kk, clip=True, encoder_reuse=k
        )
    )
    out = fn(params, x_T, key)
    assert out.shape == exact.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # same z stream and same schedule: the approximation stays in the same
    # ballpark as the exact trajectory...
    assert float(jnp.max(jnp.abs(out - exact))) < 10.0
    # ...but is NOT the exact sampler (the model depends on its input here)
    assert not np.array_equal(np.asarray(out), np.asarray(exact))


def test_engine_endpoint_accepts_encoder_reuse():
    from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine

    eng = DiffusionEngine(
        model_config=dict(
            name="unet",
            in_channels=1,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=[],
            channel_mult=[1],
            num_heads=1,
        ),
        optimizer_config=dict(lr=1e-4),
        diffusion_steps=6,
        mode="cosine",
        resolution=8,
        encoder_reuse=2,
    )
    imgs = eng.generate_images(n=2, minibatch=2, seed=0)
    assert imgs.shape == (2, 8, 8, 1)
    assert np.isfinite(imgs).all()
    # per-call override back to exact
    imgs2 = eng.generate_images(n=2, minibatch=2, seed=0, encoder_reuse=1)
    assert np.isfinite(imgs2).all()


def test_reuse_exact_windows_cover_chain_is_exact(small_unet):
    """exact_head + exact_tail spanning the whole chain == exact sampler
    (every step runs full), regardless of k."""
    model, params, apply_fn = small_unet
    sched = NoiseSchedule.create(diffusion_steps=10, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    key = jax.random.PRNGKey(6)
    x_T = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    exact = p_sample_loop(apply_fn, params, tables, x_T, key, clip=True)
    covered = p_sample_loop(
        apply_fn, params, tables, x_T, key, clip=True, encoder_reuse=3,
        reuse_exact_head=4, reuse_exact_tail=6,
    )
    np.testing.assert_allclose(np.asarray(covered), np.asarray(exact),
                               atol=1e-6)


@pytest.mark.parametrize("head,tail", [(0, 4), (3, 0), (2, 3)])
def test_reuse_exact_windows_run(small_unet, head, tail):
    """Partial exact windows jit, stay finite, and land closer to (or at
    least not wildly off) the exact chain."""
    model, params, apply_fn = small_unet
    sched = NoiseSchedule.create(diffusion_steps=10, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    key = jax.random.PRNGKey(8)
    x_T = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    exact = p_sample_loop(apply_fn, params, tables, x_T, key, clip=True)
    out = jax.jit(
        lambda p, xt, kk: p_sample_loop(
            apply_fn, p, tables, xt, kk, clip=True, encoder_reuse=2,
            reuse_exact_head=head, reuse_exact_tail=tail,
        )
    )(params, x_T, key)
    assert out.shape == exact.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ddim_encoder_reuse(small_unet):
    """DDIM + encoder cache: k=1 is the exact DDIM chain; k>1 jits, stays
    finite, approximates (and differs once eps depends on the input)."""
    from probabilisticdeepdiffusionmodels_tpu.sample import ddim_sample_loop

    model, params, apply_fn = small_unet
    sched = NoiseSchedule.create(diffusion_steps=10, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    key = jax.random.PRNGKey(9)
    x_T = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    exact = ddim_sample_loop(apply_fn, params, tables, x_T, key, clip=True)
    k1 = ddim_sample_loop(
        apply_fn, params, tables, x_T, key, clip=True, encoder_reuse=1
    )
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(k1))
    for k in (2, 3):
        out = jax.jit(
            lambda p, xt, kk, _k=k: ddim_sample_loop(
                apply_fn, p, tables, xt, kk, clip=True, encoder_reuse=_k
            )
        )(params, x_T, key)
        assert out.shape == exact.shape
        assert bool(jnp.all(jnp.isfinite(out)))
        assert not np.array_equal(np.asarray(out), np.asarray(exact))


def test_cache_middle_roundtrip_exact(small_unet):
    """Middle-block caching ("Cache Me if You Can"-style deeper caching):
    decoding from a cache_middle cache of the same (x, t) reproduces the
    full forward bit-for-bit (the decoder sees identical inputs)."""
    model, params, apply_fn = small_unet
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 5, jnp.int32)
    full, cache = apply_fn(
        params, x, t, return_cache=True, cache_middle=True
    )
    cached = apply_fn(params, x, t, cache=cache, cache_middle=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


def test_cache_middle_skips_middle_block(small_unet):
    """With cache_middle the cached h is post-middle: consuming at a new t
    still moves the output (decoder emb is fresh) but differs from the
    encoder-only cache at the same t (whose middle block reruns with the
    fresh emb)."""
    model, params, apply_fn = small_unet
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 8, 8, 3), jnp.float32)
    t5 = jnp.full((2,), 5, jnp.int32)
    t4 = jnp.full((2,), 4, jnp.int32)
    _, cache_enc = apply_fn(params, x, t5, return_cache=True)
    _, cache_mid = apply_fn(
        params, x, t5, return_cache=True, cache_middle=True
    )
    a = apply_fn(params, x, t4, cache=cache_enc)
    b = apply_fn(params, x, t4, cache=cache_mid, cache_middle=True)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    c = apply_fn(params, x, t5, cache=cache_mid, cache_middle=True)
    assert not np.array_equal(np.asarray(b), np.asarray(c))


@pytest.mark.parametrize("k", [2, 3])
def test_reuse_cache_middle_runs_and_approximates(small_unet, k):
    model, params, apply_fn = small_unet
    sched = NoiseSchedule.create(diffusion_steps=10, mode="cosine")
    tables = DiffusionTables.from_schedule(sched)
    key = jax.random.PRNGKey(13)
    x_T = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    exact = p_sample_loop(apply_fn, params, tables, x_T, key, clip=True)
    out = jax.jit(
        lambda p, xt, kk: p_sample_loop(
            apply_fn, p, tables, xt, kk, clip=True, encoder_reuse=k,
            reuse_cache_middle=True,
        )
    )(params, x_T, key)
    assert out.shape == exact.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert not np.array_equal(np.asarray(out), np.asarray(exact))
    # deeper caching than encoder-only reuse: also differs from it
    enc_only = p_sample_loop(
        apply_fn, params, tables, x_T, key, clip=True, encoder_reuse=k
    )
    assert not np.array_equal(np.asarray(out), np.asarray(enc_only))


def test_engine_endpoint_accepts_cache_middle():
    from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine

    eng = DiffusionEngine(
        model_config=dict(
            name="unet",
            in_channels=1,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=[],
            channel_mult=[1],
            num_heads=1,
        ),
        optimizer_config=dict(lr=1e-4),
        diffusion_steps=6,
        mode="cosine",
        resolution=8,
        encoder_reuse=2,
        reuse_cache_middle=True,
    )
    imgs = eng.generate_images(n=2, minibatch=2, seed=0)
    assert imgs.shape == (2, 8, 8, 1) and np.isfinite(imgs).all()
    # the DDIM path rejects the ancestral-only knob instead of ignoring it
    with pytest.raises(ValueError):
        eng.generate_images(n=2, minibatch=2, seed=0, ddim=True)


def test_engine_ddim_encoder_reuse_endpoint():
    from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine

    eng = DiffusionEngine(
        model_config=dict(
            name="unet",
            in_channels=1,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=[],
            channel_mult=[1],
            num_heads=1,
        ),
        optimizer_config=dict(lr=1e-4),
        diffusion_steps=6,
        mode="cosine",
        resolution=8,
    )
    imgs = eng.generate_images(
        n=2, minibatch=2, seed=0, ddim=True, encoder_reuse=2
    )
    assert imgs.shape == (2, 8, 8, 1) and np.isfinite(imgs).all()
