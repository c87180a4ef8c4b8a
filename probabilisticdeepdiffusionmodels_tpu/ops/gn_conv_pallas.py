"""Fused GroupNorm+SiLU -> 3x3 conv as a Pallas TPU kernel.

Why: every ResBlock runs GN -> SiLU -> conv twice (reference
src/modules/unet.py:146-165).  XLA fuses GN's affine+SiLU into one
elementwise pass, but it cannot fuse a normalization into a convolution's
input, so each GN materializes a full normalized activation tensor in HBM
(write + re-read) before the conv.  At CIFAR shapes the UNet ResBlocks are
near 1:1 compute:HBM-traffic, so that extra round-trip is pure wall-clock.

TPU-native split:
  * statistics in XLA: one fused pass over x yields per-(sample, channel)
    moments; group stats + the GN affine + an optional timestep-embedding
    bias (the ResBlock's ``h + emb_out``, reference unet.py:188-195) or
    FiLM scale/shift (``use_scale_shift_norm``, unet.py:192-196) all fold
    into ONE per-(sample, channel) scale/offset (a, b) — the biased /
    normalized tensor is never materialized;
  * the kernel: silu(x*a + b) in VMEM, then the 3x3 SAME conv as 9
    shifted (NB*H*W, Cin) @ (Cin, Cout) MXU matmuls from a zero-padded
    VMEM scratch, f32 accumulation, fused bias.  Blocks are whole images
    (NB samples per block) so there is no inter-tile halo; weights are
    grid-invariant and stay resident in VMEM.

Training still works: a custom VJP rematerializes the exact XLA math for
the backward pass (same trick as ops/groupnorm_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_silu_conv3x3", "gn_silu_conv3x3_xla", "gn_affine"]

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under ~16MB/core


def gn_affine(x, gamma, beta, num_groups, eps, emb=None, film=None):
    """Fold GroupNorm stats (+ optional bias / FiLM) into per-(B, C)
    scale/offset: the fused prologue is then a single FMA:

      normalize(x + emb) * gamma + beta            == x * a + b   (emb mode)
      (normalize(x)*gamma + beta)*(1+s) + shift    == x * a + b   (film mode)

    One fused XLA pass over x (moments); everything else is (B, C)-sized.
    emb: (B, C) or None; film: ((B, C) scale, (B, C) shift) or None.
    Stats are float32 (GroupNorm32 semantics).
    """
    b, c = x.shape[0], x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, -1, c)
    # per-channel moments, one pass
    mu_c = jnp.mean(xf, axis=1)               # (B, C)
    m2_c = jnp.mean(xf * xf, axis=1)          # (B, C)
    if emb is not None:
        e = emb.astype(jnp.float32)
        m2_c = m2_c + 2.0 * e * mu_c + e * e  # E[(x+e)^2] per channel
        mu_c = mu_c + e
    # group stats
    mu_g = jnp.mean(mu_c.reshape(b, g, c // g), axis=2)
    m2_g = jnp.mean(m2_c.reshape(b, g, c // g), axis=2)
    var_g = m2_g - mu_g * mu_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_ch = jnp.repeat(mu_g, c // g, axis=1)    # (B, C)
    rstd_ch = jnp.repeat(rstd_g, c // g, axis=1)  # (B, C)
    gam = gamma.astype(jnp.float32)[None, :]
    bet = beta.astype(jnp.float32)[None, :]
    a = rstd_ch * gam
    off = bet - mean_ch * a
    if emb is not None:
        off = off + emb.astype(jnp.float32) * a
    if film is not None:
        s, shift = film
        s = 1.0 + s.astype(jnp.float32)
        a = a * s
        off = off * s + shift.astype(jnp.float32)
    return a, off


def _affine_silu_conv_xla(x, a, off, w, bias):
    ndim_sp = x.ndim - 2
    a = a.reshape(a.shape[0], *(1,) * ndim_sp, a.shape[-1])
    off = off.reshape(off.shape[0], *(1,) * ndim_sp, off.shape[-1])
    y = x.astype(jnp.float32) * a + off
    y = y * jax.nn.sigmoid(y)
    y = y.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def gn_silu_conv3x3_xla(x, gamma, beta, w, bias, *, num_groups=32,
                        eps=1e-5, emb=None, film=None):
    """Reference/backward path: same math through plain XLA ops."""
    a, off = gn_affine(x, gamma, beta, num_groups, eps, emb=emb, film=film)
    return _affine_silu_conv_xla(x, a, off, w, bias)


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, out_ref, *, nb, h, wd,
            cin, cout):
    """One block: (NB, H, W, Cin) -> (NB, H, W, Cout)."""
    x = x_ref[...]                                   # (NB, H, W, Cin)
    a = a_ref[...].reshape(nb, 1, 1, cin)            # (1, NB, Cin) f32
    b = b_ref[...].reshape(nb, 1, 1, cin)
    y = x.astype(jnp.float32) * a + b
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)

    # zero-pad via concatenate (Mosaic has no scatter; .at[].set would fail)
    zrow = jnp.zeros((nb, 1, wd + 2, cin), x.dtype)
    zcol = jnp.zeros((nb, h, 1, cin), x.dtype)
    pad = jnp.concatenate([zcol, y, zcol], axis=2)
    pad = jnp.concatenate([zrow, pad, zrow], axis=1)

    acc = jnp.zeros((nb * h * wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = pad[:, dy : dy + h, dx : dx + wd, :].reshape(
                nb * h * wd, cin
            )
            acc += jnp.dot(
                win, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc += bias_ref[...].astype(jnp.float32)[None, :]
    out_ref[...] = acc.reshape(nb, h, wd, cout).astype(out_ref.dtype)


def _block_bytes(nb, h, wd, cin, cout, itemsize):
    """Scoped-VMEM estimate for one grid step: double-buffered in/out
    blocks (Mosaic pipelines the grid), the zero-padded copy, the f32
    affine+SiLU temp, and the f32 accumulator.  Undercounting here is a
    compile-time scoped-vmem OOM on real TPU (seen at bf16: the old
    x+pad-only model picked nb=4 at the 16x16x512->256 site => 17.6M >
    the 16M scoped limit), so every live temp is counted."""
    in_blk = nb * h * wd * cin * itemsize
    pad = nb * (h + 2) * (wd + 2) * cin * itemsize
    y32 = nb * h * wd * cin * 4
    out_blk = nb * h * wd * cout * itemsize
    acc = nb * h * wd * cout * 4
    return 2 * in_blk + pad + y32 + 2 * out_blk + acc


def _pick_nb(batch, h, wd, cin, cout, itemsize):
    """Samples per block: enough rows to feed the MXU, bounded by VMEM."""
    weights = 9 * cin * cout * itemsize
    nb = 1
    while (
        nb < batch
        and batch % (nb * 2) == 0
        and nb * 2 * h * wd <= 4096
        and _block_bytes(nb * 2, h, wd, cin, cout, itemsize)
        < _VMEM_BUDGET - weights
    ):
        nb *= 2
    return nb


def fits_pallas(x_shape, cout, itemsize):
    """Dispatch gate: VMEM fit + Mosaic tiling constraints.

    Whole-image blocks must fit VMEM (one sample, padded + output, all
    pipeline/temp buffers counted — _block_bytes), and the channel dims
    must be multiples of the 128-wide vector lane so the (..., C) blocks
    tile without Mosaic relayouts — small-channel models (e.g. 32ch test
    UNets) fall back to XLA instead of risking a Mosaic compile failure
    on real TPU (ADVICE r2).
    """
    b, h, wd, cin = x_shape
    if cin % 128 or cout % 128:
        return False
    need = _block_bytes(1, h, wd, cin, cout, itemsize) + 9 * cin * cout * itemsize
    return need < _VMEM_BUDGET


def gn_silu_conv3x3_pallas(x, a, off, w, bias, interpret=False):
    """Fused forward from pre-folded affine.  x: (B, H, W, Cin);
    a/off: (B, Cin) f32; w: (3, 3, Cin, Cout)."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    nb = _pick_nb(b, h, wd, cin, cout, x.dtype.itemsize)
    kernel = functools.partial(
        _kernel, nb=nb, h=h, wd=wd, cin=cin, cout=cout
    )
    flops = 2 * b * h * wd * 9 * cin * cout
    return pl.pallas_call(
        kernel,
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, wd, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (grid, NB, Cin) so the trailing block dims equal the array
            # dims (Mosaic's sublane/lane divisibility rule)
            pl.BlockSpec((1, nb, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * h * wd * cout * x.dtype.itemsize,
            transcendentals=x.size,
        ),
        interpret=interpret,
    )(x, a.astype(jnp.float32).reshape(b // nb, nb, cin),
      off.astype(jnp.float32).reshape(b // nb, nb, cin),
      w.astype(x.dtype), bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(num_groups, eps, interpret, x, gamma, beta, w, bias, emb,
           film_scale, film_shift):
    film = None if film_scale is None else (film_scale, film_shift)
    a, off = gn_affine(x, gamma, beta, num_groups, eps, emb=emb, film=film)
    if fits_pallas(x.shape, w.shape[-1], x.dtype.itemsize):
        return gn_silu_conv3x3_pallas(x, a, off, w, bias, interpret=interpret)
    return _affine_silu_conv_xla(x, a, off, w, bias)


def _fused_fwd(num_groups, eps, interpret, x, gamma, beta, w, bias, emb,
               film_scale, film_shift):
    out = _fused(num_groups, eps, interpret, x, gamma, beta, w, bias, emb,
                 film_scale, film_shift)
    return out, (x, gamma, beta, w, bias, emb, film_scale, film_shift)


def _fused_bwd(num_groups, eps, interpret, res, g):
    x, gamma, beta, w, bias, emb, film_scale, film_shift = res

    def f(x, gamma, beta, w, bias, emb, film_scale, film_shift):
        film = None if film_scale is None else (film_scale, film_shift)
        return gn_silu_conv3x3_xla(
            x, gamma, beta, w, bias, num_groups=num_groups, eps=eps,
            emb=emb, film=film,
        )

    # jax.vjp over None args: treat them as empty pytrees
    args = (x, gamma, beta, w, bias, emb, film_scale, film_shift)
    _, vjp = jax.vjp(f, *args)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_conv3x3(x, gamma, beta, w, bias, *, num_groups=32, eps=1e-5,
                    emb=None, film=None, interpret=False):
    """Differentiable fused GN(+emb|FiLM)+SiLU+conv3x3.

    Pallas forward (whole-image blocks; falls back to the identical XLA
    math when a block would not fit VMEM), XLA-derived backward.
    """
    fs, fsh = film if film is not None else (None, None)
    return _fused(num_groups, eps, interpret, x, gamma, beta, w, bias,
                  emb, fs, fsh)
