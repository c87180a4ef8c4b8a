"""Fused GroupNorm(+SiLU) as a Pallas TPU kernel.

The GN->SiLU prologue runs in front of every conv in the UNet's ResBlocks
(reference src/modules/unet.py:146-165); it is memory-bound, so fusing the
normalization statistics, the affine, and the activation into one VMEM pass
saves two HBM round-trips per block.

TPU-native formulation: per-group sums are computed as matmuls against a
channel->group one-hot mask (built with iota in-kernel), keeping every
reduction on the MXU with clean 128-lane tiling instead of awkward
(HW, G, C/G) reshapes.  GroupNorm statistics are computed in float32
regardless of input dtype (GroupNorm32 semantics, reference
src/modules/nn.py:18-20).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_silu_pallas", "group_norm_silu_xla"]


def group_norm_silu_xla(
    x: jax.Array, gamma: jax.Array, beta: jax.Array,
    num_groups: int = 32, eps: float = 1e-5, silu: bool = True,
) -> jax.Array:
    """XLA reference path (and autodiff path). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    y = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, num_groups, eps, silu, hw, c):
    xf = x_ref[0].astype(jnp.float32)  # (HW, C)
    cg = c // num_groups
    # channel -> group one-hot mask, (C, G)
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    mask = (ch_ids // cg == g_ids).astype(jnp.float32)

    n = jnp.float32(hw * cg)
    sums = jnp.dot(
        jnp.sum(xf, axis=0, keepdims=True), mask,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, G)
    sumsq = jnp.dot(
        jnp.sum(xf * xf, axis=0, keepdims=True), mask,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, G)
    mean_g = sums / n
    var_g = sumsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels: (1, C)
    mean_c = jnp.dot(mean_g, mask.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    rstd_c = jnp.dot(rstd_g, mask.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    y = (xf - mean_c) * rstd_c
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_silu(
    x: jax.Array, gamma: jax.Array, beta: jax.Array,
    num_groups: int = 32, eps: float = 1e-5, silu: bool = True,
) -> jax.Array:
    """Differentiable fused GN(+SiLU): Pallas forward, XLA-derived backward.

    The backward pass rematerializes through the XLA reference path (exact
    same math), so the op is trainable while the forward enjoys the fused
    VMEM schedule."""
    return group_norm_silu_pallas(x, gamma, beta, num_groups, eps, silu)


def _gns_fwd(x, gamma, beta, num_groups, eps, silu):
    return group_norm_silu(x, gamma, beta, num_groups, eps, silu), (x, gamma, beta)


def _gns_bwd(num_groups, eps, silu, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, gamma, beta: group_norm_silu_xla(
            x, gamma, beta, num_groups, eps, silu
        ),
        x, gamma, beta,
    )
    return vjp(g)


group_norm_silu.defvjp(_gns_fwd, _gns_bwd)


def group_norm_silu_pallas(
    x: jax.Array, gamma: jax.Array, beta: jax.Array,
    num_groups: int = 32, eps: float = 1e-5, silu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused GN(+SiLU). x: (B, H, W, C); gamma/beta: (C,)."""
    b, h, w, c = x.shape
    assert c % num_groups == 0
    hw = h * w
    x2 = x.reshape(b, hw, c)
    kernel = functools.partial(
        _gn_kernel, num_groups=num_groups, eps=eps, silu=silu, hw=hw, c=c
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x2, gamma, beta)
    return out.reshape(b, h, w, c)
