"""NN primitives for the model zoo.

TPU-native equivalents of the reference's primitive layer set
(reference: src/modules/nn.py:13-122).  Differences by design:
  * NHWC layout (XLA's preferred conv layout on TPU) instead of NCHW.
  * GroupNorm computes in float32 and casts back (GroupNorm32 semantics,
    reference src/modules/nn.py:18-20) regardless of the compute dtype,
    which on TPU is typically bfloat16.
  * Initializers replicate torch's Conv/Linear defaults
    (kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for
    both weight and bias) so parameter distributions match the reference.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def torch_conv_kernel_init(dtype=jnp.float32) -> Callable:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv/Linear default weight
    init (kaiming_uniform with a=sqrt(5))."""

    def init(key, shape, dtype=dtype):
        # flax conv kernels: (*window, in_features, out_features)
        # flax dense kernels: (in_features, out_features)
        fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int, dtype=jnp.float32) -> Callable:
    """torch Conv/Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvKernel(nn.Module):
    """Bare conv kernel/bias params with nn.Conv's naming and init — lets
    fused Pallas ops consume the exact same parameter tree that the
    unfused ``Conv`` path creates (checkpoint-compatible either way)."""

    features: int
    kernel_size: Tuple[int, ...]
    zero_init: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        fan_in = in_features * int(np.prod(self.kernel_size))
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            bias_init = nn.initializers.zeros
        else:
            kernel_init = torch_conv_kernel_init(self.param_dtype)
            bias_init = torch_bias_init(fan_in, self.param_dtype)
        kernel = self.param(
            "kernel",
            kernel_init,
            (*self.kernel_size, in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", bias_init, (self.features,), self.param_dtype
        )
        return kernel, bias


class Conv(nn.Module):
    """3x3/1x1 (or k^d) convolution with torch-default init.

    ``zero_init=True`` reproduces the reference's ``zero_module`` pattern
    (zeroed weight and bias, reference src/modules/nn.py:69-75) used for the
    last conv of every ResBlock / attention projection / final output conv.

    ``params_only=True`` returns the (kernel, bias) arrays instead of
    computing — same names, shapes and initializers — so fused Pallas ops
    can take over the compute without changing the parameter tree.
    """

    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    zero_init: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, params_only: bool = False):
        in_features = x.shape[-1]
        if params_only:
            return _ConvKernel(
                self.features,
                self.kernel_size,
                self.zero_init,
                self.param_dtype,
                name="conv",
            )(in_features)
        fan_in = in_features * int(np.prod(self.kernel_size))
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            bias_init = nn.initializers.zeros
        else:
            kernel_init = torch_conv_kernel_init(self.param_dtype)
            bias_init = torch_bias_init(fan_in, self.param_dtype)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="SAME" if all(k > 1 for k in self.kernel_size) else "VALID",
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class Linear(nn.Module):
    """Dense layer with torch-default init (reference src/modules/nn.py:36-40)."""

    features: int
    zero_init: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            bias_init = nn.initializers.zeros
        else:
            kernel_init = torch_conv_kernel_init(self.param_dtype)
            bias_init = torch_bias_init(fan_in, self.param_dtype)
        return nn.Dense(
            features=self.features,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="dense",
        )(x)


class _Affine(nn.Module):
    """Bare scale/bias params with nn.GroupNorm's naming, for fused kernels."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32, C) computed in float32, output cast back to the input
    dtype (reference src/modules/nn.py:18-20, 94-101).

    Like torch GroupNorm, group count falls back to C when C < 32 is not
    divisible; the reference always uses channel counts divisible by 32
    except tiny test configs, where we mirror torch's requirement that
    C % num_groups == 0 by reducing groups to gcd(32, C).

    ``use_pallas=True`` (4-D inputs) routes through the fused Pallas
    GN(+SiLU) kernel — same param tree (scale/bias under "norm"), Pallas
    forward, XLA-derived backward — and ``fuse_silu`` folds the activation
    into the kernel.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    use_pallas: bool = False
    fuse_silu: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, params_only: bool = False):
        channels = x.shape[-1]
        groups = math.gcd(self.num_groups, channels)
        orig_dtype = x.dtype
        if params_only:
            # same tree as nn.GroupNorm(name="norm"): norm/{scale,bias}
            scale, bias = _Affine(
                channels, param_dtype=self.param_dtype, name="norm"
            )()
            return scale, bias, groups
        if self.use_pallas and x.ndim == 4 and channels % groups == 0:
            from ..ops.groupnorm_pallas import group_norm_silu

            scale, bias = _Affine(
                channels, param_dtype=self.param_dtype, name="norm"
            )()
            return group_norm_silu(
                x, scale, bias, groups, self.epsilon, self.fuse_silu
            )
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="norm",
        )(x.astype(jnp.float32))
        y = y.astype(orig_dtype)
        if self.fuse_silu:
            y = silu(y)
        return y


def silu(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (reference src/modules/nn.py:13-15)."""
    return x * jax.nn.sigmoid(x)


def avg_pool_2d(x: jax.Array, window: int = 2) -> jax.Array:
    """Stride-2 average pool, NHWC (reference src/modules/nn.py:43-53)."""
    return nn.avg_pool(x, (window, window), strides=(window, window))


def avg_pool_nd(x: jax.Array, window: int = 2) -> jax.Array:
    """Stride-`window` average pool over every spatial dim of a
    channels-last (B, *spatial, C) array — the 1/2/3-D dispatch the
    reference does with avg_pool_nd (src/modules/nn.py:55-67)."""
    dims = x.ndim - 2
    return nn.avg_pool(x, (window,) * dims, strides=(window,) * dims)


def nearest_upsample_2d(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, NHWC (reference src/modules/unet.py:72-79)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def nearest_upsample_nd(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample over every spatial dim, channels-last.
    The reference's Upsample supports dims 1/2/3 via F.interpolate
    (src/modules/unet.py:54-82)."""
    if x.ndim == 4:
        return nearest_upsample_2d(x)
    for axis in range(1, x.ndim - 1):
        x = jnp.repeat(x, 2, axis=axis)
    return x


def bilinear_resize(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize used by the SuperRes conditioning path
    (reference src/modules/unet.py:540-543, F.interpolate mode='bilinear')."""
    return jax.image.resize(
        x, (x.shape[0], height, width, x.shape[-1]), method="bilinear"
    )
