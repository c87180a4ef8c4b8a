"""Fused QKV attention as a Pallas TPU kernel.

One grid cell per (batch, head): the whole (T, ch) q/k/v block and the
(T, T) score matrix live in VMEM (token counts in this framework are small —
attention runs on <=16x16=256-token feature maps, reference
config/model/unet.yaml:5 — so everything fits on-chip), producing a single
fused qk->softmax->v pipeline with no HBM round-trips between the stages.

Semantics identical to ops.attention.qkv_attention_xla (and therefore the
reference's QKVAttention, src/modules/unet.py:242-256): contiguous-chunk
head split of the fused channel axis, two-sided 1/sqrt(sqrt(ch)) scaling,
float32 softmax.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qkv_attention_pallas"]


def _attn_kernel(qkv_ref, out_ref, *, ch: int, scale: float):
    qkv = qkv_ref[0, 0]  # (T, 3ch)
    q = qkv[:, :ch]
    k = qkv[:, ch : 2 * ch]
    v = qkv[:, 2 * ch :]
    in_dtype = qkv.dtype
    if in_dtype == jnp.float32:
        # f32 inputs: HIGHEST pins true f32 MXU passes (parity with the
        # XLA path, which also pins HIGHEST for f32 — ops/attention.py)
        mm_kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        qs = (q * scale).astype(jnp.float32)
        ks = (k * scale).astype(jnp.float32)
        v_in = v.astype(jnp.float32)
    else:
        # bf16 inputs: native single-pass bf16 MXU matmul with f32
        # accumulation — same numerics as the XLA bf16 einsum path.
        # (Earlier Mosaic builds rejected bf16 matmul operands, forcing
        # f32 compute and losing to XLA end-to-end; re-measured when the
        # toolchain lifted that — scripts/probe_mosaic_bf16.py.)
        mm_kw = dict(preferred_element_type=jnp.float32)
        qs = q * scale
        ks = k * scale
        v_in = v
    scores = jax.lax.dot_general(
        qs, ks, dimension_numbers=(((1,), (1,)), ((), ())), **mm_kw
    )
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jax.lax.dot_general(
        w.astype(in_dtype) if in_dtype != jnp.float32 else w,
        v_in,
        dimension_numbers=(((1,), (0,)), ((), ())),
        **mm_kw,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def qkv_attention_pallas(
    qkv: jax.Array, num_heads: int = 1, *, interpret: bool = False
) -> jax.Array:
    """qkv: (B, T, 3C) -> (B, T, C); heads are contiguous channel chunks."""
    b, t, c3 = qkv.shape
    assert c3 % (3 * num_heads) == 0
    ch = c3 // (3 * num_heads)
    c = c3 // 3
    scale = 1.0 / math.sqrt(math.sqrt(ch))

    # (B, T, 3C) -> (B, H, T, 3ch): Mosaic requires the trailing block dims
    # to be full (or 8/128-aligned), so heads become a leading grid axis and
    # each block is the whole (T, 3ch) tile for one (batch, head).
    qkv_h = qkv.reshape(b, t, num_heads, 3 * ch).transpose(0, 2, 1, 3)

    kernel = functools.partial(_attn_kernel, ch=ch, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, num_heads),
        in_specs=[
            pl.BlockSpec(
                (1, 1, t, 3 * ch),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t, ch), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, t, ch), qkv.dtype),
        interpret=interpret,
    )(qkv_h)
    return out.transpose(0, 2, 1, 3).reshape(b, t, c)
