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
    qs = (q * scale).astype(jnp.float32)
    ks = (k * scale).astype(jnp.float32)
    scores = jax.lax.dot_general(
        qs, ks, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = jax.nn.softmax(scores, axis=-1)
    # keep the second matmul in f32 too: this Mosaic build rejects bf16 lhs
    # ("Bad lhs type" on vector<...xbf16> tpu.matmul), and f32 accumulate
    # matches the XLA path's softmax@v numerics
    out = jax.lax.dot_general(
        w, v.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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
