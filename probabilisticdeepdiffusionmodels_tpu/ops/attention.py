"""QKV self-attention op: XLA reference path + Pallas TPU kernel.

TPU-native equivalent of the reference's QKVAttention
(reference: src/modules/unet.py:237-256).  Semantics preserved exactly:
  * heads are contiguous chunks of the fused qkv channel axis (the
    reference's ``qkv.reshape(b*heads, -1, T)``, unet.py:230);
  * two-sided 1/sqrt(sqrt(ch_per_head)) scaling applied to q and k before
    the product (more stable in low precision, unet.py:251-254);
  * softmax computed in float32 and cast back (unet.py:255).

Token counts here are small (<=1024: attention runs at ds 8/16 feature maps,
see reference config/model/unet.yaml:5), so a single fused Pallas kernel per
(batch, head) that keeps the whole score matrix in VMEM is the right shape;
the XLA path is the fallback and the autodiff path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["qkv_attention", "qkv_attention_xla"]


def _split_heads(qkv: jax.Array, num_heads: int):
    """(B, T, 3C) -> q, k, v each (B, T, H, C/H), head chunks contiguous."""
    b, t, c3 = qkv.shape
    assert c3 % (3 * num_heads) == 0, (c3, num_heads)
    ch = c3 // (3 * num_heads)
    qkv = qkv.reshape(b, t, num_heads, 3 * ch)
    q, k, v = qkv[..., :ch], qkv[..., ch : 2 * ch], qkv[..., 2 * ch :]
    return q, k, v


def qkv_attention_xla(qkv: jax.Array, num_heads: int = 1) -> jax.Array:
    """Fused-qkv attention via einsum (XLA fuses/tiles onto the MXU).

    Matmul precision is pinned to HIGHEST: in float32 this matches the
    reference's f32 attention math (XLA's *default* would silently
    strength-reduce f32 matmuls); low-precision speed on TPU comes from
    feeding bfloat16 inputs (the model's compute dtype), where HIGHEST is
    simply the native bf16 MXU path.
    """
    b, t, c3 = qkv.shape
    q, k, v = _split_heads(qkv, num_heads)
    ch = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    # HIGHEST only for f32 inputs (XLA CPU/TPU would otherwise silently
    # strength-reduce f32 matmuls).  For bf16 inputs HIGHEST would instead
    # *emulate* f32 with multi-pass bf16 — there the single-pass native MXU
    # matmul with f32 accumulation is both the fast and the intended path.
    prec = jax.lax.Precision.HIGHEST if qkv.dtype == jnp.float32 else None
    weight = jnp.einsum(
        "bthc,bshc->bhts", q * scale, k * scale,
        precision=prec, preferred_element_type=jnp.float32,
    )
    weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum(
        "bhts,bshc->bthc", weight, v,
        precision=prec, preferred_element_type=jnp.float32,
    ).astype(qkv.dtype)
    return out.reshape(b, t, c3 // 3)


def qkv_attention(
    qkv: jax.Array, num_heads: int = 1, *, use_pallas: bool = False,
    min_tokens: int = 0,
) -> jax.Array:
    """Dispatch: Pallas fused kernel on TPU when enabled, XLA otherwise.

    ``min_tokens`` gates the Pallas path by sequence length: measured on
    v5e-1 the fused kernel wins only at the largest attention site
    (256 tokens: 1650 vs 1774 us; 64/16 tokens: XLA wins — docs/KERNELS.md),
    so callers enable Pallas per-site by static token count.
    """
    if use_pallas and qkv.shape[1] >= min_tokens:
        from .attention_pallas import qkv_attention_pallas

        return qkv_attention_pallas(qkv, num_heads)
    return qkv_attention_xla(qkv, num_heads)
