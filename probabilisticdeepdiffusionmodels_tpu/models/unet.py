"""Flax UNet with timestep embedding and spatial self-attention.

TPU-native re-implementation of the improved-diffusion-derived UNet the
reference uses (reference: src/modules/unet.py:282-550).  Architecture,
block ordering, zero-init points, attention scaling and head-splitting all
match the reference; the implementation is NHWC, bfloat16-capable, and
structured as pure Flax modules so the whole model jits/shards/remats as one
XLA program.

Capability map vs the reference:
  * ResBlock (GN-SiLU-conv + time-emb add or FiLM scale-shift + GN-SiLU-
    dropout-zeroconv, skip 1x1/3x3)  — reference src/modules/unet.py:111-201
  * AttentionBlock (GN → 1x1 qkv → per-head QKV attention with
    1/sqrt(sqrt(ch)) two-sided scaling, f32 softmax, zero-init projection,
    residual)                         — reference src/modules/unet.py:204-256
  * Up/Downsample (nearest-2x / stride-2 conv or avg-pool)
                                      — reference src/modules/unet.py:54-108
  * UNetModel (encoder/middle/decoder with skip-concat, time + optional
    class embedding, zero-init output conv, feature-vector taps)
                                      — reference src/modules/unet.py:282-527
  * SuperResModel (bilinear-upsampled low-res conditioning by concat)
                                      — reference src/modules/unet.py:530-550
  * use_checkpoint → jax.checkpoint (rematerialization) per block, the XLA
    equivalent of the reference's CheckpointFunction
                                      — reference src/modules/nn.py:125-171
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.diffusion import timestep_embedding
from ..ops.attention import qkv_attention
from .layers import (
    Conv,
    GroupNorm32,
    Linear,
    avg_pool_nd,
    bilinear_resize,
    nearest_upsample_nd,
    silu,
)

Dtype = Any


class ResBlock(nn.Module):
    """Residual block conditioned on the timestep embedding
    (reference src/modules/unet.py:111-201).

    ``use_pallas_conv`` routes both GN->SiLU->conv3x3 pipelines through the
    fused Pallas kernel (ops/gn_conv_pallas.py) — the timestep-embedding add
    (or FiLM scale/shift) folds into the kernel's affine prologue, so the
    biased/normalized activations never round-trip HBM.  The parameter tree
    is identical either way (params_only paths of GroupNorm32/Conv).
    Falls back to the unfused path for non-2D inputs or an active dropout.
    """

    out_channels: int
    dropout: float = 0.0
    use_conv_skip: bool = False          # 3x3 skip instead of 1x1
    use_scale_shift_norm: bool = False
    use_pallas_gn: bool = False
    use_pallas_conv: bool = False
    dims: int = 2
    dtype: Dtype = jnp.float32
    # train is a module FIELD, not a __call__ arg: under use_checkpoint the
    # block is wrapped in nn.remat, which traces every call argument — a
    # bool call arg would become a tracer and crash the Python branch on it
    # (found by tests/test_unet.py::test_remat_grads_match)
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array):
        train = self.train
        in_channels = x.shape[-1]
        k3, k1 = (3,) * self.dims, (1,) * self.dims
        fused = (
            self.use_pallas_conv
            and self.dims == 2
            and (self.dropout == 0.0 or not train)
        )

        if fused:
            from ..ops.gn_conv_pallas import gn_silu_conv3x3

            g1, b1, groups1 = GroupNorm32(name="in_norm")(
                x, params_only=True
            )
            w1, c1 = Conv(
                self.out_channels, k3, dtype=self.dtype, name="in_conv"
            )(x, params_only=True)
            h = gn_silu_conv3x3(x, g1, b1, w1, c1, num_groups=groups1)
        else:
            h = GroupNorm32(
                use_pallas=self.use_pallas_gn, fuse_silu=True, name="in_norm"
            )(x)
            h = Conv(self.out_channels, k3, dtype=self.dtype, name="in_conv")(h)

        emb_out = Linear(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(silu(emb)).astype(h.dtype)

        if fused:
            g2, b2, groups2 = GroupNorm32(name="out_norm")(
                h, params_only=True
            )
            w2, c2 = Conv(
                self.out_channels, k3, zero_init=True, dtype=self.dtype,
                name="out_conv",
            )(h, params_only=True)
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = gn_silu_conv3x3(
                    h, g2, b2, w2, c2, num_groups=groups2,
                    film=(scale, shift),
                )
            else:
                h = gn_silu_conv3x3(
                    h, g2, b2, w2, c2, num_groups=groups2, emb=emb_out
                )
        else:
            emb_sp = emb_out.reshape(emb_out.shape[0], *(1,) * self.dims, -1)
            if self.use_scale_shift_norm:
                # affine between GN and SiLU: not fusable by XLA
                scale, shift = jnp.split(emb_sp, 2, axis=-1)
                h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
                h = silu(h)
            else:
                h = h + emb_sp
                h = GroupNorm32(
                    use_pallas=self.use_pallas_gn, fuse_silu=True,
                    name="out_norm",
                )(h)
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
            h = Conv(
                self.out_channels, k3, zero_init=True, dtype=self.dtype,
                name="out_conv",
            )(h)

        if self.out_channels == in_channels:
            skip = x
        elif self.use_conv_skip:
            skip = Conv(self.out_channels, k3, dtype=self.dtype, name="skip_conv")(x)
        else:
            skip = Conv(self.out_channels, k1, dtype=self.dtype, name="skip_conv")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H*W tokens
    (reference src/modules/unet.py:204-256).

    Head split matches the reference's contiguous-chunk reshape of the qkv
    channel axis (unet.py:230: ``qkv.reshape(b*heads, -1, T)``), and the
    two-sided 1/sqrt(sqrt(ch_per_head... )) scaling with f32 softmax
    (unet.py:249-256) is preserved inside ops.attention.qkv_attention.
    """

    num_heads: int = 1
    use_pallas: bool = False
    pallas_min_tokens: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, c = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        tokens = x.reshape(b, -1, c)
        y = GroupNorm32(name="norm")(tokens)
        qkv = Conv(3 * c, (1,), dtype=self.dtype, name="qkv")(y)
        out = qkv_attention(qkv, self.num_heads, use_pallas=self.use_pallas,
                            min_tokens=self.pallas_min_tokens)
        out = Conv(c, (1,), zero_init=True, dtype=self.dtype, name="proj")(out)
        return (tokens + out).reshape(b, *spatial, c)


class Downsample(nn.Module):
    """Stride-2 conv or avg-pool (reference src/modules/unet.py:85-108)."""

    use_conv: bool = True
    dims: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return Conv(
                x.shape[-1], (3,) * self.dims, strides=(2,) * self.dims,
                dtype=self.dtype, name="op",
            )(x)
        return avg_pool_nd(x, 2)


class Upsample(nn.Module):
    """Nearest 2x upsample + optional conv (reference src/modules/unet.py:54-82)."""

    use_conv: bool = True
    dims: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample_nd(x)
        if self.use_conv:
            x = Conv(x.shape[-1], (3,) * self.dims, dtype=self.dtype, name="conv")(x)
        return x


def _maybe_remat(module_cls, use_checkpoint: bool, static_argnums=()):
    """jax.checkpoint per block — the TPU equivalent of the reference's
    gradient checkpointing (src/modules/nn.py:125-171)."""
    if use_checkpoint:
        return nn.remat(module_cls, static_argnums=static_argnums)
    return module_cls


class UNetModel(nn.Module):
    """The full UNet (reference src/modules/unet.py:282-527).

    Args mirror the reference constructor; ``attention_resolutions`` here are
    downsample *rates* (the factory converts image-side lengths, reference
    src/modules/__init__.py:30-32).
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    # classifier-free guidance (Ho & Salimans, arXiv:2207.12598; beyond the
    # reference): reserve one extra embedding row as the "null" class
    # (index == num_classes).  Train with train.step class_dropout_prob>0
    # so the model learns the unconditional marginal on that row, then
    # sample with sample.make_cfg_apply_fn / engine guidance_scale.
    cfg_null_class: bool = False
    use_checkpoint: bool = False
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    use_pallas_attention: bool = False
    pallas_attention_min_tokens: int = 256   # Pallas wins only >=256 tokens
    use_pallas_gn: bool = False
    use_pallas_conv: bool = False
    dims: int = 2                       # spatial rank: 1, 2 or 3
    dtype: Dtype = jnp.float32

    def _embed(self, timesteps, y):
        emb = timestep_embedding(timesteps, self.model_channels)
        time_embed_dim = self.model_channels * 4
        emb = Linear(time_embed_dim, dtype=self.dtype, name="time_embed_1")(emb)
        emb = Linear(time_embed_dim, dtype=self.dtype, name="time_embed_2")(silu(emb))
        if self.num_classes is not None:
            assert y is not None, "class-conditional model requires y"
            # torch nn.Embedding default init: N(0, 1)
            label_emb = nn.Embed(
                self.num_classes + (1 if self.cfg_null_class else 0),
                time_embed_dim,
                embedding_init=nn.initializers.normal(stddev=1.0),
                param_dtype=jnp.float32,
                name="label_emb",
            )(y)
            emb = emb + label_emb
        else:
            assert y is None, "must not pass y for an unconditional model"
        return emb

    def _blocks(self):
        """Static plan of the encoder/middle/decoder block structure,
        mirroring reference src/modules/unet.py:350-441."""
        heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        rb = _maybe_remat(ResBlock, self.use_checkpoint)
        ab = _maybe_remat(AttentionBlock, self.use_checkpoint)

        encoder = []  # list of (kind, kwargs)
        input_chans = [self.model_channels]
        ch = self.model_channels
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                entry = [("res", dict(out_channels=mult * self.model_channels))]
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    entry.append(("attn", dict(num_heads=self.num_heads)))
                encoder.append(entry)
                input_chans.append(ch)
            if level != len(self.channel_mult) - 1:
                encoder.append([("down", {})])
                input_chans.append(ch)
                ds *= 2

        middle = [
            ("res", dict(out_channels=ch)),
            ("attn", dict(num_heads=self.num_heads)),
            ("res", dict(out_channels=ch)),
        ]

        decoder = []
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                entry = [("res", dict(out_channels=self.model_channels * mult))]
                ch = self.model_channels * mult
                input_chans.pop()
                if ds in self.attention_resolutions:
                    entry.append(("attn", dict(num_heads=heads_up)))
                if level and i == self.num_res_blocks:
                    entry.append(("up", {}))
                    ds //= 2
                decoder.append(entry)
        return rb, ab, encoder, middle, decoder

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        y: Optional[jax.Array] = None,
        *,
        train: bool = False,
        return_features: bool = False,
        cache: Optional[Tuple[jax.Array, Tuple[jax.Array, ...]]] = None,
        return_cache: bool = False,
        cache_middle: bool = False,
    ):
        """Forward pass; x is NHWC (reference forward: src/modules/unet.py:466-495).

        ``return_features=True`` reproduces ``get_feature_vectors``
        (reference src/modules/unet.py:497-527): returns a dict with 'down',
        'middle', 'up' activation lists instead of the output.

        Encoder-feature caching (sampling acceleration, "Faster Diffusion"
        arXiv:2312.09608 — absent in the reference):
          * ``return_cache=True``: additionally return ``(h_enc, skips)`` —
            the encoder output and the skip activations;
          * ``cache=(h_enc, skips)``: SKIP the encoder entirely and reuse the
            given features; only the (t-dependent) middle block and decoder
            run.  The output then depends on the current input solely through
            the cached features — callers use this for adjacent timesteps
            where encoder features change slowly.
          * ``cache_middle=True`` (pass on BOTH the producing and consuming
            call): the cached ``h`` is the *post-middle* activation, so
            consuming calls skip the middle block too and only the decoder
            reruns ("Cache Me if You Can"-style deeper block caching).  A
            strictly deeper approximation than encoder-only caching — the
            middle block's fresh timestep embedding is lost on cached steps.
        """
        assert not (return_features and cache is not None), (
            "return_features needs the encoder to run; with cache= the "
            "'down' activations would be silently empty (ADVICE r2)"
        )
        emb = self._embed(timesteps, y)
        rb, ab, encoder, middle, decoder = self._blocks()

        features = dict(down=[], up=[])
        in_dtype = x.dtype
        h = x.astype(self.dtype)

        def run_entry(h, entry, prefix, idx):
            for j, (kind, kw) in enumerate(entry):
                name = f"{prefix}{idx}_{j}_{kind}"
                if kind == "res":
                    h = rb(
                        dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        use_pallas_gn=self.use_pallas_gn,
                        use_pallas_conv=self.use_pallas_conv,
                        dims=self.dims,
                        dtype=self.dtype,
                        train=train,
                        name=name,
                        **kw,
                    )(h, emb)
                elif kind == "attn":
                    h = ab(dtype=self.dtype, use_pallas=self.use_pallas_attention,
                           pallas_min_tokens=self.pallas_attention_min_tokens,
                           name=name, **kw)(h)
                elif kind == "down":
                    h = Downsample(self.conv_resample, dims=self.dims,
                                   dtype=self.dtype, name=name)(h)
                elif kind == "up":
                    h = Upsample(self.conv_resample, dims=self.dims,
                                 dtype=self.dtype, name=name)(h)
            return h

        if cache is not None:
            h, skips = cache
            h = h.astype(self.dtype)
            hs = [s.astype(self.dtype) for s in skips]
        else:
            hs = []
            h = Conv(self.model_channels, (3,) * self.dims, dtype=self.dtype,
                     name="in_conv")(h)
            hs.append(h)
            features["down"].append(h.astype(in_dtype))
            for idx, entry in enumerate(encoder):
                h = run_entry(h, entry, "down", idx)
                hs.append(h)
                features["down"].append(h.astype(in_dtype))
        new_cache = (h, tuple(hs)) if (return_cache and not cache_middle) else None

        if not (cache is not None and cache_middle):
            h = run_entry(h, [middle[0]], "mid", 0)
            h = run_entry(h, [middle[1]], "mid", 1)
            h = run_entry(h, [middle[2]], "mid", 2)
        features["middle"] = h.astype(in_dtype)
        if return_cache and cache_middle:
            new_cache = (h, tuple(hs))

        for idx, entry in enumerate(decoder):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = run_entry(h, entry, "up", idx)
            features["up"].append(h.astype(in_dtype))

        if return_features:
            return features

        h = h.astype(in_dtype)
        if self.use_pallas_conv and self.dims == 2:
            from ..ops.gn_conv_pallas import gn_silu_conv3x3

            g, b2, groups = GroupNorm32(name="out_norm")(h, params_only=True)
            w, c = Conv(self.out_channels, (3,) * 2, zero_init=True,
                        name="out_conv")(h, params_only=True)
            h = gn_silu_conv3x3(h, g, b2, w, c, num_groups=groups)
        else:
            h = GroupNorm32(name="out_norm")(h)
            h = silu(h)
            h = Conv(self.out_channels, (3,) * self.dims, zero_init=True,
                     name="out_conv")(h)
        if return_cache:
            return h, new_cache
        return h


class SuperResModel(nn.Module):
    """Super-resolution UNet conditioned on a bilinear-upsampled low-res
    image by channel concat (reference src/modules/unet.py:530-550).

    Construct with the *base* in_channels; the wrapped UNet sees 2x.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    cfg_null_class: bool = False
    use_checkpoint: bool = False
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    use_pallas_attention: bool = False
    pallas_attention_min_tokens: int = 256
    use_pallas_gn: bool = False
    use_pallas_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, y=None, *, train=False,
                 return_features=False, cache=None, return_cache=False,
                 cache_middle=False):
        assert low_res is not None, "SuperResModel requires low_res"
        upsampled = bilinear_resize(low_res, x.shape[1], x.shape[2])
        x = jnp.concatenate([x, upsampled.astype(x.dtype)], axis=-1)
        return UNetModel(
            in_channels=self.in_channels * 2,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            dropout=self.dropout,
            channel_mult=self.channel_mult,
            conv_resample=self.conv_resample,
            num_classes=self.num_classes,
            cfg_null_class=self.cfg_null_class,
            use_checkpoint=self.use_checkpoint,
            num_heads=self.num_heads,
            num_heads_upsample=self.num_heads_upsample,
            use_scale_shift_norm=self.use_scale_shift_norm,
            use_pallas_attention=self.use_pallas_attention,
            pallas_attention_min_tokens=self.pallas_attention_min_tokens,
            use_pallas_gn=self.use_pallas_gn,
            use_pallas_conv=self.use_pallas_conv,
            dtype=self.dtype,
            name="unet",
        )(x, timesteps, y, train=train, return_features=return_features,
          cache=cache, return_cache=return_cache, cache_middle=cache_middle)
