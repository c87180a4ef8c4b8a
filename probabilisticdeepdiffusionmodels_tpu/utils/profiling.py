"""Profiling + FLOP estimation utilities.

The reference's only profiling hooks are a thop FLOP counter for attention
(reference src/modules/unet.py:258-279) and per-step grad-norm logs
(engine.py:332-346).  TPU-native equivalents:
  * ``trace`` — context manager around jax.profiler emitting a TensorBoard-
    loadable trace directory;
  * ``unet_flops`` — analytic FLOP estimate of one UNet forward from the
    construction plan (convs + attention einsums), the basis for MFU
    numbers in benchmarks;
  * ``step_timer`` — wall-clock timing helper that blocks on device work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional, Sequence

import jax

__all__ = ["trace", "unet_flops", "step_timer"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def unet_flops(
    resolution: int,
    in_channels: int,
    model_channels: int,
    num_res_blocks: int,
    attention_resolutions: Sequence[int],
    channel_mult: Sequence[int],
    num_heads: int = 1,
    learn_sigma: bool = False,
) -> int:
    """FLOPs (mul+add = 2) of one forward pass, from the reference plan
    (src/modules/unet.py:350-441).  attention_resolutions are image-side
    lengths as in configs."""
    attention_ds = [resolution // r for r in attention_resolutions]
    conv = lambda hw, cin, cout, k: 2 * hw * cin * cout * k * k
    total = 0

    def resblock(hw, cin, cout, emb):
        n = conv(hw, cin, cout, 3) + conv(hw, cout, cout, 3)
        n += 2 * emb * cout  # emb proj
        if cin != cout:
            n += conv(hw, cin, cout, 1)
        return n

    def attn(hw, c):
        # qkv + proj convs + 2 einsums (reference count_flops:
        # 2 * b * T^2 * c per einsum pair, unet.py:273-279)
        return conv(hw, c, 3 * c, 1) + conv(hw, c, c, 1) + 2 * 2 * hw * hw * c

    emb_dim = model_channels * 4
    side = resolution
    hw = side * side
    total += conv(hw, in_channels, model_channels, 3)
    ch = model_channels
    ds = 1
    chans = [model_channels]
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            total += resblock(hw, ch, mult * model_channels, emb_dim)
            ch = mult * model_channels
            if ds in attention_ds:
                total += attn(hw, ch)
            chans.append(ch)
        if level != len(channel_mult) - 1:
            total += conv(hw // 4, ch, ch, 3)
            chans.append(ch)
            side //= 2
            hw = side * side
            ds *= 2

    total += resblock(hw, ch, ch, emb_dim) + attn(hw, ch) + resblock(hw, ch, ch, emb_dim)

    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            total += resblock(hw, ch + chans.pop(), model_channels * mult, emb_dim)
            ch = model_channels * mult
            if ds in attention_ds:
                total += attn(hw, ch)
            if level and i == num_res_blocks:
                side *= 2
                hw = side * side
                total += conv(hw, ch, ch, 3)
                ds //= 2

    out_ch = in_channels * (2 if learn_sigma else 1)
    total += conv(hw, model_channels, out_ch, 3)
    return total


class step_timer:
    """with step_timer() as t: ... ; t.seconds (blocks on `result`)."""

    def __init__(self, result=None):
        self.result = result
        self.seconds: Optional[float] = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.result is not None:
            jax.block_until_ready(self.result)
        self.seconds = time.perf_counter() - self.t0
        return False
