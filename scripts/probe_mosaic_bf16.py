"""Probe: does the current Mosaic/Pallas toolchain accept bf16 matmul
operands on the MXU?

Round-2 finding (docs/KERNELS.md): this build rejects bf16 lhs/rhs inside
Pallas kernels ("Bad lhs type"), forcing f32 MXU compute — the single root
cause of the fused-attention kernel losing to XLA end-to-end at the
production dtype.  Re-run this after any toolchain refresh; if it prints
BF16 OK, re-measure `scripts/bench_variants.py` with
`use_pallas_attention` (VERDICT r2 next #3).

Usage: python scripts/probe_mosaic_bf16.py   (TPU, ~1 min)
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def try_dtype(dtype):
    a = jnp.ones((256, 256), dtype)
    b = jnp.ones((256, 256), dtype)
    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )
    out = jax.jit(fn)(a, b)
    out.block_until_ready()
    return float(out[0, 0])


def main():
    print("devices:", jax.devices())
    ok = try_dtype(jnp.float32)
    print(f"f32 matmul kernel: OK (out[0,0]={ok})")
    try:
        ok = try_dtype(jnp.bfloat16)
        print(f"BF16 OK (out[0,0]={ok}) -> re-measure Pallas attention "
              "at bf16 (docs/KERNELS.md round-2 blocker is GONE)")
        return 0
    except Exception as e:  # noqa: BLE001 - report the compiler error
        print(f"BF16 REJECTED: {type(e).__name__}: {str(e)[:400]}")
        print("round-2 blocker still present; Pallas kernels stay off")
        return 1


if __name__ == "__main__":
    sys.exit(main())
