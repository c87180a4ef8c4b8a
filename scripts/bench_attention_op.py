"""Op-level attention microbenchmark: XLA einsum vs Pallas fused kernel
at the UNet's three attention sites, in a chosen dtype.

Round-2 measured f32 only (the then-current Mosaic build rejected bf16
matmul operands); re-run in bf16 after the toolchain lifted that
(scripts/probe_mosaic_bf16.py) to keep docs/KERNELS.md's op table honest.

Usage: python scripts/bench_attention_op.py [f32|bf16]   (TPU, ~3 min)
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from probabilisticdeepdiffusionmodels_tpu.ops.attention import (
    qkv_attention_xla,
)
from probabilisticdeepdiffusionmodels_tpu.ops.attention_pallas import (
    qkv_attention_pallas,
)

B, C, HEADS = 128, 256, 4
SITES = [256, 64, 16]  # tokens: 16x16, 8x8, 4x4 feature maps
CHAIN = 50


def measure(fn, qkv, n_rep=3):
    @jax.jit
    def chain(x):
        # jitted CHAIN-call dependency chain so per-call overhead amortizes
        # and XLA cannot elide the calls
        def body(h, _):
            out = fn(h)
            # feed the output back as q/k/v thirds to keep shapes fixed;
            # tanh keeps the chain bounded so values stay numeric
            out = jnp.tanh(out)
            return jnp.concatenate([out, out, out], axis=-1), None

        h, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(h.astype(jnp.float32))

    w = float(chain(qkv))  # warmup + compile; device->host pull
    t0 = time.perf_counter()
    for _ in range(n_rep):
        w = float(chain(qkv))  # the pull serializes each rep
    dt = (time.perf_counter() - t0) / (n_rep * CHAIN)
    return dt * 1e6  # us per call


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") \
        else jnp.float32
    name = "bf16" if dtype == jnp.bfloat16 else "f32"
    out = {"dtype": name, "batch": B, "channels": C, "heads": HEADS}
    rng = np.random.RandomState(0)
    for t in SITES:
        qkv = jnp.asarray(rng.randn(B, t, 3 * C).astype(np.float32), dtype)
        us_xla = measure(partial(qkv_attention_xla, num_heads=HEADS), qkv)
        us_pal = measure(
            partial(qkv_attention_pallas, num_heads=HEADS), qkv
        )
        out[f"tokens{t}"] = {
            "xla_us": round(us_xla, 1),
            "pallas_us": round(us_pal, 1),
            "speedup": round(us_xla / us_pal, 3),
        }
        print(t, out[f"tokens{t}"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
