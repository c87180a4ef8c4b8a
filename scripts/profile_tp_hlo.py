"""GSPMD collective profile of the tp / fsdp train steps (VERDICT r4 #8).

Only one TPU chip exists in this environment, so tensor parallelism cannot
be *timed* end-to-end on the hardware it targets.  The honest evidence is
structural: compile the partitioned program on a virtual 4x2 (data x
model) CPU mesh and count the collectives XLA's SPMD partitioner inserted
from the sharding annotations alone.  A Megatron-style column-parallel
layout must produce all-reduces (partial-activation psums) inside the
forward/backward, and fsdp must produce all-gathers (weights at use) +
reduce-scatters (grads); their presence in the compiled HLO is the
design working as declared (docs/PARALLELISM.md "Where the collectives
actually are").

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/profile_tp_hlo.py [out.json]
"""

import collections
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

def count_collectives(compiled) -> dict:
    """op -> count over the optimized (post-SPMD-partitioning) HLO.

    Counts instruction DEFINITIONS by their left-hand-side name
    (``%all-reduce.133 = (f32[...], ...) all-reduce(...)``): matching the
    op token after ``=`` breaks on variadic collectives, whose tuple type
    annotation contains spaces — the dp grad reduction is exactly one such
    variadic all-reduce over the whole gradient tree."""
    hlo = compiled.as_text()
    counts = collections.Counter()
    defn = re.compile(
        r"^\s*(?:ROOT\s+)?%(all-reduce|all-gather|reduce-scatter"
        r"|collective-permute|all-to-all)(?:-start)?[.\d]*\s*="
    )
    for line in hlo.splitlines():
        m = defn.match(line)
        if m:
            counts[m.group(1)] += 1
    return dict(counts)


def build(mesh, sharding_kind):
    import optax

    from probabilisticdeepdiffusionmodels_tpu.core import (
        DiffusionTables,
        NoiseSchedule,
    )
    from probabilisticdeepdiffusionmodels_tpu.models import get_model
    from probabilisticdeepdiffusionmodels_tpu.parallel import (
        fsdp_sharding,
        tp_sharding,
    )
    from probabilisticdeepdiffusionmodels_tpu.train import (
        TrainState,
        make_train_step,
    )

    T = 10
    model = get_model(
        8,
        dict(name="unet", in_channels=3, model_channels=16,
             num_res_blocks=1, attention_resolutions=[4],
             channel_mult=[1, 2], num_heads=2),
    )
    x = jnp.zeros((16, 8, 8, 3), jnp.float32)
    t = jnp.ones((16,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    tables = DiffusionTables.from_schedule(
        NoiseSchedule.create(diffusion_steps=T, mode="cosine"))
    state = TrainState.create(
        params, optax.adam(1e-4), T, jax.random.PRNGKey(1), ema_decay=0.999)

    apply_fn = lambda p, xx, tt, yy=None, **kw: model.apply(
        {"params": p}, xx, tt, yy)
    step = make_train_step(apply_fn, tables, sampling="uniform")

    if sharding_kind == "tp":
        specs = tp_sharding(mesh, state.params)
        state = state.replace(
            params=jax.device_put(state.params, specs),
            ema_params=jax.device_put(state.ema_params, specs),
        )
    elif sharding_kind == "fsdp":
        state = jax.device_put(state, fsdp_sharding(mesh, state, min_size=128))
    else:  # dp
        state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = jax.device_put(
        np.random.default_rng(0).standard_normal((16, 8, 8, 3)).astype(
            np.float32),
        NamedSharding(mesh, P("data", None, None, None)),
    )
    compiled = jax.jit(step).lower(state, batch).compile()
    return compiled


def main(out_path=None):
    from probabilisticdeepdiffusionmodels_tpu.parallel import (
        make_mesh,
        make_mesh_2d,
    )

    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")
    out = {"note": __doc__.split("\n\n")[0]}
    for kind, mesh in (
        ("dp", make_mesh(8)),
        ("fsdp", make_mesh(8)),
        ("tp", make_mesh_2d(4, 2)),
    ):
        counts = count_collectives(build(mesh, kind))
        out[kind] = counts
        print(kind, counts, flush=True)

    # the structural claims from PARALLELISM.md "Where the collectives are"
    assert out["dp"].get("all-reduce", 0) >= 1, "dp: grad psum missing"
    assert out["fsdp"].get("all-gather", 0) >= 1, "fsdp: weight gather missing"
    assert (out["fsdp"].get("reduce-scatter", 0) >= 1
            or out["fsdp"].get("all-reduce", 0) >= 1), \
        "fsdp: grad reduction missing"
    assert out["tp"].get("all-reduce", 0) >= out["dp"].get("all-reduce", 0), \
        "tp: no extra activation psums beyond the dp grad reduction"
    if out_path:
        Path(out_path).write_text(json.dumps(out, indent=1) + "\n")
        print(f"wrote {out_path}")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
