"""Multi-host (multi-process) runtime wiring.

Single-controller JAX SPMD covers one host's chips; a multi-host slice
(v5e-256, DCN-connected pods) runs ONE python process per host, each
calling ``jax.distributed.initialize`` before any JAX computation so the
processes form a single logical device set.  The reference's analogue is
Lightning's DDP spawn (reference: scripts/train.py:139-150 —
``pl.Trainer(gpus=N)`` delegating to torch.distributed/NCCL); SURVEY §5.8
calls for host data loading sharded per-process over DCN.

This module is the front door for that:

  * :func:`initialize_runtime` reads coordinator env vars (either JAX's own
    ``JAX_COORDINATOR_ADDRESS``/... or the launcher-agnostic ``PDDM_*``
    set), calls ``jax.distributed.initialize`` when a multi-process launch
    is declared, and returns a :class:`RuntimeInfo`;
  * ``RuntimeInfo.process_index / process_count`` feed
    ``DataLoader(shard_id=, num_shards=)`` (data/datasets.py:263-299) so
    each host loads a disjoint shard;
  * ``RuntimeInfo.is_main`` gates host-side artifacts that must be written
    once per run (metric logs, media, the config snapshot); Orbax
    checkpoint saves stay collective — every process calls save() and the
    library coordinates the write.

On a single host all of this degrades to a no-op: no env vars, no
``jax.distributed`` call, process 0 of 1.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Optional

__all__ = ["RuntimeInfo", "initialize_runtime", "runtime_from_env"]


@dataclasses.dataclass(frozen=True)
class RuntimeInfo:
    """Identity of this process within a (possibly 1-process) launch."""

    process_index: int = 0
    process_count: int = 1
    coordinator: Optional[str] = None

    @property
    def is_main(self) -> bool:
        return self.process_index == 0

    @property
    def is_distributed(self) -> bool:
        return self.process_count > 1


def runtime_from_env(env: Optional[Mapping[str, str]] = None) -> RuntimeInfo:
    """Parse the launch topology from env vars without side effects.

    Recognized (PDDM_* wins over JAX_* when both are set):
      PDDM_NUM_PROCESSES / JAX_NUM_PROCESSES   — processes in the launch
      PDDM_PROCESS_ID    / JAX_PROCESS_ID      — this process's index
      PDDM_COORDINATOR   / JAX_COORDINATOR_ADDRESS — host:port of process 0
    """
    env = os.environ if env is None else env

    def pick(name):
        return env.get(f"PDDM_{name}") or env.get(f"JAX_{name}")

    count = pick("NUM_PROCESSES")
    if not count or int(count) <= 1:
        return RuntimeInfo()
    coordinator = env.get("PDDM_COORDINATOR") or env.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator:
        raise ValueError(
            "multi-process launch declared (NUM_PROCESSES>1) but no "
            "coordinator address set (PDDM_COORDINATOR / "
            "JAX_COORDINATOR_ADDRESS)"
        )
    index = pick("PROCESS_ID")
    if index is None:
        raise ValueError(
            "multi-process launch declared but no process id set "
            "(PDDM_PROCESS_ID / JAX_PROCESS_ID)"
        )
    return RuntimeInfo(
        process_index=int(index),
        process_count=int(count),
        coordinator=coordinator,
    )


def initialize_runtime(
    env: Optional[Mapping[str, str]] = None,
    _distributed_initialize=None,
) -> RuntimeInfo:
    """Initialize the JAX distributed runtime if this is a multi-process
    launch; return this process's :class:`RuntimeInfo` either way.

    Must run before the first JAX computation.  ``_distributed_initialize``
    is injectable for tests (real DCN cannot run in a single-host sandbox);
    it defaults to ``jax.distributed.initialize``.
    """
    info = runtime_from_env(env)
    if info.is_distributed:
        if _distributed_initialize is None:
            import jax

            _distributed_initialize = jax.distributed.initialize
        _distributed_initialize(
            coordinator_address=info.coordinator,
            num_processes=info.process_count,
            process_id=info.process_index,
        )
    return info
