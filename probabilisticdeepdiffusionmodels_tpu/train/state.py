"""Training state: params, optimizer, EMA, timestep-sampler state, RNG.

Owns what PyTorch Lightning owned for the reference (training loop state)
plus the reference's EMA module (src/modules/ema.py:8-36) re-expressed as a
pure functional update over the param pytree:

    ema <- decay * ema + (1 - decay) * params     (ema.py:30-33)

The reference EMAs ``state_dict().values()`` which includes buffers; its
models have no running-stat buffers (GroupNorm is stateless), so EMA over
params only is behaviorally identical (documented design decision, see
SURVEY.md §7 "hard parts" (e)).

The whole state is a flax.struct dataclass — a pytree that jit/pjit can
donate, shard (each leaf annotated via NamedSharding), and checkpoint with
orbax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .samplers import LossHistory

__all__ = ["TrainState", "ema_update"]


def ema_update(ema_params, params, decay: float):
    """e <- d*e + (1-d)*p, matching reference update order (ema.py:30-33)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


class TrainState(struct.PyTreeNode):
    """All mutable training state as one pytree."""

    step: jax.Array
    params: Any
    opt_state: optax.OptState
    ema_params: Optional[Any]
    loss_history: LossHistory
    rng: jax.Array

    # static (not traced)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: Optional[float] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(
        cls,
        params,
        tx: optax.GradientTransformation,
        diffusion_steps: int,
        rng: jax.Array,
        ema_decay: Optional[float] = None,
        history: int = 10,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
            loss_history=LossHistory.create(diffusion_steps, history),
            rng=rng,
            tx=tx,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = (
            ema_update(self.ema_params, new_params, self.ema_decay)
            if self.ema_decay
            else None
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
