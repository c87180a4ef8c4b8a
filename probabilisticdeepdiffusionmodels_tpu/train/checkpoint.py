"""Checkpoint/resume via Orbax.

TPU-native replacement for the reference's Lightning ModelCheckpoint + W&B
upload path (reference: scripts/train.py:79-104, hyperparameters embedded by
save_hyperparameters at src/engine.py:98, resume via W&B download
wandb_util.py:16-33).  Here:
  * {params, ema_params, opt_state, loss-history, step, rng} are saved as a
    sharded Orbax checkpoint (multi-host/multi-chip safe);
  * the experiment config snapshot (the save_hyperparameters equivalent)
    lives next to it as yaml, so a run can be fully reconstructed from its
    run directory alone;
  * best-k retention on val_loss mirrors ModelCheckpoint(monitor=val_loss).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import orbax.checkpoint as ocp

from .state import TrainState

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: Path, max_to_keep: int = 2):
        self.directory = Path(directory).absolute()
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get("val_loss", float("inf")),
            best_mode="min",
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, step: int, metrics: Optional[dict] = None):
        """Metric-less saves (periodic/crash-resilience) are kept outside the
        best-k competition (orbax keep_checkpoints_without_metrics)."""
        metrics = (
            {k: float(v) for k, v in metrics.items()} if metrics else None
        )
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(_to_saveable(state)),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of a freshly-created state."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        target = _to_saveable(state)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params"),
            loss_history=type(state.loss_history)(**restored["loss_history"]),
            rng=restored["rng"],
        )

    def close(self):
        self._mgr.close()


def _to_saveable(state: TrainState) -> dict:
    d = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "loss_history": state.loss_history._asdict(),
        "rng": state.rng,
    }
    if state.ema_params is not None:
        d["ema_params"] = state.ema_params
    return d
