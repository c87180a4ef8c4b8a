"""Metric sinks + local artifact store.

Replaces the reference's single hard W&B dependency (reference:
scripts/train.py:19-61 init/tagging, src/wandb_util.py:7-85 artifact
download) with a pluggable design: a JSONL + console sink by default, an
optional W&B sink when the package + credentials exist, and a local run
directory as the artifact store (checkpoints, sample grids, config
snapshot) addressable by run name the way the reference addresses W&B runs
by id.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["MetricLogger", "RunDir", "auto_tags"]


class RunDir:
    """Local artifact store for one run (reference W&B run-dir equivalent:
    scripts/train.py:69-89, wandb_util.py:16-55)."""

    def __init__(self, root: str, name: Optional[str] = None):
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.name = name or f"run-{stamp}"
        self.path = Path(root) / self.name
        self.path.mkdir(parents=True, exist_ok=True)
        (self.path / "media").mkdir(exist_ok=True)
        (self.path / "checkpoints").mkdir(exist_ok=True)

    def save_config(self, cfg: Dict[str, Any]) -> None:
        import yaml

        with open(self.path / "experiment_config.yaml", "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)

    @staticmethod
    def find(root: str, name: str) -> "RunDir":
        rd = RunDir.__new__(RunDir)
        rd.name = name
        rd.path = Path(root) / name
        if not rd.path.exists():
            raise FileNotFoundError(rd.path)
        return rd

    def checkpoint_dir(self) -> Path:
        return self.path / "checkpoints"

    def media_path(self, filename: str) -> Path:
        return self.path / "media" / filename


class MetricLogger:
    """Console + JSONL metric logging; optional wandb mirroring."""

    def __init__(self, run_dir: RunDir, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None, enabled: bool = True):
        """``enabled=False`` makes every call a no-op — non-main processes
        of a multi-host launch use this so the run writes ONE coherent
        metrics stream (parallel/runtime.py)."""
        self.run_dir = run_dir
        self.enabled = enabled
        self._f = (
            open(run_dir.path / "metrics.jsonl", "a") if enabled else None
        )
        self._wandb = None
        if use_wandb and enabled:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(dir=str(run_dir.path), **(wandb_kwargs or {}))
            except Exception as e:  # no package / no creds: degrade cleanly
                print(f"[log] wandb unavailable ({e}); using local sink only")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if not self.enabled:
            return
        clean = {}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            clean[k] = v
        if step is not None:
            clean["step"] = int(step)
        clean["time"] = time.time()
        self._f.write(json.dumps(clean) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, path: Path) -> None:
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(str(path))})

    def log_artifact(self, path, name: str, type: str = "checkpoint") -> None:
        """Mirror a file/dir as a W&B artifact so the run is restorable
        from anywhere via ``cli.runs pull`` (logging/remote.py — the
        reference's wandb_util checkpoint round trip).  No-op without the
        wandb mirror."""
        if self._wandb is None:
            return
        art = self._wandb.Artifact(name, type=type)
        p = Path(path)
        if p.is_dir():
            art.add_dir(str(p))
        else:
            art.add_file(str(p))
        self._wandb.log_artifact(art)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def auto_tags(cfg: Dict[str, Any]) -> list:
    """Run tags derived from config, mirroring the reference's auto-tagging
    (scripts/train.py:19-61: dataset, effective batch, lr, T, schedule mode,
    ema, sampling, grad clip)."""
    tags = []
    data = cfg.get("data", {})
    engine = cfg.get("engine", {})
    trainer = cfg.get("trainer", {})
    if "name" in data:
        tags.append(str(data["name"]))
    bs = data.get("batch_size")
    acc = trainer.get("accumulate_grad_batches", 1)
    if bs:
        tags.append(f"bs{bs * acc}")
    if "optimizer_config" in engine:
        tags.append(f"lr{engine['optimizer_config'].get('lr')}")
    if "diffusion_steps" in engine:
        tags.append(f"T{engine['diffusion_steps']}")
    if "mode" in engine:
        tags.append(str(engine["mode"]))
    if engine.get("ema"):
        tags.append(f"ema{engine['ema']}")
    if engine.get("sampling", "uniform") != "uniform":
        tags.append(str(engine["sampling"]))
    return tags
