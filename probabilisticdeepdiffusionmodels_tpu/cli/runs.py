"""Run/artifact store utilities.

Local equivalent of the reference's W&B artifact helpers
(reference: src/wandb_util.py:16-85 — list_all_checkpoints,
download_checkpoints picking the latest step, download_file, epoch listing).
Runs live in a local directory tree instead of a W&B project; the listing
surface is preserved.

    python -m probabilisticdeepdiffusionmodels_tpu.cli.runs list [out_dir]
    python -m probabilisticdeepdiffusionmodels_tpu.cli.runs show <run> [out_dir]
    python -m probabilisticdeepdiffusionmodels_tpu.cli.runs pull \
        <entity/project/run_id> [out_dir]   # W&B-mirrored run -> local store
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import List, Optional

__all__ = ["list_runs", "list_checkpoints", "latest_checkpoint", "main"]


def list_runs(out_dir: str = "./runs") -> List[str]:
    root = Path(out_dir)
    if not root.exists():
        return []
    return sorted(
        p.name for p in root.iterdir()
        if (p / "experiment_config.yaml").exists()
    )


def list_checkpoints(run: str, out_dir: str = "./runs") -> List[int]:
    """All checkpoint steps for a run (wandb_util.list_all_checkpoints
    equivalent, src/wandb_util.py:36-44)."""
    ckpt_dir = Path(out_dir) / run / "checkpoints"
    if not ckpt_dir.exists():
        return []
    return sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())


def latest_checkpoint(run: str, out_dir: str = "./runs") -> Optional[int]:
    """Latest step (download_checkpoints picks max step,
    src/wandb_util.py:16-33)."""
    steps = list_checkpoints(run, out_dir)
    return steps[-1] if steps else None


def _last_metrics(run: str, out_dir: str) -> dict:
    path = Path(out_dir) / run / "metrics.jsonl"
    last: dict = {}
    if path.exists():
        with open(path) as f:
            for line in f:
                try:
                    last.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return last


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cmd = argv[0] if argv else "list"
    if cmd == "list":
        out_dir = argv[1] if len(argv) > 1 else "./runs"
        for name in list_runs(out_dir):
            steps = list_checkpoints(name, out_dir)
            m = _last_metrics(name, out_dir)
            val = m.get("val_loss")
            print(f"{name:32s} ckpts={steps} val_loss={val}")
    elif cmd == "show":
        run = argv[1]
        out_dir = argv[2] if len(argv) > 2 else "./runs"
        print(json.dumps(_last_metrics(run, out_dir), indent=2, default=str))
    elif cmd == "pull":
        # restore a W&B-mirrored run into the local store (the reference's
        # wandb_util download path; logging/remote.py)
        from ..logging.remote import fetch_run

        dest = fetch_run(argv[1], argv[2] if len(argv) > 2 else "./runs")
        print(f"[runs] pulled -> {dest}")
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
