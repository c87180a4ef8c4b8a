"""Remote run restore: the reference's wandb_util workflow.

The reference resumes/samples a run from ANY machine by W&B run-id —
``get_checkpoint_file``/``restore_checkpoint`` download the logged
checkpoint + config into a local dir (reference src/wandb_util.py:16-55).
The TPU-native framework stores runs locally (logging/sink.py RunDir) with
an *optional* W&B mirror; this module completes the round trip:

  * :meth:`MetricLogger.log_artifact` (sink.py) uploads the checkpoint dir
    as a W&B artifact at train end;
  * :func:`fetch_run` downloads a mirrored run's files + latest checkpoint
    artifact back into a local run dir, after which every CLI
    (sample/eval/fid/distill, all addressed by run_dir) works unchanged;
  * ``python -m ...cli.runs pull <entity/project/run_id> [dest_root]`` is
    the user-facing door.

Zero-egress sandboxes (and machines without the wandb package) cannot
exercise the real API, so the W&B client is injectable and the logic is
tested against a fake (tests/test_remote_fetch.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

__all__ = ["fetch_run"]


def fetch_run(run_spec: str, dest_root: str = "./runs",
              name: Optional[str] = None, _api=None, log=print) -> Path:
    """Download a W&B-mirrored run into ``dest_root/<name>``.

    ``run_spec``: "entity/project/run_id" (the W&B path). Restores every
    regular file the run logged (experiment_config.yaml, metrics.jsonl,
    media) plus the newest ``checkpoint`` artifact into ``checkpoints/``.
    Returns the local run dir, ready for every run_dir-addressed CLI.

    ``_api`` is injectable for tests; defaults to ``wandb.Api()``.
    """
    if _api is None:
        try:
            import wandb
        except ImportError as e:
            raise RuntimeError(
                "fetching a remote run needs the wandb package "
                "(pip install wandb) and credentials"
            ) from e
        _api = wandb.Api()
    run = _api.run(run_spec)
    dest = Path(dest_root) / (name or run_spec.rsplit("/", 1)[-1])
    dest.mkdir(parents=True, exist_ok=True)
    for f in run.files():
        # wandb-internal files are not run artifacts
        if f.name.startswith(("wandb-", "config.yaml", "requirements")):
            continue
        f.download(root=str(dest), replace=True)
        log(f"[pull] {dest / f.name}")
    ckpts = [a for a in run.logged_artifacts() if a.type == "checkpoint"]
    if ckpts:
        ckpts[-1].download(root=str(dest / "checkpoints"))
        log(f"[pull] checkpoint artifact -> {dest / 'checkpoints'}")
    else:
        log("[pull] run has no checkpoint artifact (metrics/config only)")
    if not (dest / "experiment_config.yaml").exists():
        log("[pull] WARNING: no experiment_config.yaml in the mirror — "
            "run_dir CLIs need it; was the run logged with this framework?")
    return dest
