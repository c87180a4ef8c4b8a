"""Remote run restore (logging/remote.py + MetricLogger.log_artifact).

The reference resumes any run from anywhere by W&B run-id
(reference src/wandb_util.py:16-55 download checkpoint+config).  Our
equivalent is `cli.runs pull <entity/project/run_id>`: fetch_run restores a
W&B-mirrored run's files + newest checkpoint artifact into a local run dir,
after which every run_dir-addressed CLI works unchanged.  Zero-egress
sandbox => exercised against an injected fake W&B API.
"""

import json
from pathlib import Path
from types import SimpleNamespace

import pytest

from probabilisticdeepdiffusionmodels_tpu.logging.remote import fetch_run
from probabilisticdeepdiffusionmodels_tpu.logging.sink import MetricLogger, RunDir


class _FakeFile:
    def __init__(self, name: str, content: str):
        self.name = name
        self._content = content

    def download(self, root: str, replace: bool = False):
        p = Path(root) / self.name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(self._content)


class _FakeArtifact:
    def __init__(self, type: str, payload: dict):
        self.type = type
        self._payload = payload

    def download(self, root: str):
        d = Path(root)
        d.mkdir(parents=True, exist_ok=True)
        for fname, content in self._payload.items():
            (d / fname).write_text(content)


class _FakeRun:
    def __init__(self, files, artifacts):
        self._files = files
        self._artifacts = artifacts

    def files(self):
        return self._files

    def logged_artifacts(self):
        return self._artifacts


class _FakeApi:
    def __init__(self, run):
        self._run = run
        self.requested = None

    def run(self, spec):
        self.requested = spec
        return self._run


def _mirrored_run():
    files = [
        _FakeFile("experiment_config.yaml", "engine:\n  diffusion_steps: 10\n"),
        _FakeFile("metrics.jsonl", json.dumps({"loss": 0.5, "step": 1}) + "\n"),
        _FakeFile("media/samples_epoch0.png", "png-bytes"),
        # wandb-internal files must be skipped
        _FakeFile("wandb-metadata.json", "{}"),
        _FakeFile("config.yaml", "internal"),
        _FakeFile("requirements.txt", "jax"),
    ]
    arts = [
        _FakeArtifact("checkpoint", {"old.ckpt": "v1"}),
        _FakeArtifact("media", {"grid.png": "not-a-ckpt"}),
        _FakeArtifact("checkpoint", {"best.ckpt": "v2"}),
    ]
    return _FakeRun(files, arts)


def test_fetch_run_restores_files_and_newest_checkpoint(tmp_path):
    api = _FakeApi(_mirrored_run())
    dest = fetch_run("me/proj/abc123", str(tmp_path), _api=api, log=lambda *_: None)

    assert api.requested == "me/proj/abc123"
    assert dest == tmp_path / "abc123"
    assert (dest / "experiment_config.yaml").read_text().startswith("engine:")
    assert (dest / "metrics.jsonl").exists()
    assert (dest / "media" / "samples_epoch0.png").exists()
    # internal W&B files filtered out
    assert not (dest / "wandb-metadata.json").exists()
    assert not (dest / "config.yaml").exists()
    # only the NEWEST checkpoint artifact lands in checkpoints/
    assert (dest / "checkpoints" / "best.ckpt").read_text() == "v2"
    assert not (dest / "checkpoints" / "old.ckpt").exists()


def test_fetch_run_warns_without_config(tmp_path):
    run = _FakeRun([_FakeFile("metrics.jsonl", "{}\n")], [])
    msgs = []
    fetch_run("e/p/r1", str(tmp_path), _api=_FakeApi(run), log=msgs.append)
    assert any("no checkpoint artifact" in m for m in msgs)
    assert any("experiment_config.yaml" in m for m in msgs)


def test_fetch_run_name_override(tmp_path):
    run = _FakeRun([], [])
    dest = fetch_run("e/p/r2", str(tmp_path), name="restored",
                     _api=_FakeApi(run), log=lambda *_: None)
    assert dest == tmp_path / "restored"


def test_fetch_run_without_wandb_package_raises(tmp_path, monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("No module named 'wandb'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    with pytest.raises(RuntimeError, match="wandb"):
        fetch_run("e/p/r3", str(tmp_path))


class _FakeWandbModule:
    """Just enough of the wandb module surface for MetricLogger.log_artifact."""

    def __init__(self):
        self.artifacts = []

    class Artifact:
        def __init__(self, name, type):
            self.name, self.type = name, type
            self.dirs, self.files = [], []

        def add_dir(self, p):
            self.dirs.append(p)

        def add_file(self, p):
            self.files.append(p)

    def log_artifact(self, art):
        self.artifacts.append(art)

    def finish(self):
        pass


def test_log_artifact_mirrors_dir_and_file(tmp_path):
    rd = RunDir(str(tmp_path), name="r")
    logger = MetricLogger(rd)
    fake = _FakeWandbModule()
    logger._wandb = fake

    ckpt_dir = rd.checkpoint_dir()
    (ckpt_dir / "state.ckpt").write_text("x")
    logger.log_artifact(ckpt_dir, "r-checkpoints")
    single = tmp_path / "one.txt"
    single.write_text("y")
    logger.log_artifact(single, "one-file", type="media")

    assert [a.name for a in fake.artifacts] == ["r-checkpoints", "one-file"]
    assert fake.artifacts[0].type == "checkpoint"
    assert fake.artifacts[0].dirs == [str(ckpt_dir)]
    assert fake.artifacts[1].files == [str(single)]
    logger.close()


def test_log_artifact_noop_without_wandb(tmp_path):
    rd = RunDir(str(tmp_path), name="r2")
    logger = MetricLogger(rd)  # no wandb mirror
    logger.log_artifact(rd.checkpoint_dir(), "r2-checkpoints")  # must not raise
    logger.close()


def test_runs_pull_cli(tmp_path, monkeypatch, capsys):
    """cli.runs pull wires fetch_run (user-facing door)."""
    from probabilisticdeepdiffusionmodels_tpu.cli import runs as runs_cli
    from probabilisticdeepdiffusionmodels_tpu.logging import remote

    called = {}

    def fake_fetch(spec, root="./runs"):
        called["spec"], called["root"] = spec, root
        return Path(root) / "abc"

    monkeypatch.setattr(remote, "fetch_run", fake_fetch)
    rc = runs_cli.main(["pull", "e/p/abc", str(tmp_path)])
    assert rc in (None, 0)
    assert called == {"spec": "e/p/abc", "root": str(tmp_path)}
    assert "pulled" in capsys.readouterr().out
