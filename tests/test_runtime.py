"""Multi-host runtime wiring (parallel/runtime.py) with mocked process
identities — real DCN cannot run in a single-host sandbox, so these tests
verify the wiring contract: env parsing, jax.distributed.initialize args,
per-process disjoint data shards, and one-coherent-artifact-set gating
(SURVEY §5.8; VERDICT r2 missing #2 / next #2).
"""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.parallel.runtime import (
    RuntimeInfo,
    initialize_runtime,
    runtime_from_env,
)


def test_runtime_single_process_default():
    info = runtime_from_env(env={})
    assert info == RuntimeInfo()
    assert info.is_main and not info.is_distributed
    # no env vars => initialize_runtime must NOT touch jax.distributed
    called = []
    info2 = initialize_runtime(env={}, _distributed_initialize=lambda **kw: called.append(kw))
    assert info2 == RuntimeInfo() and called == []


def test_runtime_env_parsing_pddm_and_jax():
    env = {
        "PDDM_NUM_PROCESSES": "4",
        "PDDM_PROCESS_ID": "2",
        "PDDM_COORDINATOR": "10.0.0.1:1234",
    }
    info = runtime_from_env(env)
    assert (info.process_index, info.process_count) == (2, 4)
    assert info.coordinator == "10.0.0.1:1234"
    assert not info.is_main

    jax_env = {
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": "0",
        "JAX_COORDINATOR_ADDRESS": "host0:9999",
    }
    info = runtime_from_env(jax_env)
    assert (info.process_index, info.process_count) == (0, 2)

    with pytest.raises(ValueError, match="coordinator"):
        runtime_from_env({"PDDM_NUM_PROCESSES": "2", "PDDM_PROCESS_ID": "0"})
    with pytest.raises(ValueError, match="process id"):
        runtime_from_env(
            {"PDDM_NUM_PROCESSES": "2", "PDDM_COORDINATOR": "h:1"}
        )


def test_initialize_runtime_calls_distributed_initialize():
    env = {
        "PDDM_NUM_PROCESSES": "2",
        "PDDM_PROCESS_ID": "1",
        "PDDM_COORDINATOR": "host0:8476",
    }
    calls = []
    info = initialize_runtime(env=env, _distributed_initialize=lambda **kw: calls.append(kw))
    assert info.process_count == 2 and not info.is_main
    assert calls == [
        dict(
            coordinator_address="host0:8476",
            num_processes=2,
            process_id=1,
        )
    ]


def test_per_process_loaders_shard_disjointly():
    """Each simulated process's loader yields a disjoint, covering slice of
    the dataset — the multi-host data path of SURVEY §5.8."""
    from probabilisticdeepdiffusionmodels_tpu.cli.train import build_loaders

    cfg = {
        "data": {
            "name": "synthetic", "n": 64, "channels": 1, "batch_size": 8,
            "transformation_kwargs": {"normalize": "mnist"},
        },
        "engine": {"resolution": 8},
        "seed": 0,
    }
    seen = []
    for pid in range(2):
        train_loader, _ = build_loaders(cfg, shard_id=pid, num_shards=2)
        xs = np.concatenate([np.asarray(x) for x, _ in train_loader])
        assert len(xs) == 32  # half the dataset each
        seen.append({x.tobytes() for x in xs})
    assert not (seen[0] & seen[1]), "process shards overlap"


def test_multihost_training_non_main_writes_no_host_artifacts(
    tmp_path, monkeypatch
):
    """run_training as (mocked) process 1 of 2: joins the cluster, loads its
    own shard, but writes no metrics/config/media — the main process owns
    the run's artifact set; checkpoint saves stay collective."""
    import probabilisticdeepdiffusionmodels_tpu.cli.train as train_cli

    init_calls = []
    monkeypatch.setattr(
        train_cli,
        "initialize_runtime",
        lambda: (
            init_calls.append(1),
            RuntimeInfo(process_index=1, process_count=2, coordinator="h:1"),
        )[1],
    )
    result = train_cli.main([
        "model=unet_small_grey", "data=synthetic", "data.channels=1",
        "data.n=64", "data.batch_size=16",
        "data.transformation_kwargs.normalize=mnist",
        "engine=mnist", "engine.resolution=8", "engine.diffusion_steps=12",
        "engine.mode=cosine", "engine.ema=0.9",
        "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=1",
        "trainer.limit_test_batches=1",
        "visualization=none", "run_name=proc1", f"out_dir={tmp_path}",
    ])
    assert init_calls == [1]
    run = tmp_path / "proc1"
    # 2 steps: 32-sample shard at batch 16 (disjoint half of the data)
    assert result["steps"] == 2
    assert not (run / "experiment_config.yaml").exists()
    assert not (run / "metrics.jsonl").exists()
    assert not (run / "final_test.json").exists()
    assert not any((run / "media").iterdir())
    # the collective checkpoint save still ran from this process
    assert any((run / "checkpoints").iterdir())
