"""Real 2-process jax.distributed smoke (VERDICT r3 next #7).

tests/test_runtime.py exercises initialize_runtime with a mocked
jax.distributed; here two actual subprocesses rendezvous at a localhost
coordinator, form a 2-process CPU backend, and run a cross-process
collective (process_allgather) — upgrading the multi-host story from
"skeleton" to "verified rendezvous + collective".
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
from probabilisticdeepdiffusionmodels_tpu.parallel.runtime import (
    initialize_runtime,
)

info = initialize_runtime()  # reads PDDM_* env, calls jax.distributed
import jax
import jax.numpy as jnp
from jax.experimental import multihost_utils

assert jax.process_count() == info.process_count == 2, jax.process_count()
assert jax.process_index() == info.process_index
vals = multihost_utils.process_allgather(
    jnp.array([float(info.process_index)])
)
print("GATHERED", sorted(float(v) for v in vals.ravel()), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_rendezvous_and_allgather():
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = {
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": str(REPO),
            "JAX_PLATFORMS": "cpu",
            "PDDM_NUM_PROCESSES": "2",
            "PDDM_PROCESS_ID": str(pid),
            "PDDM_COORDINATOR": f"127.0.0.1:{port}",
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process rendezvous timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    for out in outs:
        assert "GATHERED [0.0, 1.0]" in out, out
