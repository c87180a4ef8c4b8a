"""Test harness: run everything on a faked 8-device CPU mesh.

Must set XLA flags before jax initializes; this is the TPU-world equivalent
of a fake multi-node backend (SPMD code paths compile and execute against 8
virtual devices).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (remote TPU via a
# tunnel) and routes compiles through a remote service — tests must never
# depend on it (and are ~100x faster off it).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
