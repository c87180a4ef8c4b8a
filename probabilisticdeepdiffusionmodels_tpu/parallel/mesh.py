"""Device mesh construction + sharding policy.

The reference's only multi-device hook is Lightning DDP/NCCL
(reference: scripts/train.py:139-150); it owns no distributed code.  The
TPU-native equivalent is single-controller JAX SPMD: one
``jax.sharding.Mesh`` over the slice, batch axes sharded over ``data``,
parameters replicated, XLA inserting all-reduces over ICI for the gradient
sum.  Everything is device-count agnostic so the same code runs on 1 TPU
chip, a v5e-8 slice, or 8 fake CPU devices in tests
(``--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "make_mesh_2d", "data_sharding", "spatial_sharding",
    "replicated", "fsdp_sharding", "tp_sharding", "shard_batch", "P",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all).

    Raises if fewer than ``n_devices`` are available — a silently smaller
    mesh would make SPMD dry-runs pass without exercising any sharding.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}): only {len(devices)} "
                f"{devices[0].platform} device(s) available; run with "
                f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} to fake a slice"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    n_data: int,
    n_model: int,
    axis_names: tuple = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """2-D (data x model) mesh for combined data + tensor parallelism.

    On a real slice the trailing (model) axis should map to the
    fastest-ICI neighbors — tensor-parallel collectives (per-layer
    all-gathers/reduce-scatters) are latency-critical, while the data
    axis only carries one gradient all-reduce per step.  ``jax.devices()``
    order already walks the torus minor-to-major, so a plain reshape puts
    mesh-adjacent devices on the model axis.
    """
    devices = jax.devices()
    need = int(n_data) * int(n_model)
    if len(devices) < need:
        raise RuntimeError(
            f"make_mesh_2d({n_data}, {n_model}): only {len(devices)} "
            f"{devices[0].platform} device(s) available; run with "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={need} to fake a slice"
        )
    grid = np.asarray(devices[:need]).reshape(int(n_data), int(n_model))
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard NHWC images over the HEIGHT axis (sequence-parallel analogue).

    XLA's SPMD partitioner spatially partitions the whole UNet under this
    sharding — conv halo exchanges and attention all-gathers are inserted
    automatically — so a few large images (e.g. 256x256 CelebA-HQ sampling,
    BASELINE config #5) can be split across a slice even when the batch is
    smaller than the device count.  Verified equal to the single-device
    forward to f32 rounding in tests/test_parallel.py.
    """
    return NamedSharding(mesh, P(None, axis_name, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_leaf(mesh: Mesh, shape, axis_name: str, min_size: int) -> NamedSharding:
    """Sharding for one state leaf: the largest axis-divisible dim is split
    over the mesh axis; small or indivisible leaves stay replicated."""
    n = mesh.shape[axis_name]
    if not shape or int(np.prod(shape)) < min_size:
        return replicated(mesh)
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and (best is None or d >= shape[best]):
            best = i  # ties resolve to the LAST max dim (channel axes)
    if best is None:
        return replicated(mesh)
    spec = [None] * len(shape)
    spec[best] = axis_name
    return NamedSharding(mesh, P(*spec))


def fsdp_sharding(mesh: Mesh, tree, axis_name: str = DATA_AXIS,
                  min_size: int = 65536):
    """Fully-sharded state layout (the ZeRO-3 / jax "fsdp" recipe): every
    large leaf of ``tree`` (params, EMA copy, Adam moments) is sharded
    across the data axis, so per-device state memory scales ~1/N.  Under
    ``jit`` the XLA SPMD partitioner then all-gathers each weight just
    before use and reduce-scatters its gradient — all over ICI, no code
    changes in the step function.  Returns a pytree of NamedShardings
    matching ``tree`` (pass to ``jax.device_put``).

    ``min_size``: leaves below this many elements stay replicated (scalars,
    biases, norm affines — gathering them costs more latency than the
    bytes saved)."""
    return jax.tree.map(
        lambda x: _fsdp_leaf(mesh, getattr(x, "shape", ()), axis_name,
                             min_size),
        tree,
    )


def _tp_leaf(mesh: Mesh, shape, axis_name: str, min_size: int) -> NamedSharding:
    """Sharding for one leaf under tensor parallelism: split the
    output-feature (last) dim over the model axis; everything else —
    scalars, small leaves, indivisible channel counts — stays replicated."""
    n = mesh.shape[axis_name]
    if (
        len(shape) < 2
        or int(np.prod(shape)) < min_size
        or shape[-1] % n
    ):
        return replicated(mesh)
    spec = [None] * (len(shape) - 1) + [axis_name]
    return NamedSharding(mesh, P(*spec))


def tp_sharding(mesh: Mesh, tree, axis_name: str = MODEL_AXIS,
                min_size: int = 2048):
    """Tensor-parallel state layout over the mesh's model axis (the
    Megatron column-parallel recipe, expressed declaratively for GSPMD).

    Every large >=2-D leaf — conv kernels (kh, kw, cin, cout), dense
    kernels (in, out), qkv/proj weights — is split on its OUTPUT-feature
    dim across ``model``.  Under ``jit`` XLA's SPMD partitioner then
    propagates the channel sharding through the network: each device
    computes its cout-slice of every conv/matmul (a 1/N slice of the
    layer's MXU FLOPs and weight HBM), inserting all-gathers only where a
    consumer genuinely needs the full channel dim (GroupNorm group stats,
    attention softmax, the residual adds at replicated boundaries).
    Activations on the data axis stay batch-sharded, so the two axes
    compose: dp gradients all-reduce over ``data``, tp activations
    collect over ``model``.

    The reference has no model-parallel path at all (its only hook is
    Lightning DDP, reference scripts/train.py:139-150); this is the
    TPU-native capability that lets a model wider than one chip's HBM
    train at all.

    ``min_size``: leaves below this many elements (biases, norm affines,
    time-embedding vectors) stay replicated — sharding them saves nothing
    and adds per-layer collectives."""
    return jax.tree.map(
        lambda x: _tp_leaf(mesh, getattr(x, "shape", ()), axis_name,
                           min_size),
        tree,
    )


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )
