"""Device mesh and sharding helpers.

The reference trains on one pinned GPU (``device = torch.device("cuda", 0)``
in every config, SURVEY.md §0); here data parallelism is first-class:
batches shard over the ``data`` mesh axis, parameters are replicated, and
jit inserts psum gradient sync over ICI automatically from the shardings.

The mesh generalizes to more axes (tensor/pipeline) by adding names; for
these small CNN workloads DP is the strategy the workload motivates
(SURVEY.md §2.9), and the train step is written against arbitrary
``data``-sharded batches so wider meshes are a config change.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "global_batch_from_host",
]


def make_mesh(
    shape: tuple[int, ...] = (-1,),
    axes: tuple[str, ...] = ("data",),
    devices: list[Any] | None = None,
) -> Mesh:
    """Build a Mesh; a single ``-1`` dim absorbs all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = math.prod(s for s in shape if s != -1)
        shape[shape.index(-1)] = n // known
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for per-step batches."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def global_batch_from_host(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Assemble the globally-sharded batch from THIS process's local shard.

    Multi-host: every process passes its per-host batch (its shard of the
    file list via ``list_image_files(shard=...)``); the global batch is
    the process-order concatenation, with each device holding its slice —
    ``jax.make_array_from_process_local_data`` wires local shards to the
    mesh's addressable devices without any cross-host data movement.
    Single-process this reduces to ``shard_batch``.
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
