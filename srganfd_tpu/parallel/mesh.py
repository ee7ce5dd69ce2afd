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
    "make_mesh", "make_hybrid_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch", "global_batch_from_host", "maybe_init_distributed",
    "FlagConsensus",
]


def maybe_init_distributed() -> bool:
    """Initialize ``jax.distributed`` for multi-process (multi-host) runs.

    No-op (returns False) unless the environment requests it: either
    ``SRGANFD_DISTRIBUTED=1`` (TPU pods — jax auto-discovers the
    coordinator from the TPU metadata) or an explicit
    ``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_PROCESS_ID`` /
    ``JAX_NUM_PROCESSES``] triple (CPU/GPU clusters). Call before the
    first device access; ``cli.train`` does this automatically. Safe to
    call twice (already-initialized errors are swallowed).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if os.environ.get("SRGANFD_DISTRIBUTED", "0") != "1" and not addr:
        return False
    kwargs: dict[str, Any] = {}
    if addr:
        kwargs["coordinator_address"] = addr
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
    return True


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


def make_hybrid_mesh(
    ici_shape: tuple[int, ...] = (-1,),
    dcn_shape: tuple[int, ...] | None = None,
    axes: tuple[str, ...] = ("data",),
    devices: list[Any] | None = None,
) -> Mesh:
    """Mesh for multi-slice TPU pods: slow DCN hops only on the OUTER
    factor of each axis, fast ICI inside a slice.

    ``dcn_shape[i] * ici_shape[i]`` devices span logical axis ``i``; put
    the replicated/data axis (gradient psum once per step — a
    ring-reduce whose per-hop payload is the full gradient) on DCN and
    keep tensor/spatial/pipeline axes (per-layer collectives) strictly
    intra-slice, i.e. ``dcn_shape`` 1 everywhere but the data axis.

    Device assignment: ``mesh_utils.create_hybrid_device_mesh`` when
    devices carry ``slice_index`` (real multi-slice pods); otherwise
    (virtual CPU meshes, single slice) devices are grouped into
    ``prod(dcn_shape)`` contiguous pseudo-slices, which preserves the
    collective structure for dry runs. A single ``-1`` in ``ici_shape``
    absorbs the remaining per-slice devices.
    """
    devices = devices if devices is not None else jax.devices()
    if dcn_shape is None:
        dcn_shape = (1,) * len(ici_shape)
    if len(dcn_shape) != len(ici_shape) or len(ici_shape) != len(axes):
        raise ValueError("ici_shape, dcn_shape and axes must have equal rank")
    n = len(devices)
    n_slices = math.prod(dcn_shape)
    if n % n_slices:
        raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    per_slice = n // n_slices
    ici_shape = list(ici_shape)
    if -1 in ici_shape:
        known = math.prod(s for s in ici_shape if s != -1)
        ici_shape[ici_shape.index(-1)] = per_slice // known
    if math.prod(ici_shape) != per_slice:
        raise ValueError(f"ici shape {ici_shape} != {per_slice} devices/slice")

    if n_slices > 1 and all(hasattr(d, "slice_index") for d in devices):
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape), devices=devices
        )
        return Mesh(dev_array, axes)

    # pseudo-slices: outer factors index contiguous device groups, so a
    # DCN-axis collective touches one device per group — the same
    # communication pattern the real assignment produces.
    arr = np.asarray(devices).reshape(
        tuple(dcn_shape) + tuple(ici_shape)
    )  # (d0..dk, i0..ik)
    k = len(ici_shape)
    order = [x for pair in zip(range(k), range(k, 2 * k)) for x in pair]
    arr = arr.transpose(order).reshape(
        tuple(d * i for d, i in zip(dcn_shape, ici_shape))
    )
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for per-step batches."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


class FlagConsensus:
    """Cluster-wide max of a per-process int flag, polled without stalling
    the dispatch pipeline.

    Failure-coordination primitive for multi-process training: a SIGTERM
    (preemption notice) may reach only a subset of processes, but the
    train step is a collective — a process exiting unilaterally leaves
    its peers hanging in the next psum. ``poll(flag)`` is therefore a
    symmetric collective every process calls at the same loop points; it
    dispatches one tiny all-device ``max`` and returns the result of the
    *previous* poll (0 on the first). The one-poll delay means the hot
    loop never host-syncs on a fresh collective result — reading last
    poll's scalar only waits for work already ordered before the current
    step, preserving the async dispatch pipeline. The reference has no
    analog (single pinned GPU, SURVEY.md §0).
    """

    def __init__(self, devices: list[Any] | None = None) -> None:
        import jax.numpy as jnp

        devices = devices if devices is not None else jax.devices()
        self._mesh = Mesh(np.asarray(devices), ("all",))
        self._sharded = NamedSharding(self._mesh, P("all"))
        self._max = jax.jit(
            jnp.max, out_shardings=NamedSharding(self._mesh, P())
        )
        self._pending: Any | None = None

    def poll(self, flag: int) -> int:
        """Contribute ``flag``; return the consensus (max) of the previous
        round. Collective: every process must call at the same points."""
        local = [
            jax.device_put(np.asarray([flag], np.int32), d)
            for d in self._mesh.local_devices
        ]
        garr = jax.make_array_from_single_device_arrays(
            (len(self._mesh.devices.ravel()),), self._sharded, local
        )
        prev, self._pending = self._pending, self._max(garr)
        return int(prev) if prev is not None else 0

    def barrier(self, name: str = "srganfd:flag_barrier") -> None:
        """Block until every process reaches this point (exit paths: a
        peer must not hit the jax.distributed shutdown-barrier timeout
        while another is still writing a checkpoint)."""
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


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
