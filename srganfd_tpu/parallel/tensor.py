"""Tensor parallelism for the conv generators: channel-sharded weights.

The reference is single-GPU (SURVEY.md §0/§2.9); data parallelism is the
strategy the workload motivates. This module provides the tensor-parallel
axis anyway for serving/scale-out completeness: conv kernels shard their
OUTPUT-feature axis over a ``model`` mesh axis, XLA's SPMD partitioner
then computes each device's filter slice locally and inserts the
all-gathers needed when the next layer consumes the full feature axis —
collectives ride ICI, nothing is hand-written.

Numerics are identical to the replicated model (validated in
``__graft_entry__.dryrun_multichip`` and tests/test_parallel_tensor.py).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["channel_sharded_params"]


def channel_sharded_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place a generator/discriminator param tree with conv kernels (and
    their biases) sharded on the trailing output-feature dimension over
    ``axis`` when divisible; everything else (and ragged shapes, e.g. the
    3-channel output head) stays replicated."""
    n = mesh.shape[axis]

    def put(x):
        if x.ndim >= 1 and x.shape[-1] % n == 0 and x.shape[-1] >= n:
            spec = P(*([None] * (x.ndim - 1) + [axis]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params)
