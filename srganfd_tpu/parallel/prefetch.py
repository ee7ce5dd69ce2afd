"""Double-buffered host->HBM prefetch.

Parity target: ``CUDAPrefetcher`` (``ESRGAN/dataset.py:196-236``) — the
reference overlaps H2D copies with compute on a side CUDA stream. The JAX
equivalent: ``jax.device_put`` is asynchronous, so keeping a bounded
buffer of in-flight device batches ahead of the consumer gives the same
copy/compute overlap on TPU without explicit streams.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator

import jax

from srganfd_tpu.parallel.mesh import batch_sharding

__all__ = ["prefetch_to_device", "CPUPrefetcher"]


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    mesh: Any | None = None,
    axis: str = "data",
) -> Iterator[Any]:
    """Yield device-resident batches, keeping ``size`` transfers in flight.

    With a mesh, each batch is sharded over its leading axis across the
    ``axis`` mesh dimension (per-host shards ride a single device_put)."""
    sharding = batch_sharding(mesh, axis) if mesh is not None else None

    def put(batch: Any) -> Any:
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    buf: collections.deque = collections.deque()
    it = iter(iterator)
    try:
        while len(buf) < size:
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class CPUPrefetcher:
    """Thin ``.next()/.reset()`` iterator protocol kept for surface parity
    with the reference (``ESRGAN/dataset.py:172-193``)."""

    def __init__(self, loader: Iterable[Any]) -> None:
        self.loader = loader
        self.it = iter(loader)

    def next(self) -> Any | None:
        try:
            return next(self.it)
        except StopIteration:
            return None

    def reset(self) -> None:
        self.it = iter(self.loader)

    def __len__(self) -> int:
        return len(self.loader)  # type: ignore[arg-type]
