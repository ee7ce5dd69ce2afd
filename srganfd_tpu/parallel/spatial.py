"""Spatially-sharded inference via shard_map + ICI halo exchange.

The CNN analog of context parallelism (SURVEY.md §5): one huge frame's
height axis is sharded across the ``data`` mesh axis; each device
receives a halo of boundary rows from its neighbors over ICI
(``jax.lax.ppermute``), runs the generator on its slice+halo, and drops
the halo from its output. Unlike host-side tiling
(``parallel/tiled_inference.py``), the whole operation is ONE jitted
SPMD program — no host stitching, halos ride the interconnect.

Halo semantics: with halo >= the network's effective receptive radius,
interior shard boundaries are EXACT (tests pin this). At the image's true
top/bottom edge the sharded version supplies reflected context where the
unsharded model would see its convs' zero padding — a deviation confined
to a receptive-radius-deep border (arguably better-behaved than zero
padding; same class of edge semantics as the reference's own border
crops in evaluation).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["spatial_sharded_sr"]


def _exchange_halos(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Append ``halo`` rows from the next shard and prepend ``halo`` rows
    from the previous shard (edge shards reflect-pad instead)."""
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:halo]  # my first rows -> previous device's bottom halo
    bot_rows = x[-halo:]  # my last rows -> next device's top halo

    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    # edge shards: reflect own boundary instead of the wrapped-around data
    reflect_top = x[1 : halo + 1][::-1]
    reflect_bot = x[-halo - 1 : -1][::-1]
    top = jnp.where(idx == 0, reflect_top, from_prev)
    bot = jnp.where(idx == n_dev - 1, reflect_bot, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def spatial_sharded_sr(
    apply_fn: Callable[[Any, jax.Array], jax.Array],
    params: Any,
    image: np.ndarray,
    upscale_factor: int,
    mesh: Mesh,
    halo: int = 16,
    axis: str = "data",
    row_multiple: int = 1,
) -> np.ndarray:
    """SR one large HWC [0,1] image with its H axis sharded over ``axis``.

    ``apply_fn(params, (1, h, w, 3)) -> (1, h*sf, w*sf, 3)`` is the
    jitted generator. Returns the HWC SR image on the host.

    ``row_multiple``: pad so each shard's row count is a multiple of this
    (ring-attention transformer archs need even per-shard rows for their
    stride-2 token grid).
    """
    n_dev = mesh.shape[axis]
    h, w, c = image.shape
    pad_h = (-h) % (n_dev * row_multiple)
    if pad_h:
        image = np.pad(image, ((0, pad_h), (0, 0), (0, 0)), mode="reflect")
    sf = upscale_factor

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    def run(p, img):
        local = _exchange_halos(img, halo, axis)
        sr = apply_fn(p, local[None])[0]
        return sr[halo * sf : sr.shape[0] - halo * sf]

    x = jax.device_put(
        jnp.asarray(image), NamedSharding(mesh, P(axis, None, None))
    )
    # replicate the output: the host copy is needed anyway, and under
    # multi-process meshes a sharded result would not be fully addressable
    # from any one process (np.asarray would fail); the all-gather rides
    # the same interconnect the halos did
    out = jax.jit(run, out_shardings=NamedSharding(mesh, P()))(params, x)
    return np.asarray(out)[: h * sf]
