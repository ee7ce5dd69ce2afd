"""Tiled (optionally mesh-parallel) large-image inference.

The reference handles large inputs only by offline tiling and LPIPS
quadrant chunking (SURVEY.md §5 long-context notes); its self-attention
variants are O((HW)^2) and infeasible on large frames. This module SRs
arbitrarily large images under fixed memory: split into overlapping
tiles, SR tiles as a batch (sharded over the ``data`` mesh axis when a
mesh is given — the CNN analog of context parallelism), and blend the
overlaps with linear feathering.

Overlap semantics: with overlap >= the network's effective receptive
radius the result is exact; smaller overlaps trade exactness for speed
(feathered seams). RRDB trunks have ~140 px theoretical receptive radius
but an effective radius of a few pixels, so the default 16 px overlap is
visually seamless.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.parallel.mesh import batch_sharding

__all__ = ["tiled_sr"]


def _feather_weights(tile_h: int, tile_w: int, overlap: int) -> np.ndarray:
    """Linear blend ramp over the overlap margins."""
    ramp = lambda n: np.minimum(np.arange(n) + 1, overlap + 1) / (overlap + 1)
    wy = np.minimum(ramp(tile_h), ramp(tile_h)[::-1])
    wx = np.minimum(ramp(tile_w), ramp(tile_w)[::-1])
    return (wy[:, None] * wx[None, :]).astype(np.float32)


def tiled_sr(
    apply_fn: Callable[[Any, jax.Array], jax.Array],
    params: Any,
    image: np.ndarray,
    upscale_factor: int,
    tile: int = 128,
    overlap: int = 16,
    mesh: Any | None = None,
    batch_size: int = 8,
) -> np.ndarray:
    """SR one large HWC [0,1] image by overlapping tiles.

    ``apply_fn(params, lr_batch) -> sr_batch`` is the jitted generator.
    With ``mesh``, each tile batch is sharded over the ``data`` axis so
    tiles run on all chips simultaneously.
    """
    h, w, c = image.shape
    stride = tile - 2 * overlap
    assert stride > 0, "tile must exceed 2*overlap"
    ny = max(1, math.ceil((h - 2 * overlap) / stride))
    nx = max(1, math.ceil((w - 2 * overlap) / stride))

    # reflect-pad so every tile is full size
    pad_h = (ny - 1) * stride + tile - h
    pad_w = (nx - 1) * stride + tile - w
    padded = np.pad(image, ((0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0)), mode="reflect")

    coords = [(iy * stride, ix * stride) for iy in range(ny) for ix in range(nx)]
    tiles = np.stack([padded[y : y + tile, x : x + tile] for y, x in coords])

    sf = upscale_factor
    out = np.zeros((padded.shape[0] * sf, padded.shape[1] * sf, c), np.float32)
    acc = np.zeros(out.shape[:2], np.float32)
    weights = _feather_weights(tile * sf, tile * sf, overlap * sf)

    sharding = batch_sharding(mesh) if mesh is not None else None
    n_dev = len(mesh.devices.flatten()) if mesh is not None else 1
    bs = max(batch_size, n_dev)
    bs -= bs % n_dev  # divisible batches shard cleanly

    for start in range(0, len(tiles), bs):
        chunk = tiles[start : start + bs]
        real = len(chunk)
        if real < bs:  # pad the final batch to the compiled size
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - real, axis=0)])
        batch = jnp.asarray(chunk)
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        sr = np.asarray(apply_fn(params, batch))[:real]
        for j, (y, x) in enumerate(coords[start : start + real]):
            oy, ox = y * sf, x * sf
            out[oy : oy + tile * sf, ox : ox + tile * sf] += sr[j] * weights[..., None]
            acc[oy : oy + tile * sf, ox : ox + tile * sf] += weights
    out /= np.maximum(acc, 1e-8)[..., None]
    return out[: h * sf, : w * sf]
