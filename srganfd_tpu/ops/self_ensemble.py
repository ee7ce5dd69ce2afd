"""Geometric x8 self-ensemble (test-time augmentation) for SR serving.

Beyond the reference (which serves a single forward pass,
``ESRGAN/inference.py:65-74``): the standard EDSR-style enhanced
prediction — run the generator on all 8 dihedral transforms of the LR
input (4 rotations x optional horizontal flip), map each SR output back
through the inverse transform, and average. SR networks are not
D4-equivariant, so the 8 predictions differ; their mean consistently
buys a few tenths of a dB of PSNR at 8x the serving FLOPs.

TPU-first shape handling: 90-degree rotations transpose (H, W), so a
naive per-variant loop compiles two programs and issues 8 dispatches.
:func:`self_ensemble_batched` instead folds the 4 same-shape variants of
each orientation into ONE batched dispatch — 2 compiled programs, 2
dispatches, both MXU-efficient at 4x batch. The generic
:func:`self_ensemble` wraps ANY single-image SR callable (tiled,
spatially-sharded, quantized) at the outermost level.

All transforms are exact permutations (no resampling), and averaging is
float32, so ensembling never degrades numerics.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["DIHEDRAL", "transform", "inverse_transform", "self_ensemble",
           "self_ensemble_batched"]

# the 8 elements of D4 as (k, flip): horizontal flip first, then rot90^k
DIHEDRAL: tuple[tuple[int, bool], ...] = tuple(
    (k, f) for f in (False, True) for k in range(4)
)


def transform(img: np.ndarray, k: int, flip: bool) -> np.ndarray:
    """Apply dihedral element (k, flip) over the leading two (H, W) axes
    of an HWC array: horizontal flip first, then k quarter-turns."""
    if flip:
        img = img[:, ::-1]
    return np.rot90(img, k)


def inverse_transform(img: np.ndarray, k: int, flip: bool) -> np.ndarray:
    """Inverse of :func:`transform`: undo the rotation, then the flip."""
    img = np.rot90(img, -k)
    if flip:
        img = img[:, ::-1]
    return img


def self_ensemble(
    run_single: Callable[[np.ndarray], np.ndarray], img: np.ndarray
) -> np.ndarray:
    """x8 ensemble around an arbitrary single-image SR path.

    ``run_single``: (H, W, C) -> (sH, sW, C); works unchanged for tiled
    or spatially-sharded serving because the transform/inverse pair wraps
    the whole pipeline. Returns the float32 mean of the 8 back-mapped
    predictions.
    """
    acc = None
    for k, f in DIHEDRAL:
        sr = np.asarray(run_single(np.ascontiguousarray(transform(img, k, f))))
        sr = inverse_transform(sr, k, f).astype(np.float32)
        acc = sr if acc is None else acc + sr
    return acc / len(DIHEDRAL)


def self_ensemble_batched(apply_fn, params, img: np.ndarray) -> np.ndarray:
    """x8 ensemble in two batched dispatches.

    ``apply_fn(params, (N, H, W, C)) -> (N, sH, sW, C)`` (the plain
    jitted generator). Variants with even k keep the input shape and
    batch together; odd-k variants batch at the transposed shape — one
    compiled program per orientation (equal for square inputs).
    """
    groups: dict[bool, list[tuple[int, bool]]] = {False: [], True: []}
    for k, f in DIHEDRAL:
        groups[bool(k % 2)].append((k, f))

    acc = None
    for variants in groups.values():
        batch = np.stack(
            [np.ascontiguousarray(transform(img, k, f)) for k, f in variants]
        )
        srs = np.asarray(apply_fn(params, batch))
        for sr, (k, f) in zip(srs, variants):
            sr = inverse_transform(sr, k, f).astype(np.float32)
            acc = sr if acc is None else acc + sr
    return acc / len(DIHEDRAL)
