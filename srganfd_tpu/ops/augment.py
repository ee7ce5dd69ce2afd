"""Paired crop / flip / rotate augmentations.

Parity targets:
- host-side numpy crops/flips/rot90 used by the datasets
  (``ESRGAN/imgproc.py:465-575``, ``BSRGAN/dataset.py:64-80``);
- on-device paired random crop of (gt, lr) keeping alignment
  (``BSRGAN/imgproc.py:846-886``, used inside the BSRGAN train loop) and
  the Real-ESRGAN paired tensor augmentations
  (``Real_ESRGAN/imgproc.py:2081-2278``).

Device versions are jittable: crop offsets / flip flags arrive as traced
operands so one compiled program covers every draw.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "random_crop_np",
    "center_crop_np",
    "random_rotate_flip_np",
    "paired_random_crop",
    "paired_flip_rotate",
]


def random_crop_np(image: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = image.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return image[top : top + size, left : left + size, ...]


def center_crop_np(image: np.ndarray, size: int) -> np.ndarray:
    h, w = image.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return image[top : top + size, left : left + size, ...]


def random_rotate_flip_np(image: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """90-degree rotations + horizontal/vertical flips with p=0.5 each,
    matching the Train-mode augmentation set."""
    k = int(rng.integers(0, 4))
    if k:
        image = np.rot90(image, k)
    if rng.random() < 0.5:
        image = image[:, ::-1, ...]
    if rng.random() < 0.5:
        image = image[::-1, :, ...]
    return np.ascontiguousarray(image)


@functools.partial(jax.jit, static_argnames=("gt_patch", "upscale_factor"))
def paired_random_crop(
    gt: jax.Array,
    lr: jax.Array,
    top_lr: jax.Array,
    left_lr: jax.Array,
    gt_patch: int,
    upscale_factor: int,
) -> tuple[jax.Array, jax.Array]:
    """Aligned (gt, lr) crop: LR offsets (N,), GT offsets = LR * sf.

    Batched dynamic_slice via vmap; offsets are traced so the program
    compiles once per shape."""
    lr_patch = gt_patch // upscale_factor

    def crop_one(img, top, left, patch):
        return jax.lax.dynamic_slice(
            img, (top, left, 0), (patch, patch, img.shape[-1])
        )

    lr_out = jax.vmap(lambda i, t, l: crop_one(i, t, l, lr_patch))(lr, top_lr, left_lr)
    gt_out = jax.vmap(
        lambda i, t, l: crop_one(i, t, l, gt_patch)
    )(gt, top_lr * upscale_factor, left_lr * upscale_factor)
    return gt_out, lr_out


@jax.jit
def paired_flip_rotate(
    gt: jax.Array, lr: jax.Array, hflip: jax.Array, vflip: jax.Array, rot90: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-sample paired flips + 90-degree rotation, flags (N,) in {0,1}.
    Matches ``random_rotate_torch``/flip semantics (same transform applied
    to every member of the (gt, lr) pair)."""

    def apply(img):
        h = hflip[:, None, None, None]
        v = vflip[:, None, None, None]
        img = jnp.where(h > 0.5, img[:, :, ::-1, :], img)
        img = jnp.where(v > 0.5, img[:, ::-1, :, :], img)
        return img

    gt, lr = apply(gt), apply(lr)
    # rot90 only valid for square patches; select rotated vs not per sample.
    if gt.shape[1] == gt.shape[2]:
        r = rot90[:, None, None, None]
        gt = jnp.where(r > 0.5, jnp.rot90(gt, axes=(1, 2)), gt)
        lr = jnp.where(r > 0.5, jnp.rot90(lr, axes=(1, 2)), lr)
    return gt, lr
