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


_REFERENCE_ROTATE_SHIFT = {1: (1, 0), 2: (1, 1), 3: (0, 1)}


def random_rotate_flip_np(
    image: np.ndarray,
    rng: np.random.Generator,
    reference_rotate_quirk: bool = False,
) -> np.ndarray:
    """The reference Train-mode augmentation set: ALWAYS rotate by a
    uniform choice of {90, 180, 270} (``random_rotate(img, [90, 180,
    270])`` — 0 degrees is NOT in the angle list,
    ``ESRGAN/dataset.py:64``, ``BSRGAN/dataset.py:71``), then
    horizontal/vertical flips with p=0.5 each. Over the dihedral group
    this is deliberately non-uniform: transposed orientations carry 2/3
    of the mass and the identity only 1/12 (vs 1/8 uniform) — sampling
    k in {0..3} would silently shift the training distribution.

    ``reference_rotate_quirk=True`` additionally reproduces the
    reference's rotation DEFECT on even-sized square crops:
    ``cv2.getRotationMatrix2D`` is centered at ``(s//2, s//2)`` — half a
    pixel off the true center — so the executed reference shifts the
    rotated content by one pixel and zero-fills the entering border
    (mapping measured against the executed ``random_rotate``: rot90(k)
    shifted by {90: (1,0), 180: (1,1), 270: (0,1)}; odd sizes are
    exact). Off by default: the clean rot90 is the intended transform
    (same policy as the DiffJPEG transposed-table defect)."""
    k = int(rng.integers(1, 4))
    image = np.rot90(image, k)
    if (
        reference_rotate_quirk
        and image.shape[0] == image.shape[1]
        and image.shape[0] % 2 == 0
    ):
        dy, dx = _REFERENCE_ROTATE_SHIFT[k]
        shifted = np.zeros_like(image)
        shifted[dy:, dx:] = image[: image.shape[0] - dy, : image.shape[1] - dx]
        image = shifted
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
