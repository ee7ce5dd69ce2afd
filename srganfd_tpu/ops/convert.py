"""Image <-> tensor conversion helpers.

Parity target: ``image_to_tensor`` / ``tensor_to_image`` /
``preprocess_one_image`` (``BSRGAN/imgproc.py:329-386,480-491``; part of
every folder's ``imgproc.__all__``). NHWC instead of NCHW; ``half`` maps
to bfloat16 (the TPU half-precision type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["image_to_tensor", "tensor_to_image", "preprocess_one_image"]


def image_to_tensor(image: np.ndarray, range_norm: bool = False, half: bool = False) -> jax.Array:
    """HWC [0,1] float image -> (1, H, W, C) device array; ``range_norm``
    rescales to [-1, 1], ``half`` casts to bfloat16."""
    t = jnp.asarray(np.ascontiguousarray(image), jnp.float32)[None]
    if range_norm:
        t = t * 2.0 - 1.0
    if half:
        t = t.astype(jnp.bfloat16)
    return t


def tensor_to_image(tensor: jax.Array, range_norm: bool = False, half: bool = False) -> np.ndarray:
    """(1, H, W, C) or (H, W, C) array -> uint8 HWC image; ``range_norm``
    maps [-1,1] back to [0,1] first."""
    t = tensor[0] if tensor.ndim == 4 else tensor
    t = t.astype(jnp.bfloat16) if half else t.astype(jnp.float32)
    if range_norm:
        t = (t + 1.0) / 2.0
    arr = np.asarray(jnp.clip(t.astype(jnp.float32) * 255.0, 0, 255))
    return arr.astype(np.uint8)


def preprocess_one_image(image_path: str) -> jax.Array:
    """Read + decode + to-device, the inference.py input path
    (``BSRGAN/imgproc.py:480-491``)."""
    from srganfd_tpu.data.datasets import load_image_rgb

    return image_to_tensor(load_image_rgb(image_path))
