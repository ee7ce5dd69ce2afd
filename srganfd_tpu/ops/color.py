"""MATLAB-convention color conversions (BT.601) in JAX.

Parity targets: ``rgb_to_ycbcr`` / ``bgr_to_ycbcr`` / ``ycbcr_to_rgb`` /
``ycbcr_to_bgr`` and their torch twins in ``ESRGAN/imgproc.py:291-462``
(identical copies in every reference folder). All functions here take
channel-last float arrays in [0, 1] and return [0, 1]-scaled outputs
(the torch reference divides by 255 at the end; we keep that convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Metrics-grade op: always full f32 matmul (TPU would otherwise default the
# 3x3 channel matmul to bf16, costing ~1e-3 absolute error in PSNR inputs).
_matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

__all__ = [
    "rgb_to_ycbcr",
    "bgr_to_ycbcr",
    "ycbcr_to_rgb",
    "ycbcr_to_bgr",
    "rgb_to_y",
    "bgr_to_y",
]

# MATLAB rgb2ycbcr constants: Y/Cb/Cr = M @ rgb*255 + [16, 128, 128].
# numpy (not jnp) on purpose: creating device arrays at import initializes
# the XLA backend, which breaks jax.distributed.initialize for any
# multi-process program that imports this package first; numpy constants
# become on-device constants at trace time with identical numerics.
_RGB2YCBCR = np.array(
    [[65.481, -37.797, 112.0],
     [128.553, -74.203, -93.786],
     [24.966, 112.0, -18.214]],
    dtype=np.float32,
)
_YCBCR_BIAS = np.array([16.0, 128.0, 128.0], dtype=np.float32)

# MATLAB ycbcr2rgb: rgb = (ycbcr*255) @ Minv * 255 + bias, then /255.
_YCBCR2RGB = np.array(
    [[0.00456621, 0.00456621, 0.00456621],
     [0.0, -0.00153632, 0.00791071],
     [0.00625893, -0.00318811, 0.0]],
    dtype=np.float32,
)
_RGB_BIAS = np.array([-222.921, 135.576, -276.836], dtype=np.float32)


def rgb_to_ycbcr(image: jax.Array, only_use_y_channel: bool = False) -> jax.Array:
    """RGB [0,1] -> YCbCr [0,1] (MATLAB constants). With
    ``only_use_y_channel`` the channel axis collapses to size 1."""
    dt = image.dtype
    x = image.astype(jnp.float32)
    if only_use_y_channel:
        y = _matmul(x, _RGB2YCBCR[:, :1]) + 16.0
        return (y / 255.0).astype(dt)
    out = _matmul(x, _RGB2YCBCR) + _YCBCR_BIAS
    return (out / 255.0).astype(dt)


def bgr_to_ycbcr(image: jax.Array, only_use_y_channel: bool = False) -> jax.Array:
    """BGR [0,1] -> YCbCr [0,1]; same matrix with rows flipped."""
    return rgb_to_ycbcr(image[..., ::-1], only_use_y_channel)


def ycbcr_to_rgb(image: jax.Array) -> jax.Array:
    """YCbCr [0,1] -> RGB [0,1] (MATLAB ycbcr2rgb constants)."""
    dt = image.dtype
    x = image.astype(jnp.float32) * 255.0
    out = _matmul(x, _YCBCR2RGB) * 255.0 + _RGB_BIAS
    return (out / 255.0).astype(dt)


def ycbcr_to_bgr(image: jax.Array) -> jax.Array:
    """YCbCr [0,1] -> BGR [0,1]."""
    return ycbcr_to_rgb(image)[..., ::-1]


def rgb_to_y(image: jax.Array) -> jax.Array:
    """Y channel only, keeping a size-1 channel axis (the reference's
    ``only_use_y_channel=True`` path used by Y-channel PSNR/SSIM,
    ``ESRGAN/image_quality_assessment.py:399-404``)."""
    return rgb_to_ycbcr(image, only_use_y_channel=True)


def bgr_to_y(image: jax.Array) -> jax.Array:
    return bgr_to_ycbcr(image, only_use_y_channel=True)
