"""Batched image filtering with per-sample kernels (jittable, NHWC).

Parity target: ``filter2d_torch`` (``Real_ESRGAN/imgproc.py:1092-1124``,
reflect-padded grouped conv2d with one kernel per batch element) and the
scipy ``ndimage.convolve(mode='mirror')`` blur in the BSRGAN chain
(``BSRGAN/imgproc.py:224``). Both use reflect-101 boundaries and
symmetric kernels, so correlation == convolution.

TPU strategy: fold the batch into channels and run one depthwise conv —
a single fused XLA op instead of a vmap of convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["filter2d", "gaussian_blur"]


def filter2d(images: jax.Array, kernels: jax.Array) -> jax.Array:
    """Apply one 2-D kernel per batch element.

    Args:
      images: (N, H, W, C)
      kernels: (N, K, K), K odd (zero-padded kernels of mixed true size
        behave identically to their unpadded originals under reflect pad
        as long as pad >= true_half; we reflect-pad by K//2).
    Returns (N, H, W, C).
    """
    n, h, w, c = images.shape
    k = kernels.shape[-1]
    pad = k // 2
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # (1, H+2p, W+2p, N*C): batch folded into channels.
    x = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * pad, w + 2 * pad, n * c)
    # Depthwise kernel (K, K, 1, N*C), each sample's kernel repeated over C.
    kern = jnp.repeat(kernels.transpose(1, 2, 0), c, axis=-1)[:, :, None, :]
    out = jax.lax.conv_general_dilated(
        x,
        kern.astype(images.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n * c,
        # degradation-grade numerics: full f32 accumulation (default TPU/CPU
        # paths may downcast and cost ~1e-3 absolute error)
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(h, w, n, c).transpose(2, 0, 1, 3)


def gaussian_blur(images: jax.Array, kernel2d: jax.Array) -> jax.Array:
    """Shared-kernel blur (all batch elements use the same kernel), reflect
    boundaries — used by USM sharpening."""
    n = images.shape[0]
    kernels = jnp.broadcast_to(kernel2d[None], (n, *kernel2d.shape))
    return filter2d(images, kernels)
