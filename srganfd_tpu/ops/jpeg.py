"""Differentiable JPEG compression (DiffJPEG) as a fused XLA pipeline.

Parity target: the nn.Module DiffJPEG stack in
``Real_ESRGAN/imgproc.py:1183-1497`` (RGB->YCbCr, 2x2 chroma subsample,
8x8 block DCT, quality-scaled quantization with optional differentiable
rounding, dequantize + IDCT + chroma upsample + merge). The BSRGAN chain's
cv2-encode JPEG (``BSRGAN/imgproc.py:284-293``) is modeled with the same
codec — real entropy coding is lossless, so quantization is the only
signal-affecting stage.

Everything here is shape-static and jittable; ``quality`` is a per-sample
traced operand, so one compiled program covers every quality draw.
Input NHWC in [0,1]; H and W must be multiples of 16 (callers pad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["diff_jpeg", "jpeg_quality_to_factor"]

# Standard JPEG luminance / chrominance quantization tables.
_Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_C_TABLE = np.full((8, 8), 99, dtype=np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]], dtype=np.float32
)

_RGB2YCBCR = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
).T
_YCBCR2RGB = np.array(
    [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], dtype=np.float32
).T


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix."""
    m = np.zeros((8, 8), dtype=np.float64)
    for k in range(8):
        for n in range(8):
            m[k, n] = np.cos(np.pi * k * (2 * n + 1) / 16.0)
        m[k] *= np.sqrt(0.25 if k else 0.125)
    return m.astype(np.float32)


_DCT = _dct_matrix()


def jpeg_quality_to_factor(quality: jax.Array) -> jax.Array:
    """JPEG quality in [1,100] -> quantization scale factor (libjpeg rule)."""
    quality = quality.astype(jnp.float32)
    factor = jnp.where(quality < 50.0, 5000.0 / quality, 200.0 - 2.0 * quality)
    return factor / 100.0


def _to_blocks(x: jax.Array) -> jax.Array:
    """(N, H, W) -> (N, H/8*W/8, 8, 8)."""
    n, h, w = x.shape
    x = x.reshape(n, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(n, -1, 8, 8)


def _from_blocks(x: jax.Array, h: int, w: int) -> jax.Array:
    n = x.shape[0]
    x = x.reshape(n, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(n, h, w)


def _dct2(blocks: jax.Array) -> jax.Array:
    return jnp.einsum(
        "ij,nbjk,lk->nbil", _DCT, blocks, _DCT, precision=jax.lax.Precision.HIGHEST
    )


def _idct2(coefs: jax.Array) -> jax.Array:
    return jnp.einsum(
        "ji,nbjk,kl->nbil", _DCT, coefs, _DCT, precision=jax.lax.Precision.HIGHEST
    )


def _diff_round(x: jax.Array) -> jax.Array:
    """x + (round(x) - x) detached-cubic approximation
    (``Real_ESRGAN/imgproc.py:1183-1195``): round(x) + (x - round(x))^3."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def _codec_channel(
    chan: jax.Array,
    table: np.ndarray,
    factor: jax.Array,
    differentiable: bool,
    transpose_tables: bool,
) -> jax.Array:
    """DCT -> quantize -> round -> dequantize -> IDCT for one plane.

    chan: (N, H, W) centered at 0 (i.e. value-128); factor: (N,).
    """
    n, h, w = chan.shape
    blocks = _to_blocks(chan)
    coefs = _dct2(blocks)
    if transpose_tables:
        table = table.T
    q = jnp.asarray(table)[None, None] * factor[:, None, None, None]
    scaled = coefs / q
    rounded = _diff_round(scaled) if differentiable else jnp.round(scaled)
    back = _idct2(rounded * q)
    return _from_blocks(back, h, w)


@functools.partial(jax.jit, static_argnames=("differentiable", "transpose_tables"))
def diff_jpeg(
    images: jax.Array,
    quality: jax.Array,
    differentiable: bool = True,
    transpose_tables: bool = False,
) -> jax.Array:
    """JPEG-compress a batch at per-sample quality.

    Args:
      images: (N, H, W, 3) RGB in [0,1]; H, W multiples of 16.
      quality: (N,) in [1, 100].
      transpose_tables: the reference's DiffJPEG quantizes with TRANSPOSED
        Y/C tables (``Real_ESRGAN/imgproc.py:43-51`` builds ``y_table.T``)
        — a quirk diverging from libjpeg/cv2. False (default) follows the
        JPEG standard; True reproduces the reference bit-for-bit.
    Returns (N, H, W, 3) in [0,1].
    """
    n, h, w, _ = images.shape
    assert h % 16 == 0 and w % 16 == 0, "pad to multiples of 16 before diff_jpeg"
    x = images.astype(jnp.float32) * 255.0
    ycc = x @ jnp.asarray(_RGB2YCBCR) + jnp.asarray([0.0, 128.0, 128.0])
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]

    # 4:2:0 chroma subsampling (2x2 mean).
    def down(c):
        return c.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def up(c):
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

    factor = jpeg_quality_to_factor(quality)
    tt = transpose_tables
    y_out = _codec_channel(y - 128.0, _Y_TABLE, factor, differentiable, tt) + 128.0
    cb_out = up(_codec_channel(down(cb) - 128.0, _C_TABLE, factor, differentiable, tt) + 128.0)
    cr_out = up(_codec_channel(down(cr) - 128.0, _C_TABLE, factor, differentiable, tt) + 128.0)

    ycc_out = jnp.stack([y_out, cb_out - 128.0, cr_out - 128.0], axis=-1)
    rgb = ycc_out @ jnp.asarray(_YCBCR2RGB)
    return jnp.clip(rgb / 255.0, 0.0, 1.0).astype(images.dtype)
