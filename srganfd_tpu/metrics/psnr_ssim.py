"""PSNR / SSIM in JAX, bit-faithful to the reference.

Parity targets (see tests/test_metrics.py goldens):
- torch modules ``PSNR``/``SSIM`` (``ESRGAN/image_quality_assessment.py:361-541``):
  RGB [0,1] NCHW inputs, optional border crop, optional Y-channel
  conversion, float64 accumulation, x255 domain. Here: NHWC, same math.
- numpy functions ``psnr``/``ssim`` (same file, :60-166): BGR [0,255] HWC
  inputs, Y-extraction via ``expand_y``.

Note the reference's two PSNR epsilon conventions are preserved exactly:
the torch path adds 1e-8 to the MSE, the numpy path adds 1e-8 to the
ratio inside the log (``image_quality_assessment.py:90,393``).

On TPU these run in float32 unless ``jax_enable_x64`` is set; the CPU test
suite enables x64 and matches the reference to ~1e-8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops import color

__all__ = [
    "PSNR", "SSIM", "psnr", "ssim", "gaussian_window",
    "psnr_tensor", "ssim_tensor", "psnr_tensor_padded", "ssim_tensor_padded",
]

def _highest_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel outer product (the SSIM window)."""
    i = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((i - (window_size - 1) / 2.0) ** 2) / (2.0 * sigma * sigma))
    g /= g.sum()
    return np.outer(g, g)


def _crop_border(x: jax.Array, border: int) -> jax.Array:
    if border > 0:
        return x[..., border:-border, border:-border, :]
    return x


def _to_y(x: jax.Array) -> jax.Array:
    return color.rgb_to_ycbcr(x, only_use_y_channel=True)


@functools.partial(jax.jit, static_argnames=("crop_border", "only_test_y_channel"))
def psnr_tensor(
    raw: jax.Array, dst: jax.Array, crop_border: int = 0, only_test_y_channel: bool = True
) -> jax.Array:
    """Batched PSNR over NHWC RGB [0,1] images -> shape (N,).

    Matches ``_psnr_torch`` (``ESRGAN/image_quality_assessment.py:361-396``).
    """
    raw = _crop_border(raw, crop_border)
    dst = _crop_border(dst, crop_border)
    if only_test_y_channel:
        raw, dst = _to_y(raw), _to_y(dst)
    raw = raw.astype(_highest_dtype())
    dst = dst.astype(_highest_dtype())
    mse = jnp.mean((raw * 255.0 - dst * 255.0) ** 2, axis=(1, 2, 3)) + 1e-8
    return 10.0 * jnp.log10(255.0**2 / mse)


def _valid_gauss_filter(x: jax.Array, window: jax.Array) -> jax.Array:
    """Per-channel valid-convolution with the SSIM window; NHWC."""
    c = x.shape[-1]
    k = jnp.broadcast_to(window[:, :, None, None], (*window.shape, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit, static_argnames=("crop_border", "only_test_y_channel", "window_size", "gaussian_sigma")
)
def ssim_tensor(
    raw: jax.Array,
    dst: jax.Array,
    crop_border: int = 0,
    only_test_y_channel: bool = True,
    window_size: int = 11,
    gaussian_sigma: float = 1.5,
) -> jax.Array:
    """Batched SSIM over NHWC RGB [0,1] images -> shape (N,).

    Matches ``_ssim_torch``/``_ssim_single_torch``
    (``ESRGAN/image_quality_assessment.py:421-505``): x255 domain,
    valid-conv Gaussian window, c1/c2 = (0.01*255)^2 / (0.03*255)^2.
    """
    raw = _crop_border(raw, crop_border)
    dst = _crop_border(dst, crop_border)
    if only_test_y_channel:
        raw, dst = _to_y(raw), _to_y(dst)
    raw = raw.astype(_highest_dtype()) * 255.0
    dst = dst.astype(_highest_dtype()) * 255.0

    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    window = jnp.asarray(gaussian_window(window_size, gaussian_sigma))

    mu_r = _valid_gauss_filter(raw, window)
    mu_d = _valid_gauss_filter(dst, window)
    mu_r2, mu_d2, mu_rd = mu_r * mu_r, mu_d * mu_d, mu_r * mu_d
    var_r = _valid_gauss_filter(raw * raw, window) - mu_r2
    var_d = _valid_gauss_filter(dst * dst, window) - mu_d2
    cov = _valid_gauss_filter(raw * dst, window) - mu_rd

    num = (2.0 * mu_rd + c1) * (2.0 * cov + c2)
    den = (mu_r2 + mu_d2 + c1) * (var_r + var_d + c2)
    return jnp.mean(num / den, axis=(1, 2, 3)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# masked fixed-shape variants: metrics over the top-left (h, w) valid
# region of bucket-padded images. Bit-identical to the unpadded kernels
# (pointwise Y conversion; valid-conv windows inside the mask see only
# valid pixels) but compiled ONCE per bucket shape — `valid_hw` is a
# traced operand, so mixed-size eval sets cost <= #buckets compiles
# instead of one per image size (SURVEY §7.3).
# ---------------------------------------------------------------------------


def _region_mask(valid_hw: jax.Array, height: int, width: int, border: int, dtype) -> jax.Array:
    """(N, H, W) 0/1 mask of rows/cols in [border, valid - border)."""
    rows = jnp.arange(height)[None, :]
    cols = jnp.arange(width)[None, :]
    ok_r = (rows >= border) & (rows < valid_hw[:, 0:1] - border)
    ok_c = (cols >= border) & (cols < valid_hw[:, 1:2] - border)
    return (ok_r[:, :, None] & ok_c[:, None, :]).astype(dtype)


@functools.partial(jax.jit, static_argnames=("crop_border", "only_test_y_channel"))
def psnr_tensor_padded(
    raw: jax.Array,
    dst: jax.Array,
    valid_hw: jax.Array,
    crop_border: int = 0,
    only_test_y_channel: bool = True,
) -> jax.Array:
    """PSNR over the valid region of padded NHWC images.

    ``valid_hw``: (N, 2) int32 original (h, w) per image. Equals
    ``psnr_tensor(raw[:, :h, :w], dst[:, :h, :w], ...)`` exactly.
    """
    if only_test_y_channel:
        raw, dst = _to_y(raw), _to_y(dst)
    hd = _highest_dtype()
    raw = raw.astype(hd)
    dst = dst.astype(hd)
    mask = _region_mask(valid_hw, raw.shape[1], raw.shape[2], crop_border, hd)[..., None]
    err = ((raw - dst) * 255.0) ** 2 * mask
    count = mask.sum(axis=(1, 2, 3)) * raw.shape[-1]
    mse = err.sum(axis=(1, 2, 3)) / count + 1e-8
    return 10.0 * jnp.log10(255.0**2 / mse)


@functools.partial(
    jax.jit, static_argnames=("crop_border", "only_test_y_channel", "window_size", "gaussian_sigma")
)
def ssim_tensor_padded(
    raw: jax.Array,
    dst: jax.Array,
    valid_hw: jax.Array,
    crop_border: int = 0,
    only_test_y_channel: bool = True,
    window_size: int = 11,
    gaussian_sigma: float = 1.5,
) -> jax.Array:
    """SSIM over the valid region of padded NHWC images (see
    ``psnr_tensor_padded``). A valid-conv window starting at row i covers
    rows [i, i + win); it lies inside the border-cropped valid region iff
    ``border <= i < h - border - win + 1`` — those map positions are
    exactly the unpadded kernel's outputs."""
    if only_test_y_channel:
        raw, dst = _to_y(raw), _to_y(dst)
    hd = _highest_dtype()
    raw = raw.astype(hd) * 255.0
    dst = dst.astype(hd) * 255.0

    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    window = jnp.asarray(gaussian_window(window_size, gaussian_sigma))

    mu_r = _valid_gauss_filter(raw, window)
    mu_d = _valid_gauss_filter(dst, window)
    mu_r2, mu_d2, mu_rd = mu_r * mu_r, mu_d * mu_d, mu_r * mu_d
    var_r = _valid_gauss_filter(raw * raw, window) - mu_r2
    var_d = _valid_gauss_filter(dst * dst, window) - mu_d2
    cov = _valid_gauss_filter(raw * dst, window) - mu_rd

    num = (2.0 * mu_rd + c1) * (2.0 * cov + c2)
    den = (mu_r2 + mu_d2 + c1) * (var_r + var_d + c2)
    ssim_map = num / den  # (N, H - win + 1, W - win + 1, C)

    win_hw = valid_hw - (window_size - 1)
    mask = _region_mask(win_hw, ssim_map.shape[1], ssim_map.shape[2], crop_border, hd)[..., None]
    count = mask.sum(axis=(1, 2, 3)) * ssim_map.shape[-1]
    return ((ssim_map * mask).sum(axis=(1, 2, 3)) / count).astype(jnp.float32)


class PSNR:
    """Drop-in analog of the reference torch ``PSNR`` module (NHWC inputs)."""

    def __init__(self, crop_border: int, only_test_y_channel: bool) -> None:
        self.crop_border = crop_border
        self.only_test_y_channel = only_test_y_channel

    def __call__(self, raw: jax.Array, dst: jax.Array) -> jax.Array:
        return psnr_tensor(raw, dst, self.crop_border, self.only_test_y_channel)


class SSIM:
    """Drop-in analog of the reference torch ``SSIM`` module (NHWC inputs)."""

    def __init__(
        self,
        crop_border: int,
        only_test_y_channel: bool,
        window_size: int = 11,
        gaussian_sigma: float = 1.5,
    ) -> None:
        self.crop_border = crop_border
        self.only_test_y_channel = only_test_y_channel
        self.window_size = window_size
        self.gaussian_sigma = gaussian_sigma

    def __call__(self, raw: jax.Array, dst: jax.Array) -> jax.Array:
        return ssim_tensor(
            raw, dst, self.crop_border, self.only_test_y_channel, self.window_size, self.gaussian_sigma
        )


# ---------------------------------------------------------------------------
# numpy-convention API (BGR [0,255] HWC single image), matching the
# reference's free functions used by the eval scripts.
# ---------------------------------------------------------------------------


def _expand_y(image: np.ndarray) -> np.ndarray:
    """BGR [0,255] -> Y-channel HWC in [0,255] float64 (imgproc.expand_y)."""
    x = jnp.asarray(image.astype(np.float32) / 255.0)
    y = color.bgr_to_ycbcr(x, only_use_y_channel=True)
    return np.asarray(y, dtype=np.float64) * 255.0


def psnr(raw_image: np.ndarray, dst_image: np.ndarray, crop_border: int, only_test_y_channel: bool) -> float:
    """BGR [0,255] HWC single-image PSNR (reference numpy convention —
    note 1e-8 is added to the log ratio here, not to the MSE)."""
    if crop_border > 0:
        raw_image = raw_image[crop_border:-crop_border, crop_border:-crop_border, ...]
        dst_image = dst_image[crop_border:-crop_border, crop_border:-crop_border, ...]
    if only_test_y_channel:
        raw_image = _expand_y(raw_image)
        dst_image = _expand_y(dst_image)
    raw = raw_image.astype(np.float64)
    dst = dst_image.astype(np.float64)
    return float(10.0 * np.log10(255.0**2 / np.mean((raw - dst) ** 2) + 1e-8))


def ssim(raw_image: np.ndarray, dst_image: np.ndarray, crop_border: int, only_test_y_channel: bool) -> float:
    """BGR [0,255] HWC single-image SSIM (reference numpy convention)."""
    if crop_border > 0:
        raw_image = raw_image[crop_border:-crop_border, crop_border:-crop_border, ...]
        dst_image = dst_image[crop_border:-crop_border, crop_border:-crop_border, ...]
    if only_test_y_channel:
        raw_image = _expand_y(raw_image)
        dst_image = _expand_y(dst_image)
    raw = jnp.asarray(raw_image.astype(np.float64))[None]
    dst = jnp.asarray(dst_image.astype(np.float64))[None]
    # Already in the x255 domain with Y/channels extracted; run the core.
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    window = jnp.asarray(gaussian_window())
    vals = []
    for ch in range(raw.shape[-1]):
        r = raw[..., ch : ch + 1]
        d = dst[..., ch : ch + 1]
        mu_r = _valid_gauss_filter(r, window)
        mu_d = _valid_gauss_filter(d, window)
        var_r = _valid_gauss_filter(r * r, window) - mu_r**2
        var_d = _valid_gauss_filter(d * d, window) - mu_d**2
        cov = _valid_gauss_filter(r * d, window) - mu_r * mu_d
        num = (2 * mu_r * mu_d + c1) * (2 * cov + c2)
        den = (mu_r**2 + mu_d**2 + c1) * (var_r + var_d + c2)
        vals.append(float(jnp.mean(num / den)))
    return float(np.mean(vals))
