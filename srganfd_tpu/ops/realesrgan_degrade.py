"""Real-ESRGAN second-order degradation as an on-device XLA pipeline.

Parity target: ``degradation_process`` in ``Real_ESRGAN/imgproc.py:2323-2462``
(the per-batch on-GPU chain) plus ``USMSharp`` (:1517-1540):

  1st order: blur(k1) -> random resize (up/down/keep, random mode)
             -> Gaussian|Poisson noise (gray prob) -> JPEG
  2nd order: [blur(k2) w/ prob] -> random resize (relative to out size)
             -> noise -> {resize-to-final + sinc + JPEG | JPEG +
             resize-to-final + sinc}  -> quantize (round/255)

Design: per-batch randomness is sampled on the host into a
``RealEsrganPlan``; the chain is jitted per (size1, size2) pair. Random
resize targets are snapped to multiples of 8 to bound the number of
compiled variants (the reference's ``int(h*scale)`` is already an
arbitrary truncation of the sampled scale, so snapping stays inside the
sampled distribution's support).

Kernel synthesis (k1/k2/sinc incl. the pulse fallback) lives in the data
pipeline, matching ``Real_ESRGAN/dataset.py:34-150``; see
``sample_kernel_triple``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops import filters, kernels
from srganfd_tpu.ops.degrade import add_gaussian_noise, add_poisson_noise
from srganfd_tpu.ops.jpeg import diff_jpeg
from srganfd_tpu.ops.resize import cv2_style_resize

__all__ = [
    "RealEsrganPlan",
    "sample_kernel_triple_params",
    "build_kernel_triple",
    "sample_kernel_triple",
    "plan_realesrgan_batch",
    "apply_realesrgan_batch",
    "usm_sharp",
]


def sample_kernel_triple_params(rng: np.random.Generator, p: dict) -> dict:
    """Sample the per-sample kernel-synthesis decisions
    (``Real_ESRGAN/dataset.py:55-133``): random odd size from
    ``gaussian_kernel_range``; sinc with probability (omega's lower bound
    pi/3 below the range's MEDIAN size, pi/5 at or above it —
    ``dataset.py:68``) else mixed-Gaussian; final sinc kernel at a fresh
    random size with prob ``sinc_kernel_probability3`` else None
    (identity pulse)."""
    krange = list(p["gaussian_kernel_range"])
    median = int(np.median(krange))

    def one(stage: int) -> dict:
        size = int(rng.choice(krange))
        if rng.random() < p[f"sinc_kernel_probability{stage}"]:
            omega = rng.uniform(np.pi / 3 if size < median else np.pi / 5, np.pi)
            return {"size": size, "sinc": True, "omega": float(omega)}
        return {
            "size": size,
            "sinc": False,
            "mixed": kernels.sample_mixed_kernel_params(
                rng,
                size,
                tuple(p["gaussian_kernel_type"]),
                tuple(p[f"gaussian_kernel_probability{stage}"]),
                tuple(p[f"gaussian_sigma_range{stage}"]),
                tuple(p[f"generalized_kernel_beta_range{stage}"]),
                tuple(p[f"plateau_kernel_beta_range{stage}"]),
            ),
        }

    out = {"k1": one(1), "k2": one(2), "sinc3": None}
    if rng.random() < p["sinc_kernel_probability3"]:
        out["sinc3"] = {
            "size": int(rng.choice(krange)),
            "omega": float(rng.uniform(np.pi / 3, np.pi)),
        }
    return out


def build_kernel_triple(
    params: dict, pad: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic build from :func:`sample_kernel_triple_params`; all
    kernels center-padded to ``pad`` x ``pad``."""

    def one(d: dict) -> np.ndarray:
        if d["sinc"]:
            k = kernels.sinc_kernel(d["omega"], d["size"])
        else:
            k = kernels.build_mixed_kernel(d["mixed"])
        return kernels.pad_kernel(k, pad).astype(np.float32)

    k1 = one(params["k1"])
    k2 = one(params["k2"])
    if params["sinc3"] is not None:
        # the reference synthesizes the final sinc at a RANDOM odd size and
        # pads it to sinc_kernel_size (``dataset.py:120-126``) — a size-7
        # truncated sinc padded to 21 is a different filter than a size-21
        # sinc, so the size draw is part of the distribution
        sinc = kernels.sinc_kernel(
            params["sinc3"]["omega"], params["sinc3"]["size"], pad_to=pad
        ).astype(np.float32)
    else:
        sinc = np.zeros((pad, pad), np.float32)
        sinc[pad // 2, pad // 2] = 1.0
    return k1, k2, sinc


def sample_kernel_triple(
    rng: np.random.Generator, p: dict
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-sample (kernel1, kernel2, sinc_kernel) with the reference's
    distributions (``Real_ESRGAN/dataset.py:55-133``), padded to
    ``sinc_kernel_size``."""
    return build_kernel_triple(
        sample_kernel_triple_params(rng, p), int(p["sinc_kernel_size"])
    )


def _snap(v: float, lo: int = 16) -> int:
    return max(lo, int(round(v / 8.0)) * 8)


@dataclasses.dataclass(frozen=True)
class RealEsrganPlan:
    size1: tuple[int, int]
    interp1: int
    size2: tuple[int, int]
    interp2: int
    final_size: tuple[int, int]
    final_interp: int
    second_blur: bool
    jpeg_first_in_stage2: bool
    # per-sample operands
    noise1_sigma: np.ndarray
    noise1_poisson_scale: np.ndarray
    noise1_is_poisson: np.ndarray
    noise1_gray: np.ndarray
    jpeg1_quality: np.ndarray
    noise2_sigma: np.ndarray
    noise2_poisson_scale: np.ndarray
    noise2_is_poisson: np.ndarray
    noise2_gray: np.ndarray
    jpeg2_quality: np.ndarray
    # raw sampled resize decisions before target-size snapping, kept for
    # distributional verification (tests/test_plan_distributions.py):
    # updown in {0: up, 1: down, 2: keep}
    updown1: int = 2
    scale1: float = 1.0
    updown2: int = 2
    scale2: float = 1.0


def plan_realesrgan_batch(
    rng: np.random.Generator,
    batch_size: int,
    gt_size: tuple[int, int],
    upscale_factor: int,
    p: dict,
) -> RealEsrganPlan:
    """Sample the per-batch chain decisions (host side), mirroring
    ``Real_ESRGAN/imgproc.py:2323-2462``'s per-batch draws."""
    h, w = gt_size

    def pick_scale(probs, rng_range):
        kind = int(rng.choice(3, p=np.asarray(probs) / np.sum(probs)))
        if kind == 0:  # up
            return kind, float(rng.uniform(1.0, rng_range[1]))
        if kind == 1:  # down
            return kind, float(rng.uniform(rng_range[0], 1.0))
        return kind, 1.0

    ud1, s1 = pick_scale(p["resize_probability1"], p["resize_range1"])
    size1 = (_snap(h * s1), _snap(w * s1))
    ud2, s2 = pick_scale(p["resize_probability2"], p["resize_range2"])
    out_h, out_w = h // upscale_factor, w // upscale_factor
    size2 = (_snap(out_h * upscale_factor * s2), _snap(out_w * upscale_factor * s2))

    def noise_stage(stage: int):
        nr = p[f"noise_range{stage}"]
        ps = p[f"poisson_scale_range{stage}"]
        sigma = rng.uniform(nr[0], nr[1], batch_size).astype(np.float32) / 255.0
        pscale = rng.uniform(ps[0], ps[1], batch_size).astype(np.float32)
        is_poisson = (rng.random(batch_size) >= p[f"gaussian_noise_probability{stage}"]).astype(
            np.float32
        )
        gray = (rng.random(batch_size) < p[f"gray_noise_probability{stage}"]).astype(np.float32)
        return sigma, pscale, is_poisson, gray

    n1 = noise_stage(1)
    n2 = noise_stage(2)
    jq1 = rng.uniform(*p["jpeg_range1"], size=batch_size).astype(np.float32)
    jq2 = rng.uniform(*p["jpeg_range2"], size=batch_size).astype(np.float32)

    return RealEsrganPlan(
        size1=size1,
        interp1=int(rng.choice([1, 2, 3])),
        size2=size2,
        interp2=int(rng.choice([1, 2, 3])),
        final_size=(out_h, out_w),
        final_interp=int(rng.choice([1, 2, 3])),
        second_blur=bool(rng.random() < p["second_blur_probability"]),
        jpeg_first_in_stage2=bool(rng.random() < 0.5),
        noise1_sigma=n1[0],
        noise1_poisson_scale=n1[1],
        noise1_is_poisson=n1[2],
        noise1_gray=n1[3],
        jpeg1_quality=jq1,
        noise2_sigma=n2[0],
        noise2_poisson_scale=n2[1],
        noise2_is_poisson=n2[2],
        noise2_gray=n2[3],
        jpeg2_quality=jq2,
        updown1=ud1,
        scale1=s1,
        updown2=ud2,
        scale2=s2,
    )


def _noise(x, key, sigma, pscale, is_poisson, gray):
    kg, kp = jax.random.split(key)
    gauss = add_gaussian_noise(x, kg, sigma, gray)
    poisson = add_poisson_noise(x, kp, pscale, gray)
    m = is_poisson[:, None, None, None]
    return m * poisson + (1.0 - m) * gauss


def _jpeg16(x, quality):
    h, w = x.shape[1], x.shape[2]
    ph, pw = (-h) % 16, (-w) % 16
    xp = x
    if ph or pw:
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    out = diff_jpeg(xp, jnp.maximum(quality, 1.0), differentiable=False)[:, :h, :w, :]
    # quality<=0 = per-sample skip sentinel (forced-decision chain goldens;
    # production qualities are drawn from jpeg_range >= 30)
    m = (quality > 0.0).astype(x.dtype)[:, None, None, None]
    return m * out + (1.0 - m) * x


@functools.partial(
    jax.jit,
    static_argnames=(
        "size1",
        "interp1",
        "size2",
        "interp2",
        "final_size",
        "final_interp",
        "second_blur",
        "jpeg_first_in_stage2",
    ),
)
def _apply(
    gt,
    k1,
    k2,
    sinc,
    key,
    size1,
    interp1,
    size2,
    interp2,
    final_size,
    final_interp,
    second_blur,
    jpeg_first_in_stage2,
    noise1_sigma,
    noise1_poisson_scale,
    noise1_is_poisson,
    noise1_gray,
    jpeg1_quality,
    noise2_sigma,
    noise2_poisson_scale,
    noise2_is_poisson,
    noise2_gray,
    jpeg2_quality,
):
    key1, key2 = jax.random.split(key)
    x = gt.astype(jnp.float32)

    # ---- first order
    x = filters.filter2d(x, k1)
    x = cv2_style_resize(x, size1, interp1)
    x = jnp.clip(x, 0.0, 1.0)
    x = _noise(x, key1, noise1_sigma, noise1_poisson_scale, noise1_is_poisson, noise1_gray)
    x = _jpeg16(jnp.clip(x, 0.0, 1.0), jpeg1_quality)

    # ---- second order
    if second_blur:
        x = filters.filter2d(x, k2)
    x = cv2_style_resize(x, size2, interp2)
    x = jnp.clip(x, 0.0, 1.0)
    x = _noise(x, key2, noise2_sigma, noise2_poisson_scale, noise2_is_poisson, noise2_gray)
    x = jnp.clip(x, 0.0, 1.0)

    if jpeg_first_in_stage2:
        x = _jpeg16(x, jpeg2_quality)
        x = cv2_style_resize(x, final_size, final_interp)
        x = filters.filter2d(x, sinc)
    else:
        x = cv2_style_resize(x, final_size, final_interp)
        x = filters.filter2d(x, sinc)
        x = _jpeg16(jnp.clip(x, 0.0, 1.0), jpeg2_quality)

    # final quantization to 8-bit levels (imgproc.py:2455-2460)
    return jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0, 0.0, 1.0)


def apply_realesrgan_batch(
    gt: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    sinc: jax.Array,
    key: jax.Array,
    plan: RealEsrganPlan,
) -> jax.Array:
    """Run the second-order chain. gt: (N,H,W,3) [0,1]; k1/k2/sinc:
    (N,21,21) per-sample kernels. Returns LR (N, H/sf, W/sf, 3)."""
    return _apply(
        gt,
        k1,
        k2,
        sinc,
        key,
        plan.size1,
        plan.interp1,
        plan.size2,
        plan.interp2,
        plan.final_size,
        plan.final_interp,
        plan.second_blur,
        plan.jpeg_first_in_stage2,
        jnp.asarray(plan.noise1_sigma),
        jnp.asarray(plan.noise1_poisson_scale),
        jnp.asarray(plan.noise1_is_poisson),
        jnp.asarray(plan.noise1_gray),
        jnp.asarray(plan.jpeg1_quality),
        jnp.asarray(plan.noise2_sigma),
        jnp.asarray(plan.noise2_poisson_scale),
        jnp.asarray(plan.noise2_is_poisson),
        jnp.asarray(plan.noise2_gray),
        jnp.asarray(plan.jpeg2_quality),
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def usm_sharp(
    images: jax.Array, weight: float = 0.5, radius: int = 51, threshold: float = 10.0
) -> jax.Array:
    """Unsharp masking (``Real_ESRGAN/imgproc.py:1517-1540``): Gaussian
    blur residual, soft threshold mask, blend. ``radius`` must be odd
    (cv2.GaussianBlur sigma derived from kernel size: 0.3*((k-1)*0.5-1)+0.8)."""
    sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8
    k1d = np.exp(-0.5 * ((np.arange(radius) - (radius - 1) / 2.0) / sigma) ** 2)
    k1d /= k1d.sum()
    # the outer-product Gaussian is exactly separable: two shared banded
    # GEMMs instead of K per-sample banded GEMMs (14.2 -> ~1 ms at
    # (12,256,256,3) K=51 on v5e; fp summation order is the only change)
    k1d_j = jnp.asarray(k1d.astype(np.float32))
    blur = filters.blur_separable(images, k1d_j)
    residual = images - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(images.dtype)
    soft_mask = filters.blur_separable(mask, k1d_j)
    sharp = jnp.clip(images + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * images


@functools.partial(
    jax.jit,
    static_argnames=(
        "size1",
        "interp1",
        "size2",
        "interp2",
        "final_size",
        "final_interp",
        "second_blur",
        "jpeg_first_in_stage2",
        "gt_size",
        "crop_upscale",
    ),
)
def _apply_train(
    gt_raw,
    k1,
    k2,
    sinc,
    key,
    tops,
    lefts,
    hflips,
    vflips,
    rots,
    size1,
    interp1,
    size2,
    interp2,
    final_size,
    final_interp,
    second_blur,
    jpeg_first_in_stage2,
    noise1_sigma,
    noise1_poisson_scale,
    noise1_is_poisson,
    noise1_gray,
    jpeg1_quality,
    noise2_sigma,
    noise2_poisson_scale,
    noise2_is_poisson,
    noise2_gray,
    jpeg2_quality,
    gt_size,
    crop_upscale,
):
    from srganfd_tpu.ops import augment

    gt = gt_raw.astype(jnp.float32)
    if np.issubdtype(np.dtype(gt_raw.dtype), np.integer):
        gt = gt / 255.0  # uint8 transport: normalization folded on-device
    gt_usm = usm_sharp(gt)
    lr = _apply(
        gt_usm,
        k1,
        k2,
        sinc,
        key,
        size1,
        interp1,
        size2,
        interp2,
        final_size,
        final_interp,
        second_blur,
        jpeg_first_in_stage2,
        noise1_sigma,
        noise1_poisson_scale,
        noise1_is_poisson,
        noise1_gray,
        jpeg1_quality,
        noise2_sigma,
        noise2_poisson_scale,
        noise2_is_poisson,
        noise2_gray,
        jpeg2_quality,
    )
    gt_c, lr_c = augment.paired_random_crop(gt, lr, tops, lefts, gt_size, crop_upscale)
    usm_c, _ = augment.paired_random_crop(gt_usm, lr, tops, lefts, gt_size, crop_upscale)
    usm_c, _ = augment.paired_flip_rotate(usm_c, lr_c, hflips, vflips, rots)
    gt_c, lr_c = augment.paired_flip_rotate(gt_c, lr_c, hflips, vflips, rots)
    return gt_c, usm_c, lr_c


def apply_realesrgan_train_batch(
    gt_raw,
    k1,
    k2,
    sinc,
    key,
    plan: RealEsrganPlan,
    tops,
    lefts,
    hflips,
    vflips,
    rots,
    gt_size: int,
    upscale_factor: int,
):
    """USM + second-order chain + aligned crops + paired flips/rotation as
    ONE jitted program (one dispatch per step; see
    ``degrade.apply_bsrgan_batch_cropped`` for why). Accepts uint8 or
    float GT batches. Returns (gt_crop, gt_usm_crop, lr_crop)."""
    return _apply_train(
        gt_raw,
        k1,
        k2,
        sinc,
        key,
        jnp.asarray(tops),
        jnp.asarray(lefts),
        jnp.asarray(hflips, jnp.float32),
        jnp.asarray(vflips, jnp.float32),
        jnp.asarray(rots, jnp.float32),
        plan.size1,
        plan.interp1,
        plan.size2,
        plan.interp2,
        plan.final_size,
        plan.final_interp,
        plan.second_blur,
        plan.jpeg_first_in_stage2,
        jnp.asarray(plan.noise1_sigma),
        jnp.asarray(plan.noise1_poisson_scale),
        jnp.asarray(plan.noise1_is_poisson),
        jnp.asarray(plan.noise1_gray),
        jnp.asarray(plan.jpeg1_quality),
        jnp.asarray(plan.noise2_sigma),
        jnp.asarray(plan.noise2_poisson_scale),
        jnp.asarray(plan.noise2_is_poisson),
        jnp.asarray(plan.noise2_gray),
        jnp.asarray(plan.jpeg2_quality),
        gt_size,
        upscale_factor,
    )
