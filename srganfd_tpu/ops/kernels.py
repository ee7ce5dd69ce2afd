"""Host-side blur-kernel synthesis (numpy) for the degradation pipelines.

These run on the host data-pipeline side (cheap, tiny arrays) and feed the
on-device degradation ops as padded ``(N, K, K)`` batches — the TPU-native
equivalent of the reference running them inside DataLoader workers.

Parity targets:
- BSRGAN iso/aniso Gaussians: ``BSRGAN/imgproc.py:160-208`` (MATLAB
  ``fspecial('gaussian')`` and the rotated-covariance pdf grid).
- Real-ESRGAN kernel family: bivariate iso/aniso Gaussian, generalized
  Gaussian, plateau, 2-D sinc via Bessel J1, and the ``random_mixed_kernels``
  dispatcher (``Real_ESRGAN/imgproc.py:228-606``).
"""

from __future__ import annotations

import numpy as np
from scipy import special

__all__ = [
    "fspecial_gaussian",
    "anisotropic_gaussian",
    "sample_bsrgan_blur_params",
    "build_bsrgan_blur_kernel",
    "bsrgan_random_blur_kernel",
    "bivariate_gaussian",
    "bivariate_generalized_gaussian",
    "bivariate_plateau",
    "sinc_kernel",
    "sample_mixed_kernel_params",
    "build_mixed_kernel",
    "random_mixed_kernel",
    "pad_kernel",
]


def fspecial_gaussian(size: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian', size, sigma)."""
    half = (size - 1) / 2.0
    y, x = np.mgrid[-half : half + 1, -half : half + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0.0
    s = h.sum()
    return h / s if s != 0 else h


def _rotated_sigma(theta: float, l1: float, l2: float) -> np.ndarray:
    """Covariance with principal axis at angle theta and eigenvalues l1/l2
    (the BSRGAN construction via the reflection matrix V)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    vmat = np.array([[v[0], v[1]], [v[1], -v[0]]])
    d = np.diag([l1, l2])
    return vmat @ d @ np.linalg.inv(vmat)


def anisotropic_gaussian(ksize: int, theta: float, l1: float, l2: float) -> np.ndarray:
    """BSRGAN anisotropic Gaussian: pdf of N(0, Sigma) sampled on the
    1-based-center grid (``BSRGAN/imgproc.py:185-208``)."""
    sigma = _rotated_sigma(theta, l1, l2)
    center = ksize / 2.0 + 0.5
    yy, xx = np.mgrid[1 : ksize + 1, 1 : ksize + 1]
    coords = np.stack([xx - center, yy - center], axis=-1).astype(np.float64)
    inv = np.linalg.inv(sigma)
    det = np.linalg.det(sigma)
    quad = np.einsum("...i,ij,...j->...", coords, inv, coords)
    k = np.exp(-0.5 * quad) / (2.0 * np.pi * np.sqrt(det))
    return k / k.sum()


def sample_bsrgan_blur_params(rng: np.random.Generator, upscale_factor: int) -> dict:
    """Sample the `_add_blur` decision set (``BSRGAN/imgproc.py:211-225``):
    50% anisotropic with eigenvalues U(0, 4+sf) and theta U(0, pi), else
    isotropic fspecial with sigma U(0, 2+0.2sf); ksize = 2*randint(2,11)+3
    in both cases. Exposed separately from the kernel build so the
    decision distributions are directly comparable against the executed
    reference (tests/test_plan_distributions.py)."""
    wd = 2.0 + 0.2 * upscale_factor
    wd2 = 4.0 + upscale_factor
    ksize = 2 * int(rng.integers(2, 12)) + 3  # randint(2,11) inclusive
    if rng.random() < 0.5:
        return {
            "kind": "aniso",
            "ksize": ksize,
            "theta": rng.random() * np.pi,
            "l1": wd2 * rng.random(),
            "l2": wd2 * rng.random(),
        }
    return {"kind": "iso", "ksize": ksize, "sigma": wd * rng.random()}


def build_bsrgan_blur_kernel(p: dict) -> np.ndarray:
    """Deterministic kernel build from :func:`sample_bsrgan_blur_params`."""
    if p["kind"] == "aniso":
        return anisotropic_gaussian(p["ksize"], p["theta"], p["l1"], p["l2"])
    return fspecial_gaussian(p["ksize"], p["sigma"])


def bsrgan_random_blur_kernel(rng: np.random.Generator, upscale_factor: int) -> np.ndarray:
    """One random blur kernel with the `_add_blur` distribution
    (``BSRGAN/imgproc.py:211-225``)."""
    return build_bsrgan_blur_kernel(sample_bsrgan_blur_params(rng, upscale_factor))


# --- Real-ESRGAN kernel family ----------------------------------------------


def _mesh_grid(size: int) -> np.ndarray:
    half = (size - 1) / 2.0
    y, x = np.mgrid[-half : half + 1, -half : half + 1]
    return np.stack([x, y], axis=-1)


def _sigma_matrix(sigma_x: float, sigma_y: float, theta: float) -> np.ndarray:
    d = np.array([[sigma_x**2, 0.0], [0.0, sigma_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def bivariate_gaussian(
    size: int, sigma_x: float, sigma_y: float | None = None, theta: float = 0.0
) -> np.ndarray:
    """Iso (sigma_y=None) or anisotropic bivariate Gaussian, normalized."""
    sigma_y = sigma_x if sigma_y is None else sigma_y
    inv = np.linalg.inv(_sigma_matrix(sigma_x, sigma_y, theta))
    xy = _mesh_grid(size)
    quad = np.einsum("...i,ij,...j->...", xy, inv, xy)
    k = np.exp(-0.5 * quad)
    return k / k.sum()


def bivariate_generalized_gaussian(
    size: int, sigma_x: float, sigma_y: float | None, theta: float, beta: float
) -> np.ndarray:
    """exp(-0.5 * (x^T S^-1 x)^beta), normalized (Real-ESRGAN family)."""
    sigma_y = sigma_x if sigma_y is None else sigma_y
    inv = np.linalg.inv(_sigma_matrix(sigma_x, sigma_y, theta))
    xy = _mesh_grid(size)
    quad = np.einsum("...i,ij,...j->...", xy, inv, xy)
    k = np.exp(-0.5 * np.power(quad, beta))
    return k / k.sum()


def bivariate_plateau(
    size: int, sigma_x: float, sigma_y: float | None, theta: float, beta: float
) -> np.ndarray:
    """1/(1 + (x^T S^-1 x)^beta), normalized (Real-ESRGAN family)."""
    sigma_y = sigma_x if sigma_y is None else sigma_y
    inv = np.linalg.inv(_sigma_matrix(sigma_x, sigma_y, theta))
    xy = _mesh_grid(size)
    quad = np.einsum("...i,ij,...j->...", xy, inv, xy)
    k = np.reciprocal(np.power(quad, beta) + 1.0)
    return k / k.sum()


def sinc_kernel(cutoff: float, size: int, pad_to: int = 0) -> np.ndarray:
    """2-D circular low-pass (sinc) filter via Bessel J1
    (``Real_ESRGAN/imgproc.py:579-606``): k(r) = cutoff * J1(cutoff*r) /
    (2 pi r), with the r=0 limit cutoff^2/(4 pi)."""
    assert size % 2 == 1
    half = (size - 1) / 2.0
    y, x = np.mgrid[-half : half + 1, -half : half + 1]
    r = np.hypot(x, y)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * special.j1(cutoff * r) / (2.0 * np.pi * r)
    k[size // 2, size // 2] = cutoff**2 / (4.0 * np.pi)
    k = k / k.sum()
    if pad_to > size:
        p = (pad_to - size) // 2
        k = np.pad(k, ((p, p), (p, p)))
    return k


def _mixture_beta(rng: np.random.Generator, beta_range: tuple[float, float]) -> float:
    """The reference's beta draw (``Real_ESRGAN/imgproc.py:414-417,
    473-476``) is a 50/50 MIXTURE of U(beta_min, 1) and U(1, beta_max) —
    NOT flat-uniform over the range. For the config's generalized range
    (0.5, 4) flat sampling would put only 1/7 of the mass below 1 instead
    of half; for the plateau range (1, 2) the reference's lower piece
    degenerates to exactly beta=1 for half the draws."""
    if rng.random() < 0.5:
        return float(rng.uniform(beta_range[0], 1.0))
    return float(rng.uniform(1.0, beta_range[1]))


def sample_mixed_kernel_params(
    rng: np.random.Generator,
    kernel_size: int,
    kernel_types: tuple[str, ...],
    kernel_probs: tuple[float, ...],
    sigma_range: tuple[float, float],
    beta_g_range: tuple[float, float],
    beta_p_range: tuple[float, float],
) -> dict:
    """Sample the ``random_mixed_kernels`` decision set
    (``Real_ESRGAN/imgproc.py:495-576``): kernel family by probability,
    sigmas/rotation uniform, beta via the reference's two-piece mixture."""
    kind = rng.choice(len(kernel_types), p=np.asarray(kernel_probs) / np.sum(kernel_probs))
    kind = kernel_types[int(kind)]
    p = {
        "kind": kind,
        "ksize": kernel_size,
        "sigma_x": float(rng.uniform(*sigma_range)),
        "sigma_y": float(rng.uniform(*sigma_range)),
        "theta": float(rng.uniform(-np.pi, np.pi)),
    }
    if kind.startswith("generalized"):
        p["beta"] = _mixture_beta(rng, beta_g_range)
    elif kind.startswith("plateau"):
        p["beta"] = _mixture_beta(rng, beta_p_range)
    return p


def build_mixed_kernel(p: dict) -> np.ndarray:
    """Deterministic kernel build from :func:`sample_mixed_kernel_params`.
    Isotropic families use sigma_x only (the reference never consumes
    sigma_y/theta on those branches — ``Real_ESRGAN/imgproc.py:362-364``)."""
    kind, size, sx = p["kind"], p["ksize"], p["sigma_x"]
    if kind == "isotropic":
        return bivariate_gaussian(size, sx)
    if kind == "anisotropic":
        return bivariate_gaussian(size, sx, p["sigma_y"], p["theta"])
    if kind == "generalized_isotropic":
        return bivariate_generalized_gaussian(size, sx, None, 0.0, p["beta"])
    if kind == "generalized_anisotropic":
        return bivariate_generalized_gaussian(size, sx, p["sigma_y"], p["theta"], p["beta"])
    if kind == "plateau_isotropic":
        return bivariate_plateau(size, sx, None, 0.0, p["beta"])
    if kind == "plateau_anisotropic":
        return bivariate_plateau(size, sx, p["sigma_y"], p["theta"], p["beta"])
    raise ValueError(f"unknown kernel type {kind}")


def random_mixed_kernel(
    rng: np.random.Generator,
    kernel_size: int,
    kernel_types: tuple[str, ...],
    kernel_probs: tuple[float, ...],
    sigma_range: tuple[float, float],
    beta_g_range: tuple[float, float],
    beta_p_range: tuple[float, float],
) -> np.ndarray:
    """Real-ESRGAN ``random_mixed_kernels`` dispatcher
    (``Real_ESRGAN/imgproc.py:495-576``)."""
    return build_mixed_kernel(
        sample_mixed_kernel_params(
            rng, kernel_size, kernel_types, kernel_probs,
            sigma_range, beta_g_range, beta_p_range,
        )
    )


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Sub-pixel shift by (sf-1)/2 via bilinear resampling with edge clamp
    (``BSRGAN/imgproc.py:137-157``; used to center blur kernels before
    strided downsampling in the chain's disabled op-2 branch — provided
    for surface completeness and re-enabling that branch)."""
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    sign = 1.0 if upper_left else -1.0
    xs = np.clip(np.arange(w) + sign * shift, 0, w - 1)
    ys = np.clip(np.arange(h) + sign * shift, 0, h - 1)
    x0 = np.floor(xs).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y0 = np.floor(ys).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (xs - x0)[None, :]
    fy = (ys - y0)[:, None]
    arr = x.astype(np.float64)
    if arr.ndim == 2:
        arr = arr[..., None]
    out = (
        arr[np.ix_(y0, x0)] * (1 - fy)[..., None] * (1 - fx)[..., None]
        + arr[np.ix_(y0, x1)] * (1 - fy)[..., None] * fx[..., None]
        + arr[np.ix_(y1, x0)] * fy[..., None] * (1 - fx)[..., None]
        + arr[np.ix_(y1, x1)] * fy[..., None] * fx[..., None]
    )
    return out[..., 0] if x.ndim == 2 else out


def pad_kernel(k: np.ndarray, size: int) -> np.ndarray:
    """Center-pad an odd-sized kernel to ``size`` x ``size`` (zero fill) so
    batches of mixed-size kernels have a static shape for the device op."""
    p = (size - k.shape[0]) // 2
    if p < 0:
        raise ValueError(f"kernel {k.shape} larger than pad target {size}")
    return np.pad(k, ((p, size - k.shape[0] - p), (p, size - k.shape[1] - p)))
