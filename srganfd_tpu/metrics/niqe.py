"""NIQE (Natural Image Quality Evaluator), no-reference metric.

Parity target: the reference's numpy/torch NIQE
(``ESRGAN/image_quality_assessment.py:169-344`` numpy;
``:944-1366`` torch): MSCN coefficients, AGGD fits over a 9801-point
gamma grid, 96x96 block features at two scales, MVG fit + Mahalanobis
distance against a pristine-corpus model loaded from ``niqe_model.mat``.

The reference's ``.mat`` file is not distributable; this module can load
one when present (``scipy.io.loadmat``) and additionally provides
``fit_niqe_model`` to build a pristine model from any image directory —
a capability the reference lacks.

Implementation is vectorized numpy (eval-path metric, not the training
hot loop); images are BGR [0,255] HWC like the reference's numpy API.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.special import gamma as gamma_fn

from srganfd_tpu.ops.resize import matlab_resize_plan

__all__ = ["niqe", "fit_niqe_model", "load_niqe_model", "save_niqe_model", "NiqeModel"]

_GAMMA_GRID = np.arange(0.2, 10.001, 0.001)
_R_GAM = (gamma_fn(2.0 / _GAMMA_GRID) ** 2) / (
    gamma_fn(1.0 / _GAMMA_GRID) * gamma_fn(3.0 / _GAMMA_GRID)
)


class NiqeModel:
    def __init__(self, mu: np.ndarray, cov: np.ndarray) -> None:
        self.mu = np.asarray(mu, np.float64).reshape(-1)
        self.cov = np.asarray(cov, np.float64)


def _estimate_aggd(vec: np.ndarray) -> tuple[float, float, float]:
    """Asymmetric generalized Gaussian fit -> (alpha, beta_l, beta_r)
    (moment matching over the gamma grid, as the reference
    ``_estimate_aggd_parameters``)."""
    vec = vec.flatten()
    left = vec[vec < 0]
    right = vec[vec > 0]
    left_std = np.sqrt(np.mean(left**2)) if left.size else 0.0
    right_std = np.sqrt(np.mean(right**2)) if right.size else 0.0
    gammahat = left_std / right_std if right_std > 0 else np.inf
    rhat = (np.mean(np.abs(vec)) ** 2) / np.mean(vec**2) if np.mean(vec**2) > 0 else 0.0
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / ((gammahat**2 + 1) ** 2)
    idx = int(np.argmin((_R_GAM - rhatnorm) ** 2))
    alpha = _GAMMA_GRID[idx]
    beta_l = left_std * np.sqrt(gamma_fn(1.0 / alpha) / gamma_fn(3.0 / alpha))
    beta_r = right_std * np.sqrt(gamma_fn(1.0 / alpha) / gamma_fn(3.0 / alpha))
    return float(alpha), float(beta_l), float(beta_r)


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    half = (size - 1) / 2.0
    y, x = np.mgrid[-half : half + 1, -half : half + 1]
    w = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    return w / w.sum()


def _mscn(image: np.ndarray) -> np.ndarray:
    w = _gaussian_window()
    mu = ndimage.convolve(image, w, mode="nearest")
    sigma = np.sqrt(np.abs(ndimage.convolve(image * image, w, mode="nearest") - mu * mu))
    return (image - mu) / (sigma + 1.0)


def _block_features(mscn: np.ndarray) -> np.ndarray:
    """18 features: AGGD of MSCN (alpha, mean-of-betas) + 4 directional
    products x (alpha, mean, beta_l, beta_r)."""
    feats = []
    alpha, bl, br = _estimate_aggd(mscn)
    feats += [alpha, (bl + br) / 2.0]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for dy, dx in shifts:
        shifted = np.roll(np.roll(mscn, dy, axis=0), dx, axis=1)
        pair = (mscn * shifted).flatten()
        alpha, bl, br = _estimate_aggd(pair)
        mean = (br - bl) * (gamma_fn(2.0 / alpha) / gamma_fn(1.0 / alpha))
        feats += [alpha, mean, bl, br]
    return np.asarray(feats, np.float64)


def _matlab_downscale_half(image: np.ndarray) -> np.ndarray:
    """MATLAB-faithful bicubic half-downscale (the reference uses its
    torch imresize for this, ``image_quality_assessment.py:1059-1135``)."""
    h, w = image.shape
    wh, ih = matlab_resize_plan(h, -(-h // 2), True, 0.5)
    ww, iw = matlab_resize_plan(w, -(-w // 2), True, 0.5)
    rows = (image[ih] * wh[:, :, None]).sum(axis=1)
    cols = (rows[:, iw] * ww[None, :, :]).sum(axis=2)
    return cols


def _image_features(y: np.ndarray, block_h: int = 96, block_w: int = 96) -> np.ndarray:
    """Per-block 36-dim features over two scales (reference niqe wrapper
    ``image_quality_assessment.py:301-344``)."""
    h, w = y.shape
    nbh, nbw = h // block_h, w // block_w
    y = y[: nbh * block_h, : nbw * block_w]
    scale_feats = []
    img = y.astype(np.float64)
    for scale in (1, 2):
        mscn = _mscn(img)
        bh, bw = block_h // scale, block_w // scale
        feats = [
            _block_features(mscn[i * bh : (i + 1) * bh, j * bw : (j + 1) * bw])
            for i in range(nbh)
            for j in range(nbw)
        ]
        scale_feats.append(np.asarray(feats))
        if scale == 1:
            img = _matlab_downscale_half(img)
    return np.concatenate(scale_feats, axis=1)  # (num_blocks, 36)


def _nancov(x: np.ndarray) -> np.ndarray:
    ok = ~np.isnan(x).any(axis=1)
    return np.cov(x[ok], rowvar=False)


def _y_channel(image: np.ndarray, convention: str) -> np.ndarray:
    """BGR [0,255] HWC (or pre-extracted Y HW) -> float64 luminance.

    Two reference conventions, which differ in rounding (an additive
    offset between them cancels exactly in the MSCN transform):

    - ``"torch"`` — the torch ``NIQE`` module
      (``ESRGAN/image_quality_assessment.py:1320-1326``): Y in [16, 235]
      rounded to integer luminance.
    - ``"numpy"`` — the numpy ``niqe`` function (``:301-344`` via
      ``imgproc.bgr_to_ycbcr``): ``(dot(image, coefs) + 16) / 255``
      computed on the [0,255] image, float32-quantized, NOT rounded.
    """
    if image.ndim != 3:
        return image.astype(np.float64)
    if convention == "numpy":
        y = image.astype(np.float64) @ np.array([24.966, 128.553, 65.481]) + 16.0
        return (y / 255.0).astype(np.float32).astype(np.float64)
    from srganfd_tpu.ops import color
    import jax.numpy as jnp

    y = np.asarray(
        color.bgr_to_ycbcr(jnp.asarray(image.astype(np.float32) / 255.0), True)
    )[..., 0] * 255.0
    return np.round(y).astype(np.float64)


def niqe(
    image: np.ndarray,
    model: NiqeModel,
    crop_border: int = 0,
    convention: str = "torch",
) -> float:
    """BGR [0,255] HWC (or already-Y HW) -> NIQE score (lower = better)."""
    y = _y_channel(image, convention)
    if crop_border > 0:
        y = y[crop_border:-crop_border, crop_border:-crop_border]

    feats = _image_features(y)
    mu_dist = np.nanmean(feats, axis=0)
    cov_dist = _nancov(feats)
    cov_pinv = np.linalg.pinv((model.cov + cov_dist) / 2.0)
    d = model.mu - mu_dist
    return float(np.sqrt(d @ cov_pinv @ d))


def load_niqe_model(path: str) -> NiqeModel:
    """Load a pristine model: the reference's ``niqe_model.mat``
    (``image_quality_assessment.py:1285-1333``) or the .npz layout its
    numpy ``niqe`` consumes (``:330-335``)."""
    if path.endswith(".npz"):
        data = np.load(path)
    else:
        from scipy.io import loadmat

        data = loadmat(path)
    # known key layouts across niqe model distributions
    for mu_key, cov_key in (
        ("mu_prisparam", "cov_prisparam"),
        ("mu_pris_param", "cov_pris_param"),
        ("pop_mu", "pop_cov"),
    ):
        if mu_key in data:
            return NiqeModel(data[mu_key], data[cov_key])
    raise KeyError(f"unrecognized niqe model keys: {list(data)}")


def fit_niqe_model(images: list[np.ndarray], convention: str = "torch") -> NiqeModel:
    """Fit a pristine MVG model from BGR [0,255] images (capability the
    reference lacks — it only consumes a prebuilt .mat). ``convention``
    must match the scoring convention the model will be used with."""
    all_feats = []
    for image in images:
        all_feats.append(_image_features(_y_channel(image, convention)))
    feats = np.concatenate(all_feats, axis=0)
    return NiqeModel(np.nanmean(feats, axis=0), _nancov(feats))


def save_niqe_model(model: NiqeModel, path: str) -> None:
    """Write the .npz layout the reference's numpy ``niqe`` consumes
    (``ESRGAN/image_quality_assessment.py:330-335``:
    mu_pris_param / cov_pris_param / gaussian_window)."""
    np.savez(
        path,
        mu_pris_param=model.mu,
        cov_pris_param=model.cov,
        gaussian_window=_gaussian_window(),
    )


def niqe_from_mat(
    image: np.ndarray, crop_border: int = 0, niqe_model_path: str = ""
) -> float:
    """Reference-signature convenience wrapper
    (``ESRGAN/image_quality_assessment.py:301-344``): BGR [0,255] image +
    pristine-model path -> NIQE score."""
    return niqe(image, load_niqe_model(niqe_model_path), crop_border)
