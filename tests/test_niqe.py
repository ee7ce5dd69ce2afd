"""NIQE behavior tests: with no distributable pristine .mat, we fit a
model on clean synthetic images and check the metric orders degraded
images correctly (the reference can only consume a prebuilt .mat;
fit_niqe_model is a framework addition)."""

import numpy as np
import pytest

from srganfd_tpu.metrics import niqe as niqe_mod


def _textured(rng, size=224):
    # smooth base + multiscale texture: natural-ish statistics
    base = rng.uniform(0, 1, (size // 8, size // 8, 3))
    import cv2

    img = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    img = img + 0.1 * rng.normal(size=(size, size, 3))
    return (np.clip(img, 0, 1) * 255).astype(np.float64)


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(0)
    return niqe_mod.fit_niqe_model([_textured(rng) for _ in range(6)])


def test_niqe_finite(model):
    rng = np.random.default_rng(1)
    score = niqe_mod.niqe(_textured(rng), model)
    assert np.isfinite(score) and score >= 0


def test_niqe_prefers_clean_over_heavily_blurred(model):
    import cv2

    rng = np.random.default_rng(2)
    clean = _textured(rng)
    blurred = cv2.GaussianBlur(clean, (31, 31), 8.0)
    s_clean = niqe_mod.niqe(clean, model)
    s_blur = niqe_mod.niqe(blurred, model)
    assert s_blur > s_clean, (s_blur, s_clean)


@pytest.fixture(scope="module")
def full_goldens():
    return np.load(__file__.replace("test_niqe.py", "goldens/niqe_full.npz"))


def test_full_score_parity(full_goldens):
    """End-to-end NIQE score vs the REFERENCE's numpy niqe()
    (ESRGAN/image_quality_assessment.py:301-344) run with a model fitted
    by fit_niqe_model — clean, blurred, and crop-border cases.

    Tolerance 4e-6 relative: per-block features agree to 3e-7 (the
    scale-2 MATLAB half-downscale accumulates in a different float
    summation order than the reference's per-row mv() loops) and the
    Mahalanobis pinv amplifies that by ~5x."""
    g = full_goldens
    model = niqe_mod.NiqeModel(g["mu"], g["cov"])
    for img_key, score_key, crop in (
        ("test_img", "score_clean", 0),
        ("blur_img", "score_blur", 0),
        ("crop_img", "score_crop", 4),
    ):
        got = niqe_mod.niqe(g[img_key], model, crop_border=crop, convention="numpy")
        want = float(g[score_key])
        assert abs(got - want) <= 4e-6 * max(abs(want), 1.0), (img_key, got, want)


def test_fit_model_identity_vs_reference(full_goldens):
    """fit_niqe_model validated reference-side: the reference scored a
    model fitted on a single image at ~0 on that same image (features and
    MVG fit must agree for this to hold). Reproduce the fit and score here."""
    g = full_goldens
    assert float(g["score_solo"]) < 1e-3  # reference-computed at golden time
    model = niqe_mod.fit_niqe_model([g["solo_img"]], convention="numpy")
    got = niqe_mod.niqe(g["solo_img"], model, convention="numpy")
    assert got < 1e-3, got


def test_torch_convention_matches_reference_torch_module(full_goldens):
    """The default (torch-module) convention vs the reference's torch NIQE
    (ESRGAN/image_quality_assessment.py:1285-1366) loading the same model
    from .mat. Looser tolerance: the torch twin's internals (its own
    imresize/AGGD) differ from the numpy path at float epsilon."""
    from scipy.io import savemat

    g = full_goldens
    bgr = g["test_img"]
    want = float(g["score_torch"])
    # through load_niqe_model + .mat round trip, as cli.test would
    mat = __file__.replace("test_niqe.py", "goldens/_tmp_niqe.mat")
    try:
        savemat(mat, {"mu_prisparam": g["mu"][None], "cov_prisparam": g["cov"]})
        model = niqe_mod.load_niqe_model(mat)
    finally:
        import os

        if os.path.exists(mat):
            os.remove(mat)
    got = niqe_mod.niqe(bgr, model, convention="torch")
    assert abs(got - want) <= 1e-4 * max(abs(want), 1.0), (got, want)


def test_aggd_recovers_gaussian_alpha():
    rng = np.random.default_rng(3)
    vec = rng.normal(0, 1, 200_000)
    alpha, bl, br = niqe_mod._estimate_aggd(vec)
    assert 1.7 < alpha < 2.4  # Gaussian => alpha ~ 2
    assert abs(bl - br) < 0.1


def test_aggd_matches_reference_golden():
    g = np.load(__file__.replace("test_niqe.py", "goldens/niqe_internals.npz"))
    a, bl, br = niqe_mod._estimate_aggd(g["vec"])
    np.testing.assert_allclose([a, bl, br], g["aggd"], atol=1e-10)


def test_block_features_match_reference_golden():
    g = np.load(__file__.replace("test_niqe.py", "goldens/niqe_internals.npz"))
    feats = niqe_mod._block_features(g["block"])
    np.testing.assert_allclose(feats, g["feats"], atol=1e-10)
