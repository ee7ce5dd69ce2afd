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
