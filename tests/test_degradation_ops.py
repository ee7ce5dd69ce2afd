"""Degradation primitive tests: blur kernels vs. reference goldens,
batched filter2d vs. scipy, DiffJPEG vs. real cv2 JPEG."""

import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.ops import filters, jpeg, kernels


def test_fspecial_gaussian_matches_reference(goldens):
    g = goldens("blur_kernels")
    np.testing.assert_allclose(kernels.fspecial_gaussian(15, 2.3), g["iso_15_2p3"], atol=1e-12)
    np.testing.assert_allclose(kernels.fspecial_gaussian(7, 0.5), g["iso_7_0p5"], atol=1e-12)


def test_anisotropic_gaussian_matches_reference(goldens):
    g = goldens("blur_kernels")
    np.testing.assert_allclose(
        kernels.anisotropic_gaussian(15, 0.7, 4.0, 2.0), g["aniso_15"], atol=1e-10
    )
    np.testing.assert_allclose(
        kernels.anisotropic_gaussian(21, 2.4, 8.0, 1.5), g["aniso_21"], atol=1e-10
    )


def test_realesrgan_kernels_normalized():
    for k in [
        kernels.bivariate_gaussian(21, 1.7),
        kernels.bivariate_gaussian(21, 1.7, 0.4, 0.8),
        kernels.bivariate_generalized_gaussian(17, 1.2, 2.0, 0.3, 2.5),
        kernels.bivariate_plateau(13, 0.8, 1.1, -0.5, 1.5),
        kernels.sinc_kernel(np.pi / 3, 21),
    ]:
        assert abs(k.sum() - 1.0) < 1e-9
        assert k.shape[0] == k.shape[1]


def test_sinc_identity_limit():
    # cutoff=pi keeps almost everything: filtering a constant image is identity.
    k = kernels.sinc_kernel(np.pi, 21)
    x = jnp.ones((1, 32, 32, 3))
    out = filters.filter2d(x, jnp.asarray(k)[None])
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_filter2d_matches_scipy_mirror():
    from scipy import ndimage

    rng = np.random.default_rng(3)
    imgs = rng.uniform(size=(2, 20, 24, 3)).astype(np.float32)
    ks = np.stack(
        [kernels.fspecial_gaussian(7, 1.3), kernels.anisotropic_gaussian(7, 0.5, 3.0, 1.0)]
    ).astype(np.float32)
    got = np.asarray(filters.filter2d(jnp.asarray(imgs), jnp.asarray(ks)))
    for i in range(2):
        want = ndimage.convolve(imgs[i], ks[i][:, :, None], mode="mirror")
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_filter2d_padded_kernel_equivalence():
    # Zero-padding a kernel to a larger static size must not change results.
    rng = np.random.default_rng(4)
    imgs = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    k = kernels.fspecial_gaussian(7, 1.0).astype(np.float32)
    small = np.asarray(filters.filter2d(jnp.asarray(imgs), jnp.asarray(k)[None]))
    big = np.asarray(
        filters.filter2d(jnp.asarray(imgs), jnp.asarray(kernels.pad_kernel(k, 13))[None])
    )
    np.testing.assert_allclose(small, big, atol=1e-6)


@pytest.mark.parametrize("quality", [30, 60, 95])
def test_diffjpeg_close_to_cv2(quality):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    # Smooth image: JPEG should be near-lossless at high quality.
    base = rng.uniform(0.2, 0.8, size=(4, 4, 3)).astype(np.float32)
    img = np.asarray(
        jnp.clip(jnp.asarray(cv2.resize(base, (32, 32), interpolation=cv2.INTER_CUBIC)), 0, 1)
    )
    got = np.asarray(
        jpeg.diff_jpeg(jnp.asarray(img)[None], jnp.asarray([float(quality)]), differentiable=False)
    )[0]

    bgr = (img[..., ::-1] * 255.0).round().astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    assert ok
    want = cv2.imdecode(enc, 1)[..., ::-1].astype(np.float32) / 255.0

    # DiffJPEG approximates the codec (no entropy coding, float DCT); the
    # reconstruction should track the real JPEG closely.
    err = np.abs(got - want).mean()
    assert err < 0.02, err


def test_diffjpeg_differentiable():
    import jax

    img = jnp.ones((1, 16, 16, 3)) * 0.5

    def loss(x):
        return jnp.sum(jpeg.diff_jpeg(x, jnp.asarray([50.0]), differentiable=True))

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_diffjpeg_quality_ordering():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    outs = {
        q: np.asarray(jpeg.diff_jpeg(img, jnp.asarray([float(q)]), differentiable=False))
        for q in (10, 50, 95)
    }
    err = {q: np.abs(outs[q] - np.asarray(img)).mean() for q in outs}
    assert err[10] > err[50] > err[95]


def test_realesrgan_kernels_match_reference(goldens):
    g = goldens("realesrgan_kernels")
    np.testing.assert_allclose(kernels.bivariate_gaussian(21, 1.7), g["iso_21_1p7"], atol=1e-10)
    np.testing.assert_allclose(
        kernels.bivariate_gaussian(21, 1.7, 0.4, 0.8), g["aniso_21"], atol=1e-10
    )
    np.testing.assert_allclose(
        kernels.bivariate_generalized_gaussian(17, 1.2, None, 0.0, 2.5),
        g["gen_iso_17"],
        atol=1e-10,
    )
    np.testing.assert_allclose(
        kernels.bivariate_generalized_gaussian(17, 1.2, 2.0, 0.3, 2.5),
        g["gen_aniso_17"],
        atol=1e-10,
    )
    np.testing.assert_allclose(
        kernels.bivariate_plateau(13, 0.8, None, 0.0, 1.5), g["plateau_iso_13"], atol=1e-10
    )
    np.testing.assert_allclose(
        kernels.bivariate_plateau(13, 0.8, 1.1, -0.5, 1.5), g["plateau_aniso_13"], atol=1e-10
    )
    np.testing.assert_allclose(
        kernels.sinc_kernel(np.pi / 3, 21), g["sinc_21"], atol=1e-12
    )
    np.testing.assert_allclose(
        kernels.sinc_kernel(2.0, 13, pad_to=21), g["sinc_13_pad21"], atol=1e-12
    )


@pytest.mark.parametrize("q", [30, 60, 95])
@pytest.mark.parametrize("diff", [False, True])
def test_diffjpeg_matches_reference_module(goldens, q, diff):
    g = goldens("diffjpeg")
    x = jnp.asarray(np.moveaxis(g["x"], 1, -1))
    got = np.asarray(
        jpeg.diff_jpeg(x, jnp.full((2,), float(q)), differentiable=diff, transpose_tables=True)
    )
    want = np.moveaxis(g[f"q{q}_diff" if diff else f"q{q}"], 1, -1)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_usm_sharp_matches_reference(goldens):
    import jax

    from srganfd_tpu.ops.realesrgan_degrade import usm_sharp

    g = goldens("usm")
    got = np.asarray(usm_sharp(jnp.asarray(g["x"])[None], weight=0.5, radius=51, threshold=10.0))[0]
    np.testing.assert_allclose(got, g["out"], atol=2e-5)


def test_bsrgan_chain_per_sample_order():
    from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(3, 32, 32, 3)).astype(np.float32))
    plan = plan_bsrgan_batch(rng, 3, 2, per_sample_order=True)
    assert not isinstance(plan.jpeg_pos, int)
    out = apply_bsrgan_batch(x, plan)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    # the per-batch opt-out speed mode (explicit since the default
    # flipped to per-sample) still drives the static-int jpeg_pos branch
    plan2 = plan_bsrgan_batch(rng, 3, 2, per_sample_order=False)
    assert isinstance(plan2.jpeg_pos, int)
    out2 = apply_bsrgan_batch(x, plan2)
    assert out2.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(out2)).all()


def test_blur_separable_matches_2d_filter():
    """The shared separable blur (two banded GEMMs) must match the 2-D
    outer-product filter to fp-reassociation tolerance."""
    import jax.numpy as jnp

    from srganfd_tpu.ops import filters

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.uniform(size=(3, 40, 28, 3)).astype(np.float32))
    k1d = np.exp(-0.5 * ((np.arange(13) - 6) / 2.0) ** 2)
    k1d /= k1d.sum()
    k2d = np.outer(k1d, k1d).astype(np.float32)
    want = np.asarray(filters.gaussian_blur(imgs, jnp.asarray(k2d)))
    got = np.asarray(filters.blur_separable(imgs, jnp.asarray(k1d.astype(np.float32))))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
