"""Batched noise primitives: branch semantics vs the reference formulas.

The chains' forced-decision goldens run at the zero-noise limit, and the
distribution harness verifies the host-side *parameter* draws — these
tests pin the device-side noise transforms themselves against the
reference's branch semantics (``BSRGAN/imgproc.py:229-280``,
``Real_ESRGAN/imgproc.py:832-1089``): gray noise broadcasts one channel,
the correlated-color branch ignores sigma and mixes channels through the
sampled covariance, speckle is multiplicative, and the Poisson level
``vals`` sets the per-sample SNR.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops.degrade import (
    add_gaussian_noise,
    add_poisson_noise,
    add_speckle_noise,
    sample_correlated_noise_chol,
)

KEY = jax.random.PRNGKey(0)


def _img(n=2, h=24, w=24, v=0.5):
    return jnp.full((n, h, w, 3), v, jnp.float32)


def test_gray_noise_is_channel_constant():
    sigma = jnp.full((2,), 10 / 255.0)
    out = add_gaussian_noise(_img(), KEY, sigma, jnp.ones((2,)))
    arr = np.asarray(out)
    np.testing.assert_array_equal(arr[..., 0], arr[..., 1])
    np.testing.assert_array_equal(arr[..., 0], arr[..., 2])
    # color branch: channels differ
    out_c = np.asarray(add_gaussian_noise(_img(), KEY, sigma, jnp.zeros((2,))))
    assert np.abs(out_c[..., 0] - out_c[..., 1]).max() > 0


def test_correlated_branch_ignores_sigma_and_mixes_channels():
    """The reference's correlated branch draws N(0, |L^2 U^T D U|) and
    never consumes noise_level (``BSRGAN/imgproc.py:236-241``)."""
    rng = np.random.default_rng(0)
    chol = jnp.asarray(sample_correlated_noise_chol(rng, 2))
    mask = jnp.ones((2,))
    a = add_gaussian_noise(_img(), KEY, jnp.full((2,), 0.001), jnp.zeros((2,)), chol, mask)
    b = add_gaussian_noise(_img(), KEY, jnp.full((2,), 0.09), jnp.zeros((2,)), chol, mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # covariance of the drawn noise tracks chol @ chol.T
    big = add_gaussian_noise(
        jnp.full((1, 128, 128, 3), 0.5, jnp.float32), KEY,
        jnp.full((1,), 0.001), jnp.zeros((1,)),
        chol[:1], jnp.ones((1,)),
    )
    noise = (np.asarray(big)[0] - 0.5).reshape(-1, 3)
    want = np.asarray(chol[0]) @ np.asarray(chol[0]).T
    got = np.cov(noise.T)
    np.testing.assert_allclose(got, want, atol=5 * np.abs(want).max() / np.sqrt(128))


def test_speckle_is_multiplicative_and_supports_correlated_branch():
    sigma = jnp.full((2,), 20 / 255.0)
    # multiplicative: a zero image stays exactly zero on every branch
    rng = np.random.default_rng(1)
    chol = jnp.asarray(sample_correlated_noise_chol(rng, 2))
    for gray, cm in ((jnp.ones((2,)), None), (jnp.zeros((2,)), jnp.ones((2,)))):
        out = add_speckle_noise(
            jnp.zeros((2, 16, 16, 3)), KEY, sigma, gray,
            chol if cm is not None else None, cm,
        )
        np.testing.assert_array_equal(np.asarray(out), 0.0)
    # correlated branch actually changes the noise vs plain color
    plain = add_speckle_noise(_img(), KEY, sigma, jnp.zeros((2,)))
    corr = add_speckle_noise(_img(), KEY, sigma, jnp.zeros((2,)), chol, jnp.ones((2,)))
    assert np.abs(np.asarray(plain) - np.asarray(corr)).max() > 0
    # and like the additive form, it ignores sigma
    corr2 = add_speckle_noise(
        _img(), KEY, sigma * 4, jnp.zeros((2,)), chol, jnp.ones((2,))
    )
    np.testing.assert_array_equal(np.asarray(corr), np.asarray(corr2))


def test_poisson_vals_sets_per_sample_noise_level():
    """vals = 10**(2U+2) in the plus chain (``BSRGAN/imgproc.py:249``):
    higher vals -> proportionally weaker shot noise, applied per sample."""
    x = _img(n=2, h=64, w=64)
    vals = jnp.asarray([100.0, 10000.0])
    out = np.asarray(
        add_poisson_noise(x, KEY, jnp.ones((2,)), jnp.zeros((2,)), vals=vals)
    )
    std_low = (out[0] - 0.5).std()
    std_high = (out[1] - 0.5).std()
    # shot-noise std scales ~ 1/sqrt(vals): 100x vals ratio -> ~10x std
    assert std_low > 5 * std_high, (std_low, std_high)


def test_poisson_default_vals_match_reference_unique_count_formula():
    """The torch reference derives the shot level from image CONTENT:
    vals = 2**ceil(log2(#unique 8-bit values))
    (``Real_ESRGAN/imgproc.py:894-897``) — a fixed approximation (the
    previous 1000) understates natural-content noise ~2x. Our
    histogram-based device computation must reproduce np.unique's count
    exactly, and the default (torch-semantics) path must equal a manual
    reconstruction: noise from the rounded image at that vals, added to
    the UNROUNDED input."""
    from srganfd_tpu.ops.degrade import poisson_noise_vals

    rng = np.random.default_rng(0)
    # three content regimes: full-range natural, coarsely quantized, flat
    imgs = np.stack([
        rng.uniform(0, 1, (32, 32, 3)),
        np.round(rng.uniform(0, 1, (32, 32, 3)) * 7) / 7.0,
        np.full((32, 32, 3), 0.5),
    ]).astype(np.float32)
    x = jnp.asarray(imgs)
    rounded = np.clip(np.round(imgs * 255.0), 0, 255) / 255.0
    want = np.array([
        2.0 ** np.ceil(np.log2(len(np.unique(r)))) for r in rounded
    ])
    got = np.asarray(poisson_noise_vals(jnp.asarray(rounded)))
    np.testing.assert_array_equal(got, want)
    # flat image -> 1 unique level -> vals=1 (huge noise), same as torch
    assert got[2] == 1.0 and got[0] >= 128.0

    # default path, color branch: clip(x + poisson(rounded*v)/v - rounded)
    out_def = np.asarray(add_poisson_noise(x, KEY, jnp.ones((3,)), jnp.zeros((3,))))
    k1, _ = jax.random.split(KEY)
    v = got[:, None, None, None].astype(np.float32)
    noise = (
        np.asarray(jax.random.poisson(k1, jnp.asarray(rounded * v), x.shape)) / v
        - rounded
    )
    np.testing.assert_allclose(out_def, np.clip(imgs + noise, 0, 1), atol=1e-6)


def test_poisson_explicit_vals_use_the_numpy_reference_base():
    """The BSRGAN plus chain's variant (explicit vals) rounds FIRST and
    keeps the rounded image as the output base (``BSRGAN/imgproc.py:
    248-257``): with a near-zero-noise level the output converges to the
    8-bit-rounded input, not the raw input."""
    x = jnp.full((1, 32, 32, 3), 0.5, jnp.float32)  # rounds to 128/255
    out = np.asarray(
        add_poisson_noise(x, KEY, jnp.ones((1,)), jnp.zeros((1,)),
                          vals=jnp.asarray([1e8], jnp.float32))
    )
    base = 128.0 / 255.0
    assert abs(out.mean() - base) < 1e-3, out.mean()  # base is ROUNDED
    assert abs(base - 0.5) > 1e-3  # and distinguishable from the raw input
