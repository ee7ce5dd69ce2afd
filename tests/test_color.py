"""Bit-faithfulness of ops.color vs. the reference's MATLAB-constant
conversions (ESRGAN/imgproc.py:291-462)."""

import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops import color


def test_rgb_to_ycbcr(goldens):
    g = goldens("color")
    x = jnp.asarray(g["x"])
    np.testing.assert_allclose(np.asarray(color.rgb_to_ycbcr(x)), g["rgb2ycbcr"], atol=1e-6)
    got_y = np.asarray(color.rgb_to_ycbcr(x, True))[..., 0]
    np.testing.assert_allclose(got_y, g["rgb2y"], atol=1e-6)


def test_bgr_to_ycbcr(goldens):
    g = goldens("color")
    x = jnp.asarray(g["x"])
    np.testing.assert_allclose(np.asarray(color.bgr_to_ycbcr(x)), g["bgr2ycbcr"], atol=1e-6)
    got_y = np.asarray(color.bgr_to_ycbcr(x, True))[..., 0]
    np.testing.assert_allclose(got_y, g["bgr2y"], atol=1e-6)


def test_ycbcr_to_rgb_bgr(goldens):
    g = goldens("color")
    ycc = jnp.asarray(g["ycc"])
    np.testing.assert_allclose(np.asarray(color.ycbcr_to_rgb(ycc)), g["ycbcr2rgb"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(color.ycbcr_to_bgr(ycc)), g["ycbcr2bgr"], atol=1e-5)


def test_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(5, 5, 3)).astype(np.float32))
    back = color.ycbcr_to_rgb(color.rgb_to_ycbcr(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
