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


def test_image_tensor_roundtrip():
    from srganfd_tpu.ops.convert import image_to_tensor, tensor_to_image

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (6, 7, 3)) * 255).astype(np.uint8).astype(np.float32) / 255.0
    t = image_to_tensor(img)
    assert t.shape == (1, 6, 7, 3)
    back = tensor_to_image(t)
    # reference semantics truncate (mul(255).clamp().astype(uint8)):
    # float eps may drop one level
    ref = (img * 255).round().astype(np.int32)
    assert np.abs(back.astype(np.int32) - ref).max() <= 1
    # range_norm path
    t2 = image_to_tensor(img, range_norm=True)
    assert float(t2.min()) >= -1.0 and float(t2.max()) <= 1.0
    back2 = tensor_to_image(t2, range_norm=True)
    assert np.abs(back2.astype(np.int32) - back.astype(np.int32)).max() <= 1
