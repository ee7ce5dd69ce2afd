"""Bit-faithfulness of ops.resize vs. the MATLAB imresize reference
(goldens generated from ESRGAN/imgproc.py:202-288 via tools/gen_goldens.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.ops import resize


CASES = ["down_half", "down_quarter", "down_third", "down_odd", "up_double", "gray_down"]


@pytest.mark.parametrize("case", CASES)
def test_matlab_resize_matches_reference(goldens, case):
    g = goldens("matlab_resize")
    x = g[f"{case}_in"]
    want = g[f"{case}_out"]
    scale = float(g[f"{case}_scale"])
    got = np.asarray(resize.imresize(jnp.asarray(x), scale))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_matlab_resize_no_antialias_upscale(goldens):
    g = goldens("matlab_resize")
    x = g["up_double_in"]
    want = g["up_double_out_noaa"]
    got = np.asarray(resize.imresize(jnp.asarray(x), 2.0, antialiasing=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_imresize_jittable():
    x = jnp.ones((16, 16, 3), jnp.float32)
    fn = jax.jit(lambda im: resize.imresize(im, 0.5))
    out = fn(x)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_imresize_batched():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 12, 12, 3)).astype(np.float32))
    out = resize.imresize(x, 0.5)
    assert out.shape == (4, 6, 6, 3)
    single = resize.imresize(x[0], 0.5)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-6)


def test_nearest_matches_torch_convention():
    # torch F.interpolate(mode="nearest", scale_factor=2) duplicates pixels.
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    out = resize.resize_nearest(x, (4, 4))
    up = resize.upsample_nearest(x, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(up))
    assert np.asarray(out)[0, 0, 1, 0] == 0.0 and np.asarray(out)[0, 0, 2, 0] == 1.0


@pytest.mark.parametrize("interp", [1, 2, 3])
def test_cv2_style_resize_matches_cv2(interp):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, size=(24, 20, 3)).astype(np.float32)
    out_shape = (12, 10)
    want = cv2.resize(x, (out_shape[1], out_shape[0]), interpolation=interp)
    got = np.asarray(resize.cv2_style_resize(jnp.asarray(x), out_shape, interp))
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize("interp", [1, 2])
def test_cv2_style_resize_upscale_matches_cv2(interp):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, size=(9, 7, 3)).astype(np.float32)
    out_shape = (18, 14)
    want = cv2.resize(x, (out_shape[1], out_shape[0]), interpolation=interp)
    got = np.asarray(resize.cv2_style_resize(jnp.asarray(x), out_shape, interp))
    np.testing.assert_allclose(got, want, atol=3e-6)
