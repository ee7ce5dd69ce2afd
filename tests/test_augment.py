"""Device-side paired augmentation tests: GT/LR alignment is preserved."""

import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops import augment


def _aligned_pair(n=2, lr_size=16, sf=2, seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.uniform(size=(n, lr_size, lr_size, 3)).astype(np.float32)
    gt = np.repeat(np.repeat(lr, sf, axis=1), sf, axis=2)  # exact nearest x2
    return jnp.asarray(gt), jnp.asarray(lr)


def test_paired_random_crop_alignment():
    gt, lr = _aligned_pair()
    tops = jnp.asarray([1, 3])
    lefts = jnp.asarray([2, 0])
    gt_c, lr_c = augment.paired_random_crop(gt, lr, tops, lefts, gt_patch=8, upscale_factor=2)
    assert gt_c.shape == (2, 8, 8, 3)
    assert lr_c.shape == (2, 4, 4, 3)
    # alignment: nearest-upsampled LR crop must equal the GT crop
    up = np.repeat(np.repeat(np.asarray(lr_c), 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(up, np.asarray(gt_c), atol=1e-6)


def test_paired_flip_rotate_alignment():
    gt, lr = _aligned_pair()
    hf = jnp.asarray([1.0, 0.0])
    vf = jnp.asarray([0.0, 1.0])
    rot = jnp.asarray([1.0, 0.0])
    gt_a, lr_a = augment.paired_flip_rotate(gt, lr, hf, vf, rot)
    up = np.repeat(np.repeat(np.asarray(lr_a), 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(up, np.asarray(gt_a), atol=1e-6)


def test_flip_flags_are_per_sample():
    gt, lr = _aligned_pair()
    hf = jnp.asarray([1.0, 0.0])
    z = jnp.zeros(2)
    gt_a, _ = augment.paired_flip_rotate(gt, lr, hf, z, z)
    np.testing.assert_allclose(np.asarray(gt_a[0]), np.asarray(gt[0, :, ::-1]), atol=0)
    np.testing.assert_allclose(np.asarray(gt_a[1]), np.asarray(gt[1]), atol=0)
