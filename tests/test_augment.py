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


def test_host_rotate_distribution_matches_reference():
    """The reference ALWAYS rotates by choice([90, 180, 270])
    (``ESRGAN/dataset.py:64`` — 0 degrees is not an option), making the
    dihedral-orientation distribution non-uniform: each group element's
    probability is its share of the 12 equally-likely (angle, hflip,
    vflip) combos — identity lands at 1/12, not the 1/8 that sampling
    k in {0..3} would produce. An off-diagonal marker pulse identifies
    the applied element uniquely; chi-square against the analytic
    mixture."""
    from scipy import stats

    marker = np.zeros((6, 6, 1), np.float32)
    marker[0, 1] = 1.0  # off-diagonal: all 8 dihedral images are distinct
    expected: dict[int, float] = {}
    for k in (1, 2, 3):
        for h in (False, True):
            for v in (False, True):
                m = np.rot90(marker, k)
                if h:
                    m = m[:, ::-1]
                if v:
                    m = m[::-1]
                pos = int(np.argmax(m))
                expected[pos] = expected.get(pos, 0) + 1 / 12
    identity_pos = int(np.argmax(marker))
    assert len(expected) == 8 and abs(expected[identity_pos] - 1 / 12) < 1e-12

    rng = np.random.default_rng(0)
    n = 6000
    counts: dict[int, int] = {}
    for _ in range(n):
        pos = int(np.argmax(augment.random_rotate_flip_np(marker, rng)))
        counts[pos] = counts.get(pos, 0) + 1
    assert set(counts) <= set(expected), "unreachable orientation produced"
    obs = np.array([counts.get(p, 0) for p in expected])
    exp = np.array([expected[p] * n for p in expected])
    p = stats.chisquare(obs, exp).pvalue
    assert p > 1e-3, (p, dict(zip(expected, obs)), exp)
    # and the mixture is distinguishable from uniform-k: identity ~ 1/12
    uniform = np.full(8, n / 8)
    assert stats.chisquare(obs, uniform).pvalue < 1e-3


def test_host_rotate_reference_quirk_matches_executed_mapping():
    """reference_rotate_quirk reproduces the executed reference's
    off-center warpAffine on even square crops: rot90(k) shifted by
    {90:(1,0), 180:(1,1), 270:(0,1)} with a zero border (mapping measured
    against ``ESRGAN/imgproc.py:511-537`` run directly; odd sizes exact).
    """
    img = np.arange(8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)

    class _OneK:
        """rng stub: forces k and suppresses flips."""

        def __init__(self, k):
            self._k = k

        def integers(self, lo, hi):
            return self._k

        def random(self):
            return 0.9  # >= 0.5: no flip

    for k, (dy, dx) in augment._REFERENCE_ROTATE_SHIFT.items():
        got = augment.random_rotate_flip_np(img, _OneK(k), reference_rotate_quirk=True)
        want = np.zeros_like(img)
        rot = np.rot90(img, k)
        want[dy:, dx:] = rot[: 8 - dy, : 8 - dx]
        np.testing.assert_array_equal(got, want)
        # border rows/cols that entered are zero
        if dy:
            assert (got[0] == 0).all()
        if dx:
            assert (got[:, 0] == 0).all()
    # odd sizes: quirk is a no-op (the reference's center is exact there)
    odd = np.arange(7 * 7 * 3, dtype=np.float32).reshape(7, 7, 3)
    got = augment.random_rotate_flip_np(odd, _OneK(2), reference_rotate_quirk=True)
    np.testing.assert_array_equal(got, np.rot90(odd, 2))
