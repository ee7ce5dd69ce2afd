"""Pallas kernels vs their XLA references (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops import filters, kernels
from srganfd_tpu.ops.pallas.filter2d import filter2d_pallas


def test_filter2d_pallas_matches_xla():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 24, 16, 3)).astype(np.float32))
    ks = jnp.asarray(
        np.stack(
            [
                kernels.fspecial_gaussian(7, 1.2),
                kernels.anisotropic_gaussian(7, 0.4, 2.0, 1.0),
            ]
        ).astype(np.float32)
    )
    want = np.asarray(filters.filter2d(imgs, ks))
    got = np.asarray(filter2d_pallas(imgs, ks, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
