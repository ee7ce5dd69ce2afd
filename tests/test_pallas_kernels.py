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


def test_rdb_pallas_matches_flax_block():
    import jax

    from srganfd_tpu.models.blocks import ResidualDenseBlock
    from srganfd_tpu.ops.pallas.rdb import rdb_forward_pallas

    ch, gc = 16, 8
    block = ResidualDenseBlock(ch, gc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, ch)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(block.apply({"params": params}, x))

    kernels_ = [jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5)]
    biases_ = [jnp.asarray(params[f"conv{k}_bias"]) for k in range(5)]
    got = np.asarray(rdb_forward_pallas(x, kernels_, biases_, tile_h=8, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=1e-5)
