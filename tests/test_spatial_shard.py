"""Spatially-sharded SR over the 8-device mesh: exact for local models."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops.resize import upsample_nearest
from srganfd_tpu.parallel import make_mesh
from srganfd_tpu.parallel.spatial import spatial_sharded_sr


def _nearest_apply(params, lr):
    return upsample_nearest(lr, 2)


def test_spatial_shard_matches_full(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 48, 3)).astype(np.float32)
    full = np.asarray(upsample_nearest(jnp.asarray(img)[None], 2))[0]
    got = spatial_sharded_sr(_nearest_apply, None, img, 2, mesh, halo=2)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=1e-6)


def test_spatial_shard_conv_model(eight_devices):
    # a conv model with receptive radius 1: halo=2 must be exact
    from srganfd_tpu.models.blocks import Conv
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(Conv(8)(x), 0.2)
            x = upsample_nearest(x, 2)
            return Conv(3)(x)

    mesh = make_mesh(devices=eight_devices)
    model = Tiny()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(40, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    fn = lambda p, z: model.apply({"params": p}, z)
    full = np.asarray(fn(params, jnp.asarray(img)[None]))[0]
    got = spatial_sharded_sr(fn, params, img, 2, mesh, halo=4)
    # interior shard boundaries are exact; only the image's outer border
    # (reflect context vs the conv's zero padding) may differ
    border = 4
    np.testing.assert_allclose(got[border:-border], full[border:-border], atol=1e-5)
    assert got.shape == full.shape


def test_spatial_shard_unaligned_height(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    img = np.random.default_rng(2).uniform(size=(37, 16, 3)).astype(np.float32)
    full = np.asarray(upsample_nearest(jnp.asarray(img)[None], 2))[0]
    got = spatial_sharded_sr(_nearest_apply, None, img, 2, mesh, halo=2)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=1e-6)
