"""Tiled inference: seam-free reconstruction and mesh execution."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.parallel import make_mesh
from srganfd_tpu.parallel.tiled_inference import tiled_sr
from srganfd_tpu.ops.resize import upsample_nearest


def _nearest_apply(params, lr):
    # a trivial "generator": nearest x2 upsample (translation-equivariant,
    # so tiling must reconstruct it exactly)
    return upsample_nearest(lr, 2)


def test_tiled_matches_full_for_local_model():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(70, 90, 3)).astype(np.float32)
    full = np.asarray(upsample_nearest(jnp.asarray(img)[None], 2))[0]
    tiled = tiled_sr(_nearest_apply, None, img, upscale_factor=2, tile=32, overlap=4)
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, atol=1e-6)


def test_tiled_on_mesh(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    full = np.asarray(upsample_nearest(jnp.asarray(img)[None], 2))[0]
    tiled = tiled_sr(
        _nearest_apply, None, img, upscale_factor=2, tile=24, overlap=4, mesh=mesh
    )
    np.testing.assert_allclose(tiled, full, atol=1e-6)


def test_tiled_with_real_generator_shape():
    from srganfd_tpu.models import create_model

    model = create_model("rrdbnet_x2", channels=8, growth_channels=4, num_blocks=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    fn = jax.jit(lambda p, z: model.apply({"params": p}, z))
    img = np.random.default_rng(2).uniform(size=(40, 56, 3)).astype(np.float32)
    out = tiled_sr(fn, params, img, upscale_factor=2, tile=16, overlap=4)
    assert out.shape == (80, 112, 3)
    assert np.isfinite(out).all()
