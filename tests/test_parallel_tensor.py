"""Tensor-parallel (channel-sharded) execution vs the replicated model."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.models import create_model
from srganfd_tpu.parallel import make_mesh
from srganfd_tpu.parallel.tensor import channel_sharded_params


def test_channel_sharded_forward_matches_replicated(eight_devices):
    mesh = make_mesh((2, 4), ("model", "data"), devices=eight_devices)
    model = create_model(
        "bsrgan_x2", channels=8, growth_channels=4, num_rrdb=1
    )
    lr = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 12, 12, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), lr)["params"]
    tp = channel_sharded_params(params, mesh, axis="model")

    # conv kernels with divisible Cout must actually be sharded over all devices
    kernels = [
        v for v in jax.tree_util.tree_leaves(tp) if v.ndim == 4 and v.shape[-1] % 2 == 0
    ]
    assert kernels and all(len(k.sharding.device_set) == 8 for k in kernels)
    # the 3-channel output head stays replicated
    heads = [v for v in jax.tree_util.tree_leaves(tp) if v.ndim == 4 and v.shape[-1] == 3]
    assert heads

    apply = jax.jit(lambda p, z: model.apply({"params": p}, z))
    np.testing.assert_allclose(
        np.asarray(apply(tp, lr)), np.asarray(apply(params, lr)), atol=2e-5, rtol=1e-5
    )
