"""Scanned RRDB trunk: identical numerics to the unrolled trunk after
parameter stacking, and the remat variant matches too."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.models import create_model
from srganfd_tpu.models.blocks import stack_trunk_params, unstack_trunk_params


def test_scan_matches_unrolled():
    kw = dict(channels=8, growth_channels=4, num_blocks=3)
    unrolled = create_model("rrdbnet_x2", **kw)
    scanned = create_model("rrdbnet_x2", scan_blocks=True, **kw)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 8, 8, 3)).astype(np.float32))
    params_u = unrolled.init(jax.random.PRNGKey(0), x)["params"]
    params_s = {"params": stack_trunk_params(params_u, 3)}
    a = unrolled.apply({"params": params_u}, x)
    b = scanned.apply(params_s, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # round-trip back to unrolled layout
    back = unstack_trunk_params(params_s["params"], 3)
    c = unrolled.apply({"params": back}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0)


def test_scan_init_structure():
    scanned = create_model("bsrgan_x2", channels=8, growth_channels=4, num_rrdb=4,
                           scan_blocks=True)
    x = jnp.zeros((1, 8, 8, 3))
    params = scanned.init(jax.random.PRNGKey(0), x)["params"]
    assert "ScanRRDB" in params
    leaf = jax.tree_util.tree_leaves(params["ScanRRDB"])[0]
    assert leaf.shape[0] == 4  # stacked block axis


def test_remat_matches():
    kw = dict(channels=8, growth_channels=4, num_blocks=2)
    base = create_model("rrdbnet_x2", **kw)
    remat = create_model("rrdbnet_x2", remat=True, **kw)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 8, 8, 3)).astype(np.float32))
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    a = base.apply({"params": params}, x)
    b = remat.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(base.apply({"params": p}, x)))(params)
    gb = jax.grad(lambda p: jnp.sum(remat.apply({"params": p}, x)))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)
