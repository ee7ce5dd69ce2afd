"""The MXU-regrouped RDB dataflow must be numerically identical to the
reference-literal dataflow (same parameters, different execution order)."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.models.blocks import ResidualDenseBlock


def test_fused_matches_reference_dataflow():
    fused = ResidualDenseBlock(16, 8, fused=True)
    naive = ResidualDenseBlock(16, 8, fused=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 12, 16)).astype(np.float32))
    params = fused.init(jax.random.PRNGKey(1), x)
    a = fused.apply(params, x)
    b = naive.apply(params, x)  # same param tree, literal dataflow
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


def test_fused_gradients_match():
    fused = ResidualDenseBlock(8, 4, fused=True)
    naive = ResidualDenseBlock(8, 4, fused=False)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 8)).astype(np.float32))
    params = fused.init(jax.random.PRNGKey(2), x)

    ga = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(naive.apply(p, x) ** 2))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-4, rtol=1e-4)
