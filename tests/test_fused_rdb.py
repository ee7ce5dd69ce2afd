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


def test_superpixel_conv_exact():
    """conv3x3_superpixel == plain 3x3 SAME conv, per-pixel exact (the
    MXU-lane-packing dataflow is a pure re-tiling of identical MACs)."""
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models.blocks import conv3x3_superpixel

    rng = np.random.default_rng(0)
    for cin, cout, h, w in [(64, 32, 8, 8), (96, 32, 10, 6), (192, 64, 32, 32)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = conv3x3_superpixel(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_superpixel_rdb_and_generator_match():
    """RDB and full generator outputs with superpixel dataflow match the
    default path on identical params (same tolerance class as the fused
    regrouping test)."""
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 12, 12, 3)).astype(np.float32))
    base = create_model("bsrgan_x4", channels=16, growth_channels=8, num_rrdb=2)
    sp = create_model(
        "bsrgan_x4", channels=16, growth_channels=8, num_rrdb=2, superpixel=True
    )
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    out_base = base.apply({"params": params}, x)
    out_sp = sp.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_base), atol=2e-5, rtol=1e-5)

    # gradients agree too (the training path)
    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g_base = jax.grad(lambda p: loss(base, p))(params)
    g_sp = jax.grad(lambda p: loss(sp, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_base), jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-4)


def test_superpixel_scan_trunk_matches():
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    a = create_model("bsrgan_x4", channels=16, growth_channels=8, num_rrdb=2,
                     scan_blocks=True)
    b = create_model("bsrgan_x4", channels=16, growth_channels=8, num_rrdb=2,
                     scan_blocks=True, superpixel=True)
    params = a.init(jax.random.PRNGKey(0), x)["params"]
    np.testing.assert_allclose(
        np.asarray(b.apply({"params": params}, x)),
        np.asarray(a.apply({"params": params}, x)),
        atol=2e-5, rtol=1e-5,
    )
