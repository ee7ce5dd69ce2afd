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


def test_filter2d_gemm_matches_depthwise():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(size=(3, 24, 16, 3)).astype(np.float32))
    ks = jnp.asarray(
        np.stack(
            [
                kernels.fspecial_gaussian(7, 1.2),
                kernels.anisotropic_gaussian(7, 0.4, 2.0, 1.0),
                kernels.fspecial_gaussian(7, 0.6),
            ]
        ).astype(np.float32)
    )
    want = np.asarray(filters.filter2d_depthwise(imgs, ks))
    got = np.asarray(filters.filter2d_gemm(imgs, ks))
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


def test_rdb_apply_custom_vjp_gradients():
    import jax
    from functools import partial

    from srganfd_tpu.models.blocks import ResidualDenseBlock
    from srganfd_tpu.ops.pallas import rdb as rdb_mod

    ch, gc = 16, 8
    block = ResidualDenseBlock(ch, gc)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, ch)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    kernels_ = tuple(jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5))
    biases_ = tuple(jnp.asarray(params[f"conv{k}_bias"]) for k in range(5))

    # force interpreter mode inside the custom-vjp forward for CPU testing
    orig = rdb_mod.rdb_forward_pallas
    rdb_mod.rdb_forward_pallas = partial(orig, interpret=True)
    try:
        def loss_pallas(x_in, ks, bs):
            return jnp.sum(rdb_mod.rdb_apply(x_in, ks, bs, 8) ** 2)

        def loss_flax(x_in, ks, bs):
            p = {f"conv{k}_kernel": ks[k] for k in range(5)}
            p.update({f"conv{k}_bias": bs[k] for k in range(5)})
            return jnp.sum(block.apply({"params": p}, x_in) ** 2)

        va, grads_a = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(x, kernels_, biases_)
        vb, grads_b = jax.value_and_grad(loss_flax, argnums=(0, 1, 2))(x, kernels_, biases_)
        assert abs(float(va) - float(vb)) < 1e-3
        for ga, gb in zip(jax.tree_util.tree_leaves(grads_a), jax.tree_util.tree_leaves(grads_b)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3, rtol=1e-3)
    finally:
        rdb_mod.rdb_forward_pallas = orig


def test_filter2d_dispatcher_large_image_fallback(monkeypatch):
    """Above the banded-GEMM edge threshold the dispatcher must fall back
    to the depthwise form with identical results."""
    from srganfd_tpu.ops import filters as F

    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(size=(1, 20, 20, 3)).astype(np.float32))
    ks = jnp.asarray(kernels.fspecial_gaussian(5, 1.0).astype(np.float32))[None]
    full = np.asarray(F.filter2d(imgs, ks))  # GEMM path (20 <= threshold)
    monkeypatch.setattr(F, "_GEMM_MAX_EDGE", 8)
    fallback = np.asarray(F.filter2d(imgs, ks))  # depthwise path now
    np.testing.assert_allclose(fallback, full, atol=2e-6, rtol=1e-5)


def test_rdb_v2_matches_flax_block():
    import jax

    from srganfd_tpu.models.blocks import ResidualDenseBlock
    from srganfd_tpu.ops.pallas.rdb import rdb_forward_pallas_v2

    ch, gc = 16, 8
    block = ResidualDenseBlock(ch, gc)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, 12, ch)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(block.apply({"params": params}, x))
    kernels_ = [jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5)]
    biases_ = [jnp.asarray(params[f"conv{k}_bias"]) for k in range(5)]
    got = np.asarray(
        rdb_forward_pallas_v2(x, kernels_, biases_, batch_tile=2, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=1e-5)


def test_rdb_v2_custom_vjp_gradients():
    import jax
    from functools import partial

    from srganfd_tpu.models.blocks import ResidualDenseBlock
    from srganfd_tpu.ops.pallas import rdb as rdb_mod

    ch, gc = 16, 8
    block = ResidualDenseBlock(ch, gc)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, ch)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    kernels_ = tuple(jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5))
    biases_ = tuple(jnp.asarray(params[f"conv{k}_bias"]) for k in range(5))

    orig = rdb_mod.rdb_forward_pallas_v2
    rdb_mod.rdb_forward_pallas_v2 = partial(orig, interpret=True)
    try:
        def loss_pallas(x_in, ks, bs):
            return jnp.sum(rdb_mod.rdb_apply_v2(x_in, ks, bs, 2) ** 2)

        def loss_flax(x_in, ks, bs):
            p = {f"conv{k}_kernel": ks[k] for k in range(5)}
            p.update({f"conv{k}_bias": bs[k] for k in range(5)})
            return jnp.sum(block.apply({"params": p}, x_in) ** 2)

        va, ga = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(x, kernels_, biases_)
        vb, gb = jax.value_and_grad(loss_flax, argnums=(0, 1, 2))(x, kernels_, biases_)
        assert abs(float(va) - float(vb)) < 1e-3
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)
    finally:
        rdb_mod.rdb_forward_pallas_v2 = orig


def test_rdb_pallas2_large_image_falls_back_to_xla():
    """pallas=2 with H*W beyond the VMEM cap (bt*H*W > 2048 even at bt=1)
    must take the fused XLA dataflow: on CPU a real (non-interpret)
    pallas_call would raise, so plain success + parity with pallas=False
    proves the fall-through."""
    import jax

    from srganfd_tpu.models.blocks import ResidualDenseBlock

    ch, gc = 16, 8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, ch)).astype(np.float32))  # 2304 px
    ref_block = ResidualDenseBlock(ch, gc)
    params = ref_block.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(ref_block.apply({"params": params}, x))
    got = np.asarray(
        ResidualDenseBlock(ch, gc, pallas=2).apply({"params": params}, x)
    )
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=1e-5)
