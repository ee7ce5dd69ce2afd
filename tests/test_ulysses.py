"""Ulysses (head-sharded all-to-all) attention — the alternative cp mode.

Ring attention (tests/test_ring_attention.py) has no shard-count cap;
Ulysses trades that for two large all-to-alls instead of n_dev ppermute
hops, capped at num_heads-way (4 for BSRGANtrans —
``A-ESRGAN/model.py:667-680``). These tests pin: the primitive against
full attention (8-way/8-head and 4-way/4-head), exact agreement with
ring attention, halo-key masking, gradients, the transformer layer under
shard_map, end-to-end spatially-sharded BSRGANtrans serving with
``cp_backend="ulysses"``, and the head-cap error message.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from srganfd_tpu.parallel import make_mesh
from srganfd_tpu.parallel.ring_attention import ring_attention
from srganfd_tpu.parallel.ulysses import ulysses_attention


def _full_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(d)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", w, v)


def _sharded_run(mesh, fn, n_in, extra_specs=()):
    return functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "data"),) * n_in + tuple(extra_specs),
        out_specs=P(None, "data"), check_vma=False,
    )(fn)


def test_ulysses_matches_full_and_ring(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(0)
    n, t, h, d = 2, 64, 8, 16
    q, k, v = (rng.normal(size=(n, t, h, d)).astype(np.float32) for _ in range(3))
    ref = np.asarray(_full_attention(q, k, v))

    uly = _sharded_run(mesh, lambda q, k, v: ulysses_attention(q, k, v, "data"), 3)
    rin = _sharded_run(mesh, lambda q, k, v: ring_attention(q, k, v, "data"), 3)
    got_u = np.asarray(jax.jit(uly)(q, k, v))
    got_r = np.asarray(jax.jit(rin)(q, k, v))
    np.testing.assert_allclose(got_u, ref, atol=2e-6)
    # the two cp modes are interchangeable numerically
    np.testing.assert_allclose(got_u, got_r, atol=2e-6)


def test_ulysses_four_way_at_the_head_cap(eight_devices):
    """BSRGANtrans's real shape: 4 heads over a 4-device mesh (the cap)."""
    mesh = make_mesh(devices=eight_devices[:4])
    rng = np.random.default_rng(1)
    q, k, v = (rng.normal(size=(1, 32, 4, 8)).astype(np.float32) for _ in range(3))
    ref = np.asarray(_full_attention(q, k, v))
    run = _sharded_run(mesh, lambda q, k, v: ulysses_attention(q, k, v, "data"), 3)
    np.testing.assert_allclose(np.asarray(jax.jit(run)(q, k, v)), ref, atol=2e-6)


def test_ulysses_rejects_indivisible_heads(eight_devices):
    mesh = make_mesh(devices=eight_devices)  # 8-way > 4 heads
    q = np.zeros((1, 16, 4, 8), np.float32)
    run = _sharded_run(mesh, lambda q, k, v: ulysses_attention(q, k, v, "data"), 3)
    with pytest.raises(ValueError, match="must divide"):
        jax.jit(run)(q, q, q)


def test_ulysses_halo_mask_dedups_keys(eight_devices):
    """Spatial-serving layout: each shard carries neighbor halos that are
    duplicates of interior tokens; the mask must exclude them from the
    global key set exactly (same contract as ring attention)."""
    mesh = make_mesh(devices=eight_devices[:4])
    rng = np.random.default_rng(2)
    n, t, h, d, halo, tl = 1, 32, 4, 8, 2, 8
    q, k, v = (rng.normal(size=(n, t, h, d)).astype(np.float32) for _ in range(3))
    ref = np.asarray(_full_attention(q, k, v))

    idx = np.concatenate(
        [np.clip(np.arange(i * tl - halo, (i + 1) * tl + halo), 0, t - 1) for i in range(4)]
    )
    kv_valid = np.zeros(tl + 2 * halo, bool)
    kv_valid[halo:-halo] = True

    run = _sharded_run(
        mesh, lambda q, k, v, m: ulysses_attention(q, k, v, "data", m), 3, (P(),)
    )
    got = np.asarray(jax.jit(run)(q[:, idx], k[:, idx], v[:, idx], kv_valid))
    blk = tl + 2 * halo
    for i in range(4):
        own = got[:, i * blk + halo : i * blk + halo + tl]
        np.testing.assert_allclose(own, ref[:, i * tl : (i + 1) * tl], atol=2e-6)


def test_ulysses_gradients_match_full(eight_devices):
    mesh = make_mesh(devices=eight_devices[:4])
    rng = np.random.default_rng(3)
    n, t, h, d = 1, 32, 4, 8
    q, k, v = (rng.normal(size=(n, t, h, d)).astype(np.float32) for _ in range(3))
    cot = rng.normal(size=(n, t, h, d)).astype(np.float32)

    gref = jax.grad(
        lambda q, k, v: jnp.sum(_full_attention(q, k, v) * cot), argnums=(0, 1, 2)
    )(q, k, v)

    out = _sharded_run(
        mesh, lambda q, k, v, c: ulysses_attention(q, k, v, "data") * c, 4
    )
    guly = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(out(q, k, v, cot)), argnums=(0, 1, 2))
    )(q, k, v)
    for a, b in zip(guly, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_layer_ulysses_matches_unsharded(eight_devices):
    from srganfd_tpu.models.blocks import TransformerEncoderLayer

    mesh = make_mesh(devices=eight_devices[:4])
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 32, 32)).astype(np.float32)

    plain = TransformerEncoderLayer(32, 4)
    uly = TransformerEncoderLayer(32, 4, ring_axis="data", cp_backend="ulysses")
    params = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ref = np.asarray(plain.apply({"params": params}, jnp.asarray(x)))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    def run(p, xs):
        return uly.apply({"params": p}, xs)

    got = np.asarray(jax.jit(run)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_bsrgantrans_spatial_ulysses_serving(eight_devices):
    """End-to-end: spatially-sharded BSRGANtrans with cp_backend=ulysses
    tracks the unsharded model over a 4-device mesh (the 4-head cap)."""
    from srganfd_tpu.models import create_model
    from srganfd_tpu.parallel.spatial import spatial_sharded_sr

    mesh = make_mesh(devices=eight_devices[:4])
    kw = dict(channels=8, growth_channels=4, num_rrdb=1)
    halo = 8
    base = create_model("bsrgantrans_x2", **kw)
    uly = create_model(
        "bsrgantrans_x2", ring_axis="data", ring_halo=halo,
        cp_backend="ulysses", **kw,
    )

    rng = np.random.default_rng(5)
    img = (
        np.linspace(0, 1, 80, dtype=np.float32)[:, None, None]
        * np.ones((80, 16, 3), np.float32)
        + 0.1 * rng.uniform(size=(80, 16, 3)).astype(np.float32)
    ).clip(0, 1)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    ref = np.asarray(base.apply({"params": params}, jnp.asarray(img)[None]))[0]

    got = spatial_sharded_sr(
        lambda p, z: uly.apply({"params": p}, z),
        params, img, 2, mesh, halo=halo, row_multiple=2,
    )
    assert got.shape == ref.shape
    b = 2 * halo
    np.testing.assert_allclose(got[b:-b], ref[b:-b], atol=2e-3)


def test_unknown_cp_backend_raises():
    """A typoed cp_backend must error, not silently run ring (ADVICE r4)."""
    from srganfd_tpu.models.blocks import TransformerEncoderLayer

    layer = TransformerEncoderLayer(
        d_model=8, nhead=4, dim_feedforward=16, ring_axis="data",
        cp_backend="ulises",
    )
    with pytest.raises(ValueError, match="unknown cp_backend"):
        layer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8)))
