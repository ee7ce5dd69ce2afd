"""Ring attention (context parallelism) over the 8-device mesh.

The reference's transformer/self-attention variants compute monolithic
O((HW)^2) attention on one GPU (``A-ESRGAN/model.py:667-727``); here the
token axis shards across the mesh and K/V blocks rotate via ppermute
(``parallel/ring_attention.py``). These tests pin: the primitive against
full attention (with and without halo key masks), the transformer layer
under shard_map against its unsharded self, and spatially-sharded
BSRGANtrans serving — which is only correct WITH ring attention (each
shard's local attention diverges, also asserted).
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


def _full_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(d)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", w, v)


def test_ring_attention_matches_full(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(0)
    n, t, h, d = 2, 64, 4, 16
    q, k, v = (rng.normal(size=(n, t, h, d)).astype(np.float32) for _ in range(3))
    ref = np.asarray(_full_attention(q, k, v))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(None, "data"),) * 3,
        out_specs=P(None, "data"), check_vma=False,
    )
    def run(q, k, v):
        return ring_attention(q, k, v, "data")

    got = np.asarray(jax.jit(run)(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_ring_attention_halo_mask_dedups_keys(eight_devices):
    # each shard holds its 8 owned tokens plus 2-token halos of its
    # neighbors (the spatial-serving layout); masking the halos from the
    # key set must reproduce full attention over the 64 global tokens
    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(1)
    n, t, h, d, halo, tl = 1, 64, 2, 8, 2, 8
    q, k, v = (rng.normal(size=(n, t, h, d)).astype(np.float32) for _ in range(3))
    ref = np.asarray(_full_attention(q, k, v))

    idx = np.concatenate(
        [np.clip(np.arange(i * tl - halo, (i + 1) * tl + halo), 0, t - 1) for i in range(8)]
    )
    kv_valid = np.zeros(tl + 2 * halo, bool)
    kv_valid[halo:-halo] = True

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(None, "data"),) * 3 + (P(),),
        out_specs=P(None, "data"), check_vma=False,
    )
    def run(q, k, v, mask):
        return ring_attention(q, k, v, "data", mask)

    got = np.asarray(jax.jit(run)(q[:, idx], k[:, idx], v[:, idx], kv_valid))
    blk = tl + 2 * halo
    for i in range(8):
        own = got[:, i * blk + halo : i * blk + halo + tl]
        np.testing.assert_allclose(own, ref[:, i * tl : (i + 1) * tl], atol=2e-6)


def test_transformer_layer_ring_matches_unsharded(eight_devices):
    # real qkv/out projections + LN + MLP: the layer under shard_map with
    # ring attention == the plain layer on the gathered tokens
    from srganfd_tpu.models.blocks import TransformerEncoderLayer

    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 64, 32)).astype(np.float32)

    plain = TransformerEncoderLayer(32, 4)
    ringl = TransformerEncoderLayer(32, 4, ring_axis="data")
    params = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ref = np.asarray(plain.apply({"params": params}, jnp.asarray(x)))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    def run(p, xs):
        return ringl.apply({"params": p}, xs)

    got = np.asarray(jax.jit(run)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_bsrgantrans_spatial_ring_serving(eight_devices):
    # end-to-end: BSRGANtrans over spatial_sharded_sr. WITHOUT ring
    # attention each shard attends only to its own slice's tokens and the
    # output diverges; WITH it the sharded result tracks the unsharded
    # model (interior tolerance = the documented halo/receptive-field
    # semantics of parallel/spatial.py).
    from srganfd_tpu.models import create_model
    from srganfd_tpu.parallel.spatial import spatial_sharded_sr

    mesh = make_mesh(devices=eight_devices)
    kw = dict(channels=8, growth_channels=4, num_rrdb=1)
    halo = 8
    base = create_model("bsrgantrans_x2", **kw)
    ring = create_model("bsrgantrans_x2", ring_axis="data", ring_halo=halo, **kw)

    # strong vertical gradient: shard-local key statistics differ, so
    # shard-local attention visibly diverges from global attention
    rng = np.random.default_rng(3)
    img = (
        np.linspace(0, 1, 80, dtype=np.float32)[:, None, None]
        * np.ones((80, 16, 3), np.float32)
        + 0.1 * rng.uniform(size=(80, 16, 3)).astype(np.float32)
    ).clip(0, 1)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    ref = np.asarray(base.apply({"params": params}, jnp.asarray(img)[None]))[0]

    def run(model):
        return spatial_sharded_sr(
            lambda p, z: model.apply({"params": p}, z),
            params, img, 2, mesh, halo=halo, row_multiple=2,
        )

    got_ring = run(ring)
    got_local = run(base)
    assert got_ring.shape == ref.shape
    b = 2 * halo  # border rows: reflect-vs-zero edge context, scaled by sf
    err_ring = np.abs(got_ring[b:-b] - ref[b:-b]).max()
    err_local = np.abs(got_local[b:-b] - ref[b:-b]).max()
    assert err_ring < 2e-3, err_ring
    assert err_local > 10 * err_ring, (err_local, err_ring)


def test_ring_attention_gradients_match_full(eight_devices):
    # cp is trainable: grads through the ppermute ring (scan transpose
    # reverses the rotation) match full-attention grads
    mesh = make_mesh(devices=eight_devices)
    rng = np.random.default_rng(4)
    n, t, h, d = 1, 32, 2, 8
    q, k, v = (rng.normal(size=(n, t, h, d)).astype(np.float32) for _ in range(3))
    cot = rng.normal(size=(n, t, h, d)).astype(np.float32)

    def loss_full(q, k, v):
        return jnp.sum(_full_attention(q, k, v) * cot)

    gref = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(None, "data"),) * 4,
        out_specs=P(None, "data"), check_vma=False,
    )
    def ring_out(q, k, v, c):
        return ring_attention(q, k, v, "data") * c

    def loss_ring(q, k, v):
        return jnp.sum(ring_out(q, k, v, cot))

    gring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gring, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
