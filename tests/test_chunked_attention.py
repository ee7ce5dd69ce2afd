"""Chunked attention must equal full attention exactly (same softmax per
query block over the full key set), at O(chunk*T) score memory."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.models import create_model
from srganfd_tpu.models.blocks import TokenSelfAttention, chunked_attention


def test_chunked_attention_matches_full():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 37, 4, 8)).astype(np.float32)) for _ in range(3)
    )
    full = chunked_attention(q, k, v, chunk=64)  # one block covers all
    for chunk in (5, 16, 37):
        got = chunked_attention(q, k, v, chunk=chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-6, rtol=1e-6)


def test_token_self_attention_chunked_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 16)).astype(np.float32))
    full_mod = TokenSelfAttention(16, num_heads=4)
    params = full_mod.init(jax.random.PRNGKey(0), x)["params"]
    out_full, w = full_mod.apply({"params": params}, x)
    assert w is not None and w.shape == (1, 48, 48)
    out_chunk, w_chunk = TokenSelfAttention(16, num_heads=4, chunk_size=7).apply(
        {"params": params}, x
    )
    assert w_chunk is None
    np.testing.assert_allclose(np.asarray(out_chunk), np.asarray(out_full), atol=2e-6)


def test_bsrgantrans_chunked_matches_full():
    """Same checkpoint, both attention regimes, identical output."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    kw = dict(channels=8, growth_channels=4, num_rrdb=1)
    full = create_model("bsrgantrans_x2", **kw)
    params = full.init(jax.random.PRNGKey(0), x)["params"]
    out_full = full.apply({"params": params}, x)
    chunked = create_model("bsrgantrans_x2", attn_chunk=16, **kw)
    out_chunk = chunked.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_chunk), np.asarray(out_full), atol=3e-6)


def test_flash_attention_matches_chunked():
    """Pallas flash kernel (interpret mode off-TPU): values and grads
    must match the chunked reference; odd T exercises the tail mask."""
    from srganfd_tpu.ops.pallas.attention import flash_attention

    rng = np.random.default_rng(3)
    for n, t, h, d in [(2, 100, 4, 16), (1, 333, 8, 32)]:
        q, k, v = (
            jnp.asarray(rng.normal(size=(n, t, h, d)).astype(np.float32))
            for _ in range(3)
        )
        ref = chunked_attention(q, k, v, chunk=64)
        got = flash_attention(q, k, v, 128, 128, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
        g_ref = jax.grad(lambda a: jnp.abs(chunked_attention(a, k, v, 64)).mean())(q)
        g_got = jax.grad(lambda a: jnp.abs(flash_attention(a, k, v, 128, 128, True)).mean())(q)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=2e-6)


def test_flash_backend_in_model():
    """bsrgantrans with the flash backend selected equals the default
    backend on the same checkpoint (backend is execution-only)."""
    from srganfd_tpu.models import blocks

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    kw = dict(channels=8, growth_channels=4, num_rrdb=1, attn_chunk=16)
    model = create_model("bsrgantrans_x2", **kw)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out_chunked = model.apply({"params": params}, x)
    blocks.set_attention_backend("flash")
    try:
        out_flash = model.apply({"params": params}, x)
    finally:
        blocks.set_attention_backend("chunked")
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_chunked), atol=3e-6
    )
