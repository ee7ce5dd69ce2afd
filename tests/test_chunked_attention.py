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
