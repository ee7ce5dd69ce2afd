"""Ulysses-style head-sharded attention — the all-to-all alternative to
ring attention for context-parallel serving.

DeepSpeed-Ulysses reshapes sequence parallelism into HEAD parallelism
for the attention itself: tokens arrive sequence-sharded, one
``all_to_all`` regroups them so each device holds ALL tokens for a
subset of heads, full softmax attention runs locally per head (no
per-hop online-softmax recurrence), and a second ``all_to_all`` restores
the sequence sharding. Communication is two all-to-alls of the QKV/out
activations instead of ``n_dev`` ppermute hops of K/V — fewer, larger
transfers that ride ICI well, at the cost of a hard cap: the shard count
cannot exceed the head count.

For this framework's transformer bottleneck (BSRGANtrans, 4 heads —
``A-ESRGAN/model.py:667-680``) that cap is 4-way, which is why RING
attention (``parallel/ring_attention.py``, no head cap, halo-mask
support at any count) stays the default cp mode; Ulysses is the
measured-alternative for meshes up to the head count. Exact vs
unsharded attention to f32 roundoff (tests/test_ulysses.py).

Memory trade-off (ADVICE r4): the local per-head softmax materializes
the full ``(N, H/n_dev, T_glob, T_glob)`` score matrix — O(T_glob^2)
per device, with NO chunked/online-softmax path. Ring attention streams
K/V blocks (O(T_loc * T_glob) scores) and the single-device path has
``attn_chunk``; on frames large enough that scores would not fit,
prefer ``--cp-backend ring``. Composing Ulysses' all-to-all with the
chunked-attention kernel would close this; not needed at the 4-head /
serving-tile sizes this backend is scoped to.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["ulysses_attention", "ulysses_attention_fn"]


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    kv_valid: jax.Array | None = None,
) -> jax.Array:
    """Exact attention via head-sharded all-to-all (call inside
    ``shard_map``). q/k/v: local blocks ``(N, T_loc, H, D)`` of the
    globally sharded token axis; requires ``H % axis_size == 0``.
    ``kv_valid``: optional ``(T_loc,)`` bool mask of the keys this device
    contributes (False = halo duplicate, masked from the global key set
    exactly like ring attention's ``kv_valid``). Returns
    ``(N, T_loc, H, D)`` in q's dtype."""
    n_dev = jax.lax.axis_size(axis_name)
    n, t_loc, h, d = q.shape
    if h % n_dev:
        raise ValueError(
            f"ulysses attention shards heads: num_heads={h} must divide by "
            f"the '{axis_name}' axis size {n_dev} (BSRGANtrans has 4 heads "
            "-> <=4-way; use ring attention beyond that)"
        )

    def seq_to_head(x):
        # (N, T_loc, H, D) -> (N, T_glob, H/n_dev, D): split heads across
        # devices, concatenate every device's tokens
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    q32, k32, v32 = (seq_to_head(t.astype(jnp.float32)) for t in (q, k, v))
    if kv_valid is not None:
        mask = jax.lax.all_gather(kv_valid.astype(bool), axis_name, tiled=True)
    else:
        mask = None

    s = jnp.einsum("nqhd,nkhd->nhqk", q32, k32) / math.sqrt(d)
    if mask is not None:
        s = jnp.where(mask[None, None, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("nhqk,nkhd->nqhd", w, v32)
    # (N, T_glob, H/n_dev, D) -> (N, T_loc, H, D)
    out = jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2, tiled=True)
    return out.astype(q.dtype)


def ulysses_attention_fn(axis_name: str, kv_valid: jax.Array | None = None):
    """``nn.MultiHeadDotProductAttention``-compatible ``attention_fn``
    (same contract as ``ring_attention_fn``)."""

    def fn(query, key, value, *args, **kwargs):  # noqa: ANN001
        return ulysses_attention(query, key, value, axis_name, kv_valid)

    return fn
