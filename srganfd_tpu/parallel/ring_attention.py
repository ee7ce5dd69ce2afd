"""Ring attention: exact global softmax attention over sequence-sharded
tokens — context parallelism for the transformer/self-attention variants.

The reference's attention is monolithic and O((HW)^2) on one GPU
(``A-ESRGAN/model.py:667-727``, ``BSRGAN/model.py:388-402``); here the
token axis is sharded across the mesh and K/V blocks rotate around the
ICI ring (``jax.lax.ppermute``) while each device accumulates its local
queries' online softmax (the flash-attention recurrence, f32 carries).
After ``n_dev`` hops every query has attended to every key exactly once:
numerics match unsharded attention to f32 roundoff, memory per device is
O(T_loc * T_loc) transient scores, and the K/V traffic rides the
interconnect instead of HBM re-reads.

``kv_valid`` masks which LOCAL tokens a device contributes as keys —
spatially-sharded generator serving (``parallel/spatial.py``) runs the
model on slice+halo rows, so halo-derived tokens are duplicates of a
neighbor's interior tokens (or edge reflections) and must be excluded
from the global key set exactly once.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "ring_attention_fn"]


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    kv_valid: jax.Array | None = None,
) -> jax.Array:
    """Exact attention across an ``axis_name`` ring (call inside
    ``shard_map``). q/k/v: local blocks ``(N, T_loc, H, D)`` of the
    globally sharded token axis; ``kv_valid``: optional ``(T_loc,)`` bool
    mask of the keys this device contributes (False = halo duplicate).
    Returns ``(N, T_loc, H, D)`` in q's dtype.
    """
    n_dev = jax.lax.axis_size(axis_name)
    n, t_loc, h, d = q.shape
    q32 = q.astype(jnp.float32)
    kb = k.astype(jnp.float32)
    vb = v.astype(jnp.float32)
    scale = 1.0 / math.sqrt(d)
    mask = (
        jnp.ones((t_loc,), dtype=bool)
        if kv_valid is None
        else kv_valid.astype(bool)
    )

    acc = jnp.zeros((n, h, t_loc, d), jnp.float32)
    m = jnp.full((n, h, t_loc), -jnp.inf, jnp.float32)
    l = jnp.zeros((n, h, t_loc), jnp.float32)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        acc, m, l, kb, vb, mask = carry
        s = jnp.einsum("nqhd,nkhd->nhqk", q32, kb) * scale
        blk_max = jnp.max(jnp.where(mask[None, None, None, :], s, -jnp.inf), axis=-1)
        m_new = jnp.maximum(m, blk_max)
        # fully-masked-so-far queries keep m == -inf; exp(s - -inf) guards to 0
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.where(
            mask[None, None, None, :], jnp.exp(s - safe_m[..., None]), 0.0
        )
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("nhqk,nkhd->nhqd", p, vb)
        kb = jax.lax.ppermute(kb, axis_name, fwd)
        vb = jax.lax.ppermute(vb, axis_name, fwd)
        mask = jax.lax.ppermute(mask, axis_name, fwd)
        return (acc, m_new, l, kb, vb, mask), None

    (acc, m, l, _, _, _), _ = jax.lax.scan(
        step, (acc, m, l, kb, vb, mask), None, length=n_dev
    )
    out = acc / l[..., None]
    return jnp.moveaxis(out, 1, 2).astype(q.dtype)  # (n, t_loc, h, d)


def ring_attention_fn(axis_name: str, kv_valid: jax.Array | None = None):
    """``nn.MultiHeadDotProductAttention``-compatible ``attention_fn``
    running ring attention (extra kwargs ignored; q/k/v layout matches
    flax's ``(batch, length, heads, depth)``)."""

    def fn(query, key, value, *args, **kwargs):  # noqa: ANN001
        return ring_attention(query, key, value, axis_name, kv_valid)

    return fn
