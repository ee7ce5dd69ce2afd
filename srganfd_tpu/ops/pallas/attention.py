"""Flash (online-softmax) attention as a Pallas TPU kernel.

Targets the reference's O((HW)^2) self-attention hot spots — the SA
discriminator's token attention (``BSRGAN/model.py:388-402``) and the
BSRGANtrans transformer bottleneck (``A-ESRGAN/model.py:667-680``) — at
large token counts, where even the exact *chunked* attention
(``models/blocks.py:chunked_attention``) still materializes a
(chunk, T) score block in HBM per step and re-streams full K/V from HBM
for every query chunk.

Design:
- Arrays fold (batch, heads) into one grid axis; grid is
  ``(N*H, q_blocks, k_blocks)`` with the TPU's sequential grid walking
  the k axis innermost. Running max / normalizer / weighted accumulator
  live in VMEM scratch that persists across the k sweep (the canonical
  TPU flash-attention schedule).
- Scores for one (block_q, block_k) tile only ever exist in VMEM;
  softmax is computed online (rescale-by-``exp(m_prev - m_next)``), so
  peak memory is O(block_q * block_k) regardless of T.
- Tail K positions are masked with -inf before the row max; padded
  query rows compute garbage that the caller slices off.
- Numerics: scores and accumulation in float32 regardless of input
  dtype (matches ``chunked_attention``); output cast back.

Semantics match ``chunked_attention(q, k, v, chunk)`` exactly
(same 1/sqrt(D) scaling, no mask, no dropout); q/k/v: (N, T, H, D).

Backward: ``flash_attention`` carries a custom VJP that recomputes the
exact attention in query chunks (same math as the forward) and
differentiates through that — O(chunk * T) score memory in the backward
as well, so training through the kernel stays large-T-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float, t: int, block_k: int
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full(m_scr.shape, -jnp.inf, dtype=jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, dtype=jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, dtype=jnp.float32)

    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (bk, d)
    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (bq, bk)

    if t % block_k:  # tail block exists: mask K positions beyond T
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t, s, -jnp.inf)

    m_prev = m_scr[:, :1]  # (bq, 1), lanes hold broadcast copies
    l_prev = l_scr[:, :1]
    m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    correction = jnp.exp(m_prev - m_next)  # exp(-inf - finite) = 0 on first block
    p = jnp.exp(s - m_next)  # (bq, bk)
    l_next = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int, block_k: int, interpret: bool
) -> jax.Array:
    n, t, h, d = q.shape
    bq = min(block_q, _round_up(t, 8))
    bk = min(block_k, _round_up(t, 128))
    fold = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(n * h, x.shape[1], d)
    q3, k3, v3 = fold(q), fold(k), fold(v)
    tq = _round_up(t, bq)
    tk = _round_up(t, bk)
    q3 = jnp.pad(q3, ((0, 0), (0, tq - t), (0, 0)))
    k3 = jnp.pad(k3, ((0, 0), (0, tk - t), (0, 0)))
    v3 = jnp.pad(v3, ((0, 0), (0, tk - t), (0, 0)))

    grid = (n * h, tq // bq, tk // bk)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=1.0 / (d**0.5), t=t, block_k=bk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n * h, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-broadcast)
            pltpu.VMEM((bq, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((bq, d), jnp.float32),  # weighted-V accumulator
        ],
        interpret=interpret,
    )(q3, k3, v3)
    out = out[:, :t].reshape(n, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def _exact_chunked(q: jax.Array, k: jax.Array, v: jax.Array, chunk: int) -> jax.Array:
    """Exact reference attention in query chunks (same math as
    ``models.blocks.chunked_attention``; duplicated minimally to avoid a
    circular import) — used for the custom VJP recompute."""
    n, t, h, d = q.shape
    pad = (-t) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nb = qp.shape[1] // chunk
    blocks = jnp.moveaxis(qp.reshape(n, nb, chunk, h, d), 1, 0)

    # remat keeps the VJP's residuals at O(T): without it, lax.map's
    # linearization stacks every block's (n, h, chunk, T) softmax weights
    # (O(T^2) total), so training through the kernel would OOM at exactly
    # the token counts the flash forward exists for
    @jax.checkpoint
    def blk(qi):
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", qi.astype(jnp.float32), k.astype(jnp.float32)
        ) / jnp.sqrt(d)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("nhqk,nkhd->nqhd", w, v.astype(jnp.float32))

    out = jax.lax.map(blk, blocks)
    out = jnp.moveaxis(out, 0, 1).reshape(n, nb * chunk, h, d)
    return out[:, :t].astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Exact softmax attention, O(block_q * block_k) score memory.

    q/k/v: (N, T, H, D) — same layout and scaling as
    ``models.blocks.chunked_attention``. ``interpret=True`` runs the
    Pallas interpreter (CPU tests)."""
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    return _flash_forward(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: _exact_chunked(a, b, c, block_q), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
