"""Pipeline parallelism (pp) over the RRDB trunk.

The reference is single-GPU (SURVEY.md §0/§2.9) and its largest trunk —
23 RRDBs (``ESRGAN/model.py:301-322``) — fits one device, so pp exists
here for scale-out completeness: trunks (or model widths) that exceed a
chip's HBM shard their *depth* across a ``pipe`` mesh axis.

Design (TPU-first, one SPMD program):

- The scanned trunk's stacked block params (leading axis = block index,
  ``models/blocks.py:run_trunk``) are split into S contiguous stages and
  sharded over the ``pipe`` axis — each device holds L = ceil(B/S)
  blocks. Block counts that don't divide (the flagship B=23 is prime)
  are padded with never-executed slots masked out per device, so
  numerics are exact for ANY (B, S).
- GPipe-style microbatching as a ``lax.scan`` over T = M + S - 1 ticks:
  every tick each device applies its stage to the activation it holds,
  then ``ppermute`` rotates activations one stage forward over ICI.
  Stage 0 injects microbatch t; stage S-1 writes its result into an
  output buffer; a final ``psum`` replicates the assembled output.
- The backward pass needs no second schedule: ``jax.grad`` through the
  tick scan transposes the ``ppermute`` ring into the reverse rotation,
  yielding the pipelined backward automatically, with each device
  accumulating exactly its own stage's parameter gradients (sharded like
  the params).
- Composes with data parallelism: on a ``(data, pipe)`` mesh the same
  program runs one pipeline ring per data row (pass ``batch_axis``).

Bubble fraction is the GPipe (S-1)/(M+S-1); raise ``microbatches`` to
amortize. At the reference's model sizes pp is a capability, not a
speedup — one v5e chip fits every family with room to spare — so the
production configs stay dp; this module is for the scale regime where
depth no longer fits.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "pad_stages",
    "pipelined_trunk_apply",
    "split_trunk_params",
    "pipelined_generator_apply",
    "pipelined_full_apply",
    "trunk_block",
]


def trunk_block(model: Any):
    """The model's single-RRDB module with ALL of the model's trunk
    dataflow flags (fused/superpixel/pallas) — the one place the pp code
    reconstructs a block, so a new trunk flag is added here once."""
    from srganfd_tpu.models.blocks import RRDB

    return RRDB(
        model.channels,
        model.growth_channels,
        model.dtype,
        fused=getattr(model, "rdb_fused", True),
        superpixel=getattr(model, "superpixel", False),
        pallas=getattr(model, "pallas", False),
    )


def split_trunk_params(params: dict) -> tuple[dict, Any]:
    """Split a scan-layout generator param tree into (non-trunk tree,
    stacked trunk block params). The stacked leaves carry the leading
    block axis (see ``models/blocks.py:stack_trunk_params``)."""
    if "ScanRRDB" not in params:
        raise ValueError(
            "pipeline parallelism needs the scanned trunk layout "
            "(create the model with scan_blocks=True, or convert with "
            "models.blocks.stack_trunk_params)"
        )
    nontrunk = {k: v for k, v in params.items() if k != "ScanRRDB"}
    return nontrunk, params["ScanRRDB"]["RRDB_0"]


def pad_stages(stacked: Any, n_stages: int) -> tuple[Any, jax.Array]:
    """Pad the stacked block axis up to a multiple of ``n_stages``.

    Returns ``(padded_stacked, mask)`` where ``mask[b]`` marks real
    blocks; padded slots are zeros and are *skipped* (``lax.cond``) at
    apply time, so the padded trunk is numerically identical to the
    original for any stage count.
    """
    num_blocks = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    per_stage = -(-num_blocks // n_stages)  # ceil
    total = per_stage * n_stages

    def pad(a):
        if total == num_blocks:
            return a
        fill = jnp.zeros((total - num_blocks, *a.shape[1:]), a.dtype)
        return jnp.concatenate([a, fill], axis=0)

    padded = jax.tree_util.tree_map(pad, stacked)
    mask = jnp.arange(total) < num_blocks
    return padded, mask


def pipelined_trunk_apply(
    block_apply: Callable[[Any, jax.Array], jax.Array],
    stacked: Any,
    mask: jax.Array,
    x: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    microbatches: int | None = None,
    batch_axis: str | None = None,
) -> jax.Array:
    """Run ``block_apply`` over the stacked blocks as an S-stage pipeline.

    Args:
      block_apply: ``(one_block_params, (mb, H, W, C)) -> (mb, H, W, C)``.
      stacked: block param tree, leading axis ``S * L`` (see
        :func:`pad_stages`), sharded (or shardable) over ``axis``.
      mask: (S * L,) bool — False marks padded slots to skip.
      x: (N, H, W, C) trunk input.
      mesh: mesh containing ``axis`` (and ``batch_axis`` if given).
      microbatches: M; N must divide by it (default: the stage count).
      batch_axis: optional mesh axis the batch dim is sharded over
        (data parallelism around the pipeline).
    Returns (N, H, W, C), bit-comparable to the sequential trunk.
    """
    n_stages = mesh.shape[axis]
    m = microbatches or n_stages
    n = x.shape[0]
    if n % m:
        raise ValueError(f"batch {n} not divisible by microbatches {m}")
    xs = x.reshape(m, n // m, *x.shape[1:])

    x_spec = P(None, batch_axis) if batch_axis else P()
    ticks = m + n_stages - 1

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def run(params_l, mask_l, xs_l):
        dev = jax.lax.axis_index(axis)

        def stage(h):
            def body(c, pm):
                p, keep = pm
                return (
                    jax.lax.cond(
                        keep,
                        lambda c_: block_apply(p, c_).astype(c_.dtype),
                        lambda c_: c_,
                        c,
                    ),
                    None,
                )

            out, _ = jax.lax.scan(body, h, (params_l, mask_l))
            return out

        def tick(carry, t):
            recv, out_buf = carry
            inject = jax.lax.dynamic_index_in_dim(
                xs_l, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            h = jnp.where(dev == 0, inject, recv)
            y = stage(h)
            nxt = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            # stage S-1 finished microbatch t-(S-1); masked write keeps the
            # tick body branch-free and transposes cleanly under grad.
            m_idx = t - (n_stages - 1)
            write = ((dev == n_stages - 1) & (m_idx >= 0)).astype(y.dtype)
            slot = jnp.clip(m_idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(out_buf, slot, 0, keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, cur + write * (y - cur), slot, 0
            )
            return (nxt, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (jnp.zeros_like(xs_l[0]), jnp.zeros_like(xs_l)), jnp.arange(ticks)
        )
        keep = (dev == n_stages - 1).astype(out_buf.dtype)
        return jax.lax.psum(out_buf * keep, axis)

    out = run(stacked, mask, xs)
    return out.reshape(n, *x.shape[1:])


def pipelined_full_apply(
    model: Any,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    microbatches: int | None = None,
    batch_axis: str | None = None,
) -> Callable[[dict, jax.Array], jax.Array]:
    """``apply(full_params, x) -> sr`` with the trunk pipelined.

    Unlike :func:`pipelined_generator_apply`, the param tree stays WHOLE —
    split/pad happen inside the trace — so optimizer, EMA, and checkpoint
    layouts are unchanged; this is the form the Trainer uses.
    """
    block = trunk_block(model)

    def apply_fn(params: dict, x: jax.Array) -> jax.Array:
        nontrunk, stacked = split_trunk_params(params)
        padded, mask = pad_stages(stacked, mesh.shape[axis])

        def trunk_fn(out1):
            return pipelined_trunk_apply(
                lambda p, h: block.apply({"params": p}, h),
                padded,
                mask,
                out1,
                mesh,
                axis=axis,
                microbatches=microbatches,
                batch_axis=batch_axis,
            )

        return model.apply({"params": nontrunk}, x, trunk_fn=trunk_fn)

    return apply_fn


def pipelined_generator_apply(
    model: Any,
    params: dict,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    microbatches: int | None = None,
    batch_axis: str | None = None,
) -> tuple[Callable, dict, Any, jax.Array]:
    """Build a pipelined forward for an RRDB-trunk generator.

    ``model`` must use the scanned trunk (``scan_blocks=True``); its
    non-trunk layers (first conv, trunk-close conv, upsample head) run
    replicated on every pipeline stage — they are single convs, a
    negligible fraction of trunk work — while the RRDB trunk itself is
    stage-sharded.

    Returns ``(apply_fn, nontrunk_params, trunk_stacked, mask)`` with
    ``apply_fn(nontrunk_params, trunk_stacked, x) -> sr``. Keeping the
    trunk stack a separate argument (rather than a closure) lets
    ``jax.grad`` of a loss over both trees drive pipelined *training*:
    each device receives exactly its own stage's gradients.
    """
    nontrunk, stacked = split_trunk_params(params)
    padded, mask = pad_stages(stacked, mesh.shape[axis])

    block = trunk_block(model)

    def block_apply(p, h):
        return block.apply({"params": p}, h)

    def apply_fn(nontrunk_p: dict, trunk_stacked: Any, x: jax.Array) -> jax.Array:
        def trunk_fn(out1):
            return pipelined_trunk_apply(
                block_apply,
                trunk_stacked,
                mask,
                out1,
                mesh,
                axis=axis,
                microbatches=microbatches,
                batch_axis=batch_axis,
            )

        return model.apply({"params": nontrunk_p}, x, trunk_fn=trunk_fn)

    return apply_fn, nontrunk, padded, mask
