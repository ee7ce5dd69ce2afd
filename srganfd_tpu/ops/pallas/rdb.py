"""Fused Residual Dense Block forward as a Pallas TPU kernel (experimental).

The RDB is the framework's hot op: 5 chained 3x3 convs over dense
concatenations, 69 instances per RRDBNet forward. XLA executes each conv
as a separate MXU op with HBM round-trips between them; this kernel keeps
a whole spatial tile resident in VMEM across all five layers, expressing
each conv as 9 shifted (H*W, Cin) @ (Cin, Cout) matmuls with the same
per-source output grouping as the XLA `fused` dataflow
(``models.blocks.ResidualDenseBlock``): x -> 192ch, out1 -> 160ch, ...

Status: correctness-pinned against the Flax block in interpreter mode
(tests); wiring into the model is gated on beating the XLA path on real
hardware (tools/tpu_profile.py) — XLA's conv fusion on TPU is strong, so
this stays opt-in until measured.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rdb_forward_pallas", "rdb_forward_pallas_v2", "rdb_apply", "rdb_apply_v2"]

_MARGIN = 5  # five chained 3x3 convs consume one halo pixel each


def _conv3x3_valid(src: jax.Array, kern: jax.Array) -> jax.Array:
    """Valid 3x3 conv on an (H, W, Cin) tile: 9 shifted matmuls (MXU).

    Operands keep ``src``'s dtype (bf16 on the model's hot path — the
    f32 matmul path runs at a fraction of MXU rate); accumulation is f32
    via ``preferred_element_type``.
    """
    h, w, _ = src.shape
    oh, ow = h - 2, w - 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            window = src[dy : dy + oh, dx : dx + ow, :]
            part = jax.lax.dot_general(
                window.reshape(oh * ow, -1),
                kern[dy, dx].astype(src.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc.reshape(oh, ow, -1)


def _lrelu(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb_kernel(x_ref, *refs, ch: int, gc: int, th: int, w: int, img_h: int):
    """One (batch, H-tile) cell. x_ref: (1, TH+10, W+10, ch) zero-padded
    input; refs = 5 kernel refs + 5 bias refs + out_ref."""
    kern_refs = refs[:5]
    bias_refs = refs[5:10]
    out_ref = refs[10]
    j = pl.program_id(1)

    def mask_outside_image(feat: jax.Array, margin: int) -> jax.Array:
        """Zero positions beyond the true image extent: the Flax block's
        'same' convs see literal zeros there at every layer, while this
        fused chain would otherwise propagate halo activations."""
        rows, cols = feat.shape[0], feat.shape[1]
        gr = j * th - margin + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        gcol = -margin + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        ok = (gr >= 0) & (gr < img_h) & (gcol >= 0) & (gcol < w)
        # cast BEFORE adding the minor dim: Mosaic cannot reshape i1
        # vectors ("insertion of minor dim ... only supported for 32-bit")
        return feat * ok.astype(feat.dtype)[..., None]

    cdt = x_ref.dtype  # matmul operand dtype (bf16 on the hot path)
    x = x_ref[0]
    widths = [ch, gc, gc, gc, gc]
    offsets = [0, ch, ch + gc, ch + 2 * gc, ch + 3 * gc]
    splits = [gc, gc, gc, gc, ch]

    def contributions(source_idx, inp):
        """conv inp against kernels[k>=first] input-rows for this source,
        one wide grouped matmul; returns per-target slices."""
        first = source_idx
        parts = [
            kern_refs[k][:, :, offsets[source_idx] : offsets[source_idx] + widths[source_idx], :]
            for k in range(first, 5)
        ]
        wide = jnp.concatenate([p.astype(cdt) for p in parts], axis=3)
        y = _conv3x3_valid(inp, wide)
        out = [None] * 5
        start = 0
        for k in range(first, 5):
            out[k] = y[..., start : start + splits[k]]
            start += splits[k]
        return out

    # margins shrink by 1 per conv; acc[k] carries margin (4 - k)
    acc = contributions(0, x)
    for k in range(4):
        margin_k = 4 - k  # remaining margin of acc[k]
        y = acc[k] + bias_refs[k][:].astype(jnp.float32)
        out_k = mask_outside_image(_lrelu(y), margin_k)
        contrib = contributions(k + 1, out_k.astype(cdt))
        for t in range(k + 1, 5):
            # trim acc[t] (margin 4-k) to the new margin (4-k-1) before add
            trim = 1
            a = acc[t]
            acc[t] = a[trim:-trim, trim:-trim, :] + contrib[t]
    out5 = acc[4] + bias_refs[4][:].astype(jnp.float32)
    center = x[_MARGIN : _MARGIN + th, _MARGIN : _MARGIN + w, :].astype(jnp.float32)
    out_ref[0] = (out5 * 0.2 + center).astype(out_ref.dtype)


def _rdb_xla(x, kernels, biases):
    """The equivalent XLA dataflow (mirrors models.blocks fused layout);
    used as the rematerialized backward of the Pallas forward."""
    ch = x.shape[-1]
    gc = kernels[0].shape[-1]
    offsets = [0, ch, ch + gc, ch + 2 * gc, ch + 3 * gc]
    widths = [ch, gc, gc, gc, gc]
    splits = [gc, gc, gc, gc, ch]

    def conv(inp, kern):
        return jax.lax.conv_general_dilated(
            inp, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def contributions(s, inp):
        parts = [kernels[k][:, :, offsets[s] : offsets[s] + widths[s], :] for k in range(s, 5)]
        y = conv(inp, jnp.concatenate(parts, axis=3))
        out = [None] * 5
        start = 0
        for k in range(s, 5):
            out[k] = y[..., start : start + splits[k]]
            start += splits[k]
        return out

    acc = contributions(0, x)
    for k in range(4):
        out_k = jnp.where(acc[k] + biases[k] >= 0, acc[k] + biases[k], 0.2 * (acc[k] + biases[k]))
        contrib = contributions(k + 1, out_k)
        for t in range(k + 1, 5):
            acc[t] = acc[t] + contrib[t]
    return (acc[4] + biases[4]) * 0.2 + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rdb_apply(x, kernels, biases, tile_h=32):
    """Trainable fused RDB: Pallas forward, rematerialized XLA backward.
    kernels/biases are tuples of the 5 reference-shaped conv params."""
    return rdb_forward_pallas(x, list(kernels), list(biases), tile_h=tile_h)


def _rdb_apply_fwd(x, kernels, biases, tile_h):
    return rdb_apply(x, kernels, biases, tile_h), (x, kernels, biases)


def _rdb_apply_bwd(tile_h, residuals, g):
    x, kernels, biases = residuals
    _, vjp_fn = jax.vjp(_rdb_xla, x, kernels, biases)
    return vjp_fn(g)


rdb_apply.defvjp(_rdb_apply_fwd, _rdb_apply_bwd)


# ---------------------------------------------------------------------------
# v2: whole-image batch-grouped kernel (round-2 redesign)
#
# Round-1 postmortem (docs/tpu_performance.md "measured roofline case"):
# the v1 kernel lost 62 vs 11 ms in-model. Three structural causes:
# margin-5 tiles inflate compute ~1.7x and force per-layer halo masking;
# the per-source dots run at K = source width (32 of a 128 K-tile = 25%
# fill); and per-(batch, H-tile) grid cells make M small. v2 fixes all
# three: tiles are whole zero-padded images (border re-zeroing IS the
# 'same'-conv semantics, no masks), the three W-taps are im2col'ed into
# one dot per row-tap (K = 3*cin: 75-100% fill), and each grid cell
# carries several batch images (M = B_t*H*W = 4096).
# ---------------------------------------------------------------------------


def _rdb_v2_kernel(x_ref, *refs, ch: int, gc: int):
    # refs: 5 per-source wide kernels (3, 3*w_s, n_s) — prebuilt OUTSIDE
    # the kernel (Mosaic rejects both lane-axis concat and collapsing a
    # major dim into sublanes, so neither the by-source slice+concat nor
    # the (3, cin, n)->(3cin, n) reshape can happen in-kernel) — then 5
    # biases, the output, and the im2col scratch.
    wide_refs = refs[:5]
    bias_refs = refs[5:10]
    out_ref = refs[10]
    im_ref = refs[11]  # VMEM scratch (B_t, h, w, 3*ch): im2col staging
    seg_ref = refs[12]  # VMEM scratch (B_t, h+2, w+2, gc): padded out_k

    bt, hp, wp, _ = x_ref.shape
    h, w = hp - 2, wp - 2
    cdt = x_ref.dtype

    splits = [gc, gc, gc, gc, ch]

    def conv_source(src_ref, wk_ref):
        """3x3 'same' conv of a zero-padded (B_t, h+2, w+2, cin) REF
        against a (3, 3*cin, n) wide kernel -> (B_t*h*w, n) f32. One dot
        per row-tap; the three column taps fold into K by staging the
        shifted slices into lane ranges of the im2col scratch. Sources
        must be refs: Mosaic rejects W-shifted slices of computed values,
        but handles ref loads at arbitrary offsets."""
        cin = src_ref.shape[-1]
        acc = None
        for dy in range(3):
            for dx in range(3):
                im_ref[:, :, :, dx * cin : (dx + 1) * cin] = src_ref[
                    :, dy : dy + h, dx : dx + w, :
                ]
            im = im_ref[:, :, :, : 3 * cin].reshape(bt * h * w, 3 * cin)
            part = jax.lax.dot_general(
                im,
                wk_ref[dy].astype(cdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        return acc

    def contributions(s, src_ref):
        y = conv_source(src_ref, wide_refs[s])
        out = [None] * 5
        start = 0
        for k in range(s, 5):
            out[k] = y[:, start : start + splits[k]]
            start += splits[k]
        return out

    # borders of the out_k staging buffer stay zero across all four uses
    seg_ref[...] = jnp.zeros((bt, hp, wp, gc), cdt)

    acc = contributions(0, x_ref)
    for k in range(4):
        y = acc[k] + bias_refs[k][:].astype(jnp.float32)
        out_k = jnp.where(y >= 0, y, 0.2 * y).reshape(bt, h, w, splits[k])
        seg_ref[:, 1 : 1 + h, 1 : 1 + w, :] = out_k.astype(cdt)
        contrib = contributions(k + 1, seg_ref)
        for t in range(k + 1, 5):
            acc[t] = acc[t] + contrib[t]
    out5 = (acc[4] + bias_refs[4][:].astype(jnp.float32)).reshape(bt, h, w, ch)
    center = x_ref[:, 1 : 1 + h, 1 : 1 + w, :].astype(jnp.float32)
    out_ref[...] = (out5 * 0.2 + center).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def rdb_forward_pallas_v2(
    x: jax.Array,
    kernels: list[jax.Array],
    biases: list[jax.Array],
    batch_tile: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """v2 fused RDB forward. x: (N, H, W, ch), N % batch_tile == 0."""
    n, h, w, ch = x.shape
    gc = kernels[0].shape[-1]
    assert n % batch_tile == 0, "batch must divide batch_tile"
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # prebuild the by-source wide kernels as (3, 3*w_s, n_s): source s's
    # input-channel rows of every conv k >= s, dx-major K layout matching
    # the kernel's im2col staging order
    offsets = [0, ch, ch + gc, ch + 2 * gc, ch + 3 * gc]
    widths = [ch, gc, gc, gc, gc]
    wides = []
    for s in range(5):
        parts = [
            kernels[k][:, :, offsets[s] : offsets[s] + widths[s], :] for k in range(s, 5)
        ]
        wide = jnp.concatenate(parts, axis=3)  # (3, 3, w_s, n_s)
        wides.append(wide.reshape(3, 3 * widths[s], wide.shape[-1]))

    grid = (n // batch_tile,)
    kern_specs = [
        pl.BlockSpec(k.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        for k in wides
    ]
    bias_specs = [
        pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM) for b in biases
    ]
    return pl.pallas_call(
        functools.partial(_rdb_v2_kernel, ch=ch, gc=gc),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, h + 2, w + 2, ch), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *kern_specs,
            *bias_specs,
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, h, w, ch), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, h, w, 3 * ch), x.dtype),
            pltpu.VMEM((batch_tile, h + 2, w + 2, gc), x.dtype),
        ],
        interpret=interpret,
    )(padded, *wides, *biases)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rdb_apply_v2(x, kernels, biases, batch_tile=4):
    """Trainable v2 fused RDB: Pallas forward, rematerialized XLA backward."""
    return rdb_forward_pallas_v2(x, list(kernels), list(biases), batch_tile=batch_tile)


def _rdb_apply_v2_fwd(x, kernels, biases, batch_tile):
    return rdb_apply_v2(x, kernels, biases, batch_tile), (x, kernels, biases)


def _rdb_apply_v2_bwd(batch_tile, residuals, g):
    x, kernels, biases = residuals
    _, vjp_fn = jax.vjp(_rdb_xla, x, kernels, biases)
    return vjp_fn(g)


rdb_apply_v2.defvjp(_rdb_apply_v2_fwd, _rdb_apply_v2_bwd)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def rdb_forward_pallas(
    x: jax.Array,
    kernels: list[jax.Array],
    biases: list[jax.Array],
    tile_h: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """x: (N, H, W, ch); kernels[k]: (3, 3, ch + k*gc, gc|ch) reference-
    shaped RDB conv kernels; biases to match. H must divide by tile_h."""
    n, h, w, ch = x.shape
    gc = kernels[0].shape[-1]
    assert h % tile_h == 0, "H must be a multiple of tile_h"
    m = _MARGIN
    padded = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)))

    grid = (n, h // tile_h)
    kern_specs = [
        pl.BlockSpec(k.shape, lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM)
        for k in kernels
    ]
    bias_specs = [
        pl.BlockSpec(b.shape, lambda i, j: (0,), memory_space=pltpu.VMEM) for b in biases
    ]

    return pl.pallas_call(
        functools.partial(_rdb_kernel, ch=ch, gc=gc, th=tile_h, w=w, img_h=h),
        grid=grid,
        in_specs=[
            # overlapping H windows: element-indexed block (Mosaic requires
            # ALL dims to be Elements once any is; index_map then returns
            # element offsets for every dim)
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(tile_h + 2 * m),
                    pl.Element(w + 2 * m),
                    pl.Element(ch),
                ),
                lambda i, j: (i, j * tile_h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *kern_specs,
            *bias_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, ch), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, ch), x.dtype),
        interpret=interpret,
    )(padded, *kernels, *biases)
