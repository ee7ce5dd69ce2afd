"""Generator families (NHWC Flax modules).

Parity targets:
- ``RRDBNet`` x1/x2/x4/x8: ``ESRGAN/model.py:144-243,301-322``
- ``BSRGAN`` x2/x4 (+ ``bsrgansa`` alias — the reference's self-attention
  variant never actually inserts attention, ``BSRGAN/model.py:405-496``):
  ``BSRGAN/model.py:311-384,570-587``
- ``BSRGANtrans``: BSRGAN trunk + stride-2 downsample -> 2-layer
  transformer over HW tokens -> upsample: ``A-ESRGAN/model.py:643-753``
- Real-ESRGAN ``RRDBNet`` with pixel-unshuffle front: ``Real_ESRGAN/model.py:179-263,331-334``
- A-ESRGAN ``Generator_RPA`` (residual pixel-attention) and
  ``Generator_RRDB`` (pixel-unshuffle RRDB): ``A-ESRGAN/model.py:87-221``

All generators clamp outputs to [0,1] exactly where the reference does.
Upsampling uses nearest-neighbor broadcast (torch ``F.interpolate`` nearest).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from srganfd_tpu.models.blocks import (
    RRDB,
    Conv,
    TransformerEncoderLayer,
    lrelu,
    out_dtype,
    pixel_unshuffle,
    run_trunk,
)
from srganfd_tpu.models.registry import register
from srganfd_tpu.ops.resize import upsample_nearest

__all__ = [
    "RRDBNet",
    "BSRGAN",
    "BSRGANtrans",
    "RealESRGANNet",
    "GeneratorRPA",
    "GeneratorRRDB",
]


class RRDBNet(nn.Module):
    """ESRGAN generator: conv1 -> 23xRRDB -> conv2 + skip -> per-x2
    nearest-upsample+conv stages -> conv3 -> conv4 -> clamp."""

    in_channels: int = 3
    out_channels: int = 3
    channels: int = 64
    growth_channels: int = 32
    num_blocks: int = 23
    upscale_factor: int = 4
    dtype: Any = jnp.float32
    scan_blocks: bool = False
    remat: bool = False
    pallas: bool = False  # fused VMEM-resident RDB kernel (benchmark-gated)
    superpixel: bool = False  # 2x2-block feature-packed trunk convs (full MXU lanes)
    rdb_fused: bool = True  # False = the reference's literal 5-conv dataflow
    quant: bool = False  # int8 PTQ trunk (serving only; ops/quant.py)

    @nn.compact
    def __call__(self, x: jax.Array, trunk_fn: Any = None) -> jax.Array:
        # trunk_fn: externally-scheduled trunk (pipeline parallelism,
        # parallel/pipeline.py) applied to out1 in place of run_trunk;
        # non-trunk layer names are unaffected (the trunk is an
        # explicitly-named submodule outside the auto-name counters).
        x = x.astype(self.dtype)
        conv = lambda f: Conv(f, scaled_init=True, dtype=self.dtype)
        out1 = conv(self.channels)(x)
        if trunk_fn is not None:
            out = trunk_fn(out1)
        else:
            out = run_trunk(out1, self.channels, self.growth_channels, self.num_blocks,
                            self.dtype, self.scan_blocks, self.remat, self.pallas,
                            superpixel=self.superpixel, fused=self.rdb_fused,
                            quant=self.quant)
        out = out1 + conv(self.channels)(out)
        for _ in range(int(math.log2(self.upscale_factor)) if self.upscale_factor > 1 else 0):
            out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        out = lrelu(conv(self.channels)(out))
        out = conv(self.out_channels)(out)
        return jnp.clip(out, 0.0, 1.0).astype(out_dtype(self.dtype))


class BSRGAN(nn.Module):
    """BSRGAN generator (``BSRGAN/model.py:311-384``): RRDBNet topology
    where upsampling1 always runs and upsampling2 only at x4."""

    in_channels: int = 3
    out_channels: int = 3
    channels: int = 64
    growth_channels: int = 32
    num_rrdb: int = 23
    upscale_factor: int = 4
    dtype: Any = jnp.float32
    scan_blocks: bool = False
    remat: bool = False
    pallas: bool = False  # fused VMEM-resident RDB kernel (benchmark-gated)
    superpixel: bool = False  # 2x2-block feature-packed trunk convs (full MXU lanes)
    rdb_fused: bool = True  # False = the reference's literal 5-conv dataflow
    quant: bool = False  # int8 PTQ trunk (serving only; ops/quant.py)

    @nn.compact
    def __call__(self, x: jax.Array, trunk_fn: Any = None) -> jax.Array:
        # trunk_fn: see RRDBNet.__call__ (pipeline parallelism hook).
        x = x.astype(self.dtype)
        conv = lambda f: Conv(f, scaled_init=True, dtype=self.dtype)
        out1 = conv(self.channels)(x)
        if trunk_fn is not None:
            out = trunk_fn(out1)
        else:
            out = run_trunk(out1, self.channels, self.growth_channels, self.num_rrdb,
                            self.dtype, self.scan_blocks, self.remat, self.pallas,
                            superpixel=self.superpixel, fused=self.rdb_fused,
                            quant=self.quant)
        out = out1 + conv(self.channels)(out)
        out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        if self.upscale_factor == 4:
            out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        out = lrelu(conv(self.channels)(out))
        out = conv(self.out_channels)(out)
        return jnp.clip(out, 0.0, 1.0).astype(out_dtype(self.dtype))


class BSRGANtrans(nn.Module):
    """BSRGAN + transformer bottleneck (``A-ESRGAN/model.py:643-753``):
    after the RRDB trunk, stride-2 conv downsample, 2 transformer encoder
    layers over flattened HW tokens (d_model=channels, 4 heads), nearest
    x2 upsample back, then the BSRGAN head. O((HW/4)^2) attention by
    default — keep crops small, as the reference does — or set
    ``attn_chunk`` > 0 for exact chunked attention with O(chunk*HW/4)
    score memory (large-frame inference the reference cannot do).

    ``ring_axis``/``ring_halo``: context-parallel serving — when the
    frame's H axis is sharded over a mesh axis with halo rows
    (``parallel/spatial.py``), the bottleneck attention runs as RING
    attention over that axis so every token still attends to the whole
    frame exactly (K/V blocks rotate over ICI); halo-derived tokens
    (``ring_halo``//2 feature rows each side after the stride-2
    downsample) are masked from the key set, since their exact copies are
    a neighbor shard's interior tokens. ``ring_halo`` must be even and
    the per-shard row count even."""

    in_channels: int = 3
    out_channels: int = 3
    channels: int = 64
    growth_channels: int = 32
    num_rrdb: int = 23
    upscale_factor: int = 4
    dtype: Any = jnp.float32
    scan_blocks: bool = False
    remat: bool = False
    superpixel: bool = False
    rdb_fused: bool = True
    attn_chunk: int = 0
    ring_axis: str | None = None  # context parallelism (see docstring)
    ring_halo: int = 0
    # cp collective pattern: "ring" (ppermute K/V, any device count) or
    # "ulysses" (head-sharded all-to-all, capped at 4-way by the 4 heads)
    cp_backend: str = "ring"
    quant: bool = False  # int8 PTQ trunk (serving only; ops/quant.py)

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True, trunk_fn: Any = None
    ) -> jax.Array:
        # trunk_fn: see RRDBNet.__call__ (pipeline parallelism hook).
        x = x.astype(self.dtype)
        conv = lambda f: Conv(f, scaled_init=True, dtype=self.dtype)
        out1 = conv(self.channels)(x)
        if trunk_fn is not None:
            out = trunk_fn(out1)
        else:
            out = run_trunk(out1, self.channels, self.growth_channels, self.num_rrdb,
                            self.dtype, self.scan_blocks, self.remat,
                            superpixel=self.superpixel, fused=self.rdb_fused,
                            quant=self.quant)

        out = lrelu(Conv(self.channels, stride=2, scaled_init=True, dtype=self.dtype)(out))
        n, h2, w2, c = out.shape
        tokens = out.reshape(n, h2 * w2, c)
        kv_valid = None
        if self.ring_axis is not None:
            hf = self.ring_halo // 2  # halo rows in the stride-2 token grid
            row = jnp.arange(h2 * w2) // w2
            kv_valid = (row >= hf) & (row < h2 - hf)
        for _ in range(2):
            tokens = TransformerEncoderLayer(
                c, 4, dtype=self.dtype, attn_chunk=self.attn_chunk,
                ring_axis=self.ring_axis, cp_backend=self.cp_backend,
            )(tokens, deterministic, kv_valid=kv_valid)
        out = tokens.reshape(n, h2, w2, c)
        out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))

        out = out1 + conv(self.channels)(out)
        out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        if self.upscale_factor == 4:
            out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        out = lrelu(conv(self.channels)(out))
        out = conv(self.out_channels)(out)
        return jnp.clip(out, 0.0, 1.0).astype(out_dtype(self.dtype))


class RealESRGANNet(nn.Module):
    """Real-ESRGAN generator (``Real_ESRGAN/model.py:179-263``): pixel-
    unshuffle front (x2 -> unshuffle 2, x1 -> unshuffle 4), RRDB trunk,
    always two nearest-x2 upsample stages."""

    in_channels: int = 3
    out_channels: int = 3
    channels: int = 64
    growth_channels: int = 32
    num_rrdb: int = 23
    upscale_factor: int = 4
    dtype: Any = jnp.float32
    scan_blocks: bool = False
    remat: bool = False
    superpixel: bool = False
    rdb_fused: bool = True
    quant: bool = False  # int8 PTQ trunk (serving only; ops/quant.py)

    @nn.compact
    def __call__(self, x: jax.Array, trunk_fn: Any = None) -> jax.Array:
        # trunk_fn: see RRDBNet.__call__ (pipeline parallelism hook).
        x = x.astype(self.dtype)
        if self.upscale_factor == 2:
            x = pixel_unshuffle(x, 2)
        elif self.upscale_factor == 1:
            x = pixel_unshuffle(x, 4)
        conv = lambda f: Conv(f, scaled_init=True, dtype=self.dtype)
        out1 = conv(self.channels)(x)
        if trunk_fn is not None:
            out = trunk_fn(out1)
        else:
            out = run_trunk(out1, self.channels, self.growth_channels, self.num_rrdb,
                            self.dtype, self.scan_blocks, self.remat,
                            superpixel=self.superpixel, fused=self.rdb_fused,
                            quant=self.quant)
        out = out1 + conv(self.channels)(out)
        out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        out = lrelu(conv(self.channels)(upsample_nearest(out, 2)))
        out = lrelu(conv(self.channels)(out))
        out = conv(self.out_channels)(out)
        return jnp.clip(out, 0.0, 1.0).astype(out_dtype(self.dtype))


class _RPABlock(nn.Module):
    """Residual pixel-attention block (``A-ESRGAN/model.py:112-140``)."""

    num_feat: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        z = lrelu(Conv(self.num_feat * 2, kernel=1, padding=0, scaled_init=True, dtype=self.dtype)(x))
        z = lrelu(Conv(self.num_feat * 4, kernel=1, padding=0, scaled_init=True, dtype=self.dtype)(z))
        z = Conv(self.num_feat, scaled_init=True, dtype=self.dtype)(z)
        z = nn.sigmoid(z)
        z = x * z + x
        z = Conv(self.num_feat, dtype=self.dtype)(z)
        return lrelu(z)


class _PAUpsample(nn.Module):
    """Pixel-attention upsampling block ``US`` (``A-ESRGAN/model.py:87-109``)."""

    num_feat: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x_ = lrelu(Conv(self.num_feat, kernel=1, padding=0, dtype=self.dtype)(upsample_nearest(x, self.scale)))
        z = nn.sigmoid(Conv(self.num_feat, kernel=1, padding=0, dtype=self.dtype)(x_))
        z = x_ * z + x_
        return lrelu(Conv(self.num_feat, dtype=self.dtype)(z))


class GeneratorRPA(nn.Module):
    """A-ESRGAN residual pixel-attention generator
    (``A-ESRGAN/model.py:143-175``). No output clamp (matches reference)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 2
    num_feat: int = 64
    num_block: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        z = lrelu(Conv(self.num_feat, dtype=self.dtype)(x))
        z_ = z
        for _ in range(self.num_block):
            z_ = _RPABlock(self.num_feat, self.dtype)(z_)
        z = z + z_
        for _ in range(math.ceil(math.log2(self.scale))):
            z = _PAUpsample(self.num_feat, 2, self.dtype)(z)
        z = lrelu(Conv(self.num_feat // 2, dtype=self.dtype)(z))
        return Conv(self.num_out_ch, dtype=self.dtype)(z).astype(out_dtype(self.dtype))


class GeneratorRRDB(nn.Module):
    """A-ESRGAN pixel-unshuffle RRDB generator
    (``A-ESRGAN/model.py:180-215``): unshuffle(4/scale) front, RRDB trunk,
    two fixed nearest-x2 upsample stages, no clamp."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        z = pixel_unshuffle(x, 4 // self.scale)
        conv = lambda f: Conv(f, dtype=self.dtype)
        z = conv(self.num_feat)(z)
        z_ = z
        for _ in range(self.num_block):
            z_ = RRDB(self.num_feat, self.num_grow_ch, self.dtype)(z_)
        z = z + conv(self.num_feat)(z_)
        z = lrelu(conv(self.num_feat)(upsample_nearest(z, 2)))
        z = lrelu(conv(self.num_feat)(upsample_nearest(z, 2)))
        z = conv(self.num_out_ch)(lrelu(conv(self.num_feat)(z)))
        return z.astype(out_dtype(self.dtype))


# --- factories, reference-compatible names ---------------------------------


def _rrdbnet(upscale: int):
    def factory(**kw: Any) -> RRDBNet:
        return RRDBNet(upscale_factor=upscale, **kw)

    return factory


register("rrdbnet_x1")(_rrdbnet(1))
register("rrdbnet_x2")(_rrdbnet(2))
register("rrdbnet_x4")(_rrdbnet(4))
register("rrdbnet_x8")(_rrdbnet(8))


@register("bsrgan_x2")
def bsrgan_x2(**kw: Any) -> BSRGAN:
    return BSRGAN(upscale_factor=2, **kw)


@register("bsrgan_x4")
def bsrgan_x4(**kw: Any) -> BSRGAN:
    return BSRGAN(upscale_factor=4, **kw)


@register("bsrgansa_x2")
def bsrgansa_x2(**kw: Any) -> BSRGAN:
    """The reference's ``BSRGANsa`` never inserts its attention modules
    (SURVEY.md §2.10; ``BSRGAN/model.py:405-496``) — numerically it IS
    BSRGAN, so this is an explicit alias rather than a replicated bug."""
    return BSRGAN(upscale_factor=2, **kw)


@register("bsrgantrans_x2")
def bsrgantrans_x2(**kw: Any) -> BSRGANtrans:
    return BSRGANtrans(upscale_factor=2, **kw)


@register("realesrgan_x4")
@register("rrdbnet_realesrgan_x4")
def realesrgan_x4(**kw: Any) -> RealESRGANNet:
    return RealESRGANNet(upscale_factor=4, **kw)


@register("realesrgan_x2")
def realesrgan_x2(**kw: Any) -> RealESRGANNet:
    return RealESRGANNet(upscale_factor=2, **kw)


@register("gen_rpa2x")
def gen_rpa2x(**kw: Any) -> GeneratorRPA:
    return GeneratorRPA(scale=2, **kw)


@register("gen_rrdb2x")
def gen_rrdb2x(**kw: Any) -> GeneratorRRDB:
    return GeneratorRRDB(scale=2, **kw)
