"""Discriminator families (NHWC Flax modules).

Parity targets:
- VGG-style 128x128 discriminator: ``ESRGAN/model.py:89-141,295-298``
- U-Net discriminator with spectral norm (per-pixel logit map):
  ``Real_ESRGAN/model.py:29-105,325-328`` (clone ``BSRGAN/model.py:91-167``)
- U-Net + token self-attention variant (keeps up1 attention map for
  visualization): ``BSRGAN/model.py:170-279,563-567``
- A-ESRGAN attention-gated U-Net (stores attention layers ly1-3):
  ``A-ESRGAN/model.py:228-352``

Discriminators carry mutable state: ``batch_stats`` (BatchNorm in the VGG
D and the A-ESRGAN gates) and ``spectral`` (power-iteration vectors in the
SN convs). Call with ``train=True`` inside training steps and make those
collections mutable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from srganfd_tpu.models.blocks import Conv, SNConv, TokenSelfAttention, lrelu, out_dtype
from srganfd_tpu.models.registry import register
from srganfd_tpu.ops.resize import resize_bilinear

__all__ = [
    "DiscriminatorVGG128",
    "DiscriminatorUNet",
    "DiscriminatorUNetSA",
    "AttentionUNetDiscriminator",
]


class DiscriminatorVGG128(nn.Module):
    """ESRGAN's VGG-style discriminator: 10 conv(+BN) stages 128^2 -> 4^2,
    then Linear(512*4*4 -> 100 -> 1) producing a scalar logit. Input crops
    must be 128x128 (``ESRGAN/model.py:89-141``). ``channels`` scales the
    reference's 64-base width (the 64/128/256/512 ladder is channels *
    {1,2,4,8}); non-default widths are for tests/small hosts."""

    channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)

        def bn(z):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(z)

        c = self.channels
        x = lrelu(Conv(c, dtype=self.dtype)(x))
        # (features, kernel, stride): alternating k4/s2 downsample, k3/s1.
        stages = [
            (c, 4, 2),
            (c * 2, 3, 1),
            (c * 2, 4, 2),
            (c * 4, 3, 1),
            (c * 4, 4, 2),
            (c * 8, 3, 1),
            (c * 8, 4, 2),
            (c * 8, 3, 1),
            (c * 8, 4, 2),
        ]
        for feats, k, s in stages:
            x = Conv(feats, kernel=k, stride=s, use_bias=False, dtype=self.dtype)(x)
            x = lrelu(bn(x))
        n = x.shape[0]
        # torch flattens NCHW (c-major); transpose to match weight layout
        # conventions when porting checkpoints.
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)
        x = lrelu(nn.Dense(100, dtype=self.dtype, param_dtype=jnp.float32)(x))
        return nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(x).astype(out_dtype(self.dtype))


class DiscriminatorUNet(nn.Module):
    """U-Net discriminator with spectral norm: 3 SN-conv /2 down blocks,
    bilinear-up + SN-conv with skip adds, 3 final convs, per-pixel logit
    map (``Real_ESRGAN/model.py:29-105``)."""

    in_channels: int = 3
    out_channels: int = 1
    channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        c = self.channels
        sn = lambda f, k, s: SNConv(f, kernel=k, stride=s, padding=1, dtype=self.dtype)

        out1 = Conv(c, dtype=self.dtype)(x)
        down1 = lrelu(sn(c * 2, 4, 2)(out1, train))
        down2 = lrelu(sn(c * 4, 4, 2)(down1, train))
        down3 = lrelu(sn(c * 8, 4, 2)(down2, train))

        up = resize_bilinear(down3, (down3.shape[1] * 2, down3.shape[2] * 2))
        up1 = lrelu(sn(c * 4, 3, 1)(up, train)) + down2
        up = resize_bilinear(up1, (up1.shape[1] * 2, up1.shape[2] * 2))
        up2 = lrelu(sn(c * 2, 3, 1)(up, train)) + down1
        up = resize_bilinear(up2, (up2.shape[1] * 2, up2.shape[2] * 2))
        up3 = lrelu(sn(c, 3, 1)(up, train)) + out1

        out = lrelu(sn(c, 3, 1)(up3, train))
        out = lrelu(sn(c, 3, 1)(out, train))
        return Conv(self.out_channels, dtype=self.dtype)(out).astype(out_dtype(self.dtype))


class DiscriminatorUNetSA(nn.Module):
    """U-Net SN discriminator with token self-attention after down2, down3
    and up1 (``BSRGAN/model.py:170-279``). Returns ``(logit_map,
    attn_map_up1)`` — the reference stashes the up1 attention weights for
    ``visualize_attention_map``."""

    in_channels: int = 3
    out_channels: int = 1
    channels: int = 64
    dtype: Any = jnp.float32
    attn_chunk: int = 0  # >0: exact chunked attention (no attn map kept)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        c = self.channels
        sn = lambda f, k, s: SNConv(f, kernel=k, stride=s, padding=1, dtype=self.dtype)
        sa = lambda ch: TokenSelfAttention(ch, dtype=self.dtype, chunk_size=self.attn_chunk)

        out1 = Conv(c, dtype=self.dtype)(x)
        down1 = lrelu(sn(c * 2, 4, 2)(out1, train))
        down2 = lrelu(sn(c * 4, 4, 2)(down1, train))
        down2, _ = sa(c * 4)(down2)
        down3 = lrelu(sn(c * 8, 4, 2)(down2, train))
        down3, _ = sa(c * 8)(down3)

        up = resize_bilinear(down3, (down3.shape[1] * 2, down3.shape[2] * 2))
        up1 = lrelu(sn(c * 4, 3, 1)(up, train))
        up1, attn_map_up1 = sa(c * 4)(up1)
        up1 = up1 + down2
        up = resize_bilinear(up1, (up1.shape[1] * 2, up1.shape[2] * 2))
        up2 = lrelu(sn(c * 2, 3, 1)(up, train)) + down1
        up = resize_bilinear(up2, (up2.shape[1] * 2, up2.shape[2] * 2))
        up3 = lrelu(sn(c, 3, 1)(up, train)) + out1

        out = lrelu(sn(c, 3, 1)(up3, train))
        out = lrelu(sn(c, 3, 1)(out, train))
        out = Conv(self.out_channels, dtype=self.dtype)(out).astype(out_dtype(self.dtype))
        return out, attn_map_up1


class _AddAttn(nn.Module):
    """A-ESRGAN attention gate (``A-ESRGAN/model.py:228-254``): theta(x)
    k2/s2 + phi(g) resized, ReLU, psi -> sigmoid map resized to x, gated
    1x1 conv + BN. Returns (gated features, attention map)."""

    x_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, g: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        theta = Conv(self.x_channels, kernel=2, stride=2, padding=0, use_bias=False, dtype=self.dtype)(x)
        phi = Conv(self.x_channels, kernel=1, padding=0, dtype=self.dtype)(g)
        phi = resize_bilinear(phi, (theta.shape[1], theta.shape[2]))
        f = nn.relu(theta + phi)
        psi = nn.sigmoid(Conv(1, kernel=1, padding=0, dtype=self.dtype)(f))
        psi = resize_bilinear(psi, (x.shape[1], x.shape[2]))
        y = psi * x
        w_y = Conv(self.x_channels, kernel=1, padding=0, dtype=self.dtype)(y)
        w_y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(w_y)
        return w_y, psi


class _UNetCat(nn.Module):
    """Upsample-then-concat merge (``A-ESRGAN/model.py:258-275``)."""

    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip: jax.Array, deep: jax.Array, train: bool = False) -> jax.Array:
        deep = resize_bilinear(deep, (deep.shape[1] * 2, deep.shape[2] * 2))
        deep = lrelu(SNConv(self.dim_out, kernel=3, stride=1, padding=1, dtype=self.dtype)(deep, train))
        offset = deep.shape[1] - skip.shape[1]
        if offset != 0:
            pad = offset // 2
            skip = jnp.pad(skip, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        return jnp.concatenate([skip, deep], axis=-1)


class AttentionUNetDiscriminator(nn.Module):
    """A-ESRGAN attention-gated SN U-Net discriminator
    (``A-ESRGAN/model.py:279-352``). Returns ``(logit_map, (ly1, ly2, ly3))``
    where ly* are the attention maps the reference exposes via
    ``getAttentionLayers``.

    Faithfully keeps the reference's quirk of a 1x1 ``gating`` conv with
    padding=1 (spatially grows the gate by 2 px; harmless because every
    consumer resizes it)."""

    num_in_ch: int = 3
    num_feat: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, tuple[jax.Array, jax.Array, jax.Array]]:
        x = x.astype(self.dtype)
        f = self.num_feat
        sn = lambda feats, k, s, p: SNConv(feats, kernel=k, stride=s, padding=p, dtype=self.dtype)

        x0 = lrelu(Conv(f, dtype=self.dtype)(x))
        x1 = lrelu(sn(f * 2, 3, 2, 1)(x0, train))
        x2 = lrelu(sn(f * 4, 3, 2, 1)(x1, train))
        x3 = lrelu(sn(f * 8, 3, 2, 1)(x2, train))

        gated = lrelu(sn(f * 4, 1, 1, 1)(x3, train))

        attn1, ly1 = _AddAttn(f * 4, self.dtype)(x2, gated, train)
        attn2, ly2 = _AddAttn(f * 2, self.dtype)(x1, gated, train)
        attn3, ly3 = _AddAttn(f, self.dtype)(x0, gated, train)

        y = _UNetCat(f * 4, self.dtype)(attn1, x3, train)
        y = lrelu(sn(f * 4, 3, 1, 1)(y, train))
        y = _UNetCat(f * 2, self.dtype)(attn2, y, train)
        y = lrelu(sn(f * 2, 3, 1, 1)(y, train))
        y = _UNetCat(f, self.dtype)(attn3, y, train)
        y = lrelu(sn(f, 3, 1, 1)(y, train))

        y = lrelu(sn(f, 3, 1, 1)(y, train))
        y = lrelu(sn(f, 3, 1, 1)(y, train))
        out = Conv(1, dtype=self.dtype)(y).astype(out_dtype(self.dtype))
        return out, (ly1, ly2, ly3)


class MultiScaleAttentionDiscriminator(nn.Module):
    """A-ESRGAN paper's multi-scale attention-U-Net discriminator ensemble
    (arXiv:2112.10046 §3.2): independent attention U-Nets judge the image
    at 1x, 1/2x, ... resolutions; per-scale losses are summed by the
    caller. The SR-GAN-FD fork trains only the single-scale variant
    (SURVEY.md §2.2 note) — this restores the paper's design.

    Returns (tuple of per-scale logit maps, full-res scale's attention
    maps)."""

    num_in_ch: int = 3
    num_feat: int = 64
    num_scales: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[tuple[jax.Array, ...], tuple[jax.Array, ...]]:
        x = x.astype(self.dtype)
        outs = []
        attns0: tuple[jax.Array, ...] = ()
        cur = x
        for s in range(self.num_scales):
            out, attns = AttentionUNetDiscriminator(
                self.num_in_ch, self.num_feat, self.dtype, name=f"D{s}"
            )(cur, train)
            outs.append(out)
            if s == 0:
                attns0 = attns
            if s + 1 < self.num_scales:
                cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        return tuple(outs), attns0


# --- factories, reference-compatible names ---------------------------------


@register("discriminator")
def discriminator(**kw: Any) -> DiscriminatorVGG128:
    return DiscriminatorVGG128(**kw)


@register("discriminator_unet")
def discriminator_unet(**kw: Any) -> DiscriminatorUNet:
    kw.setdefault("in_channels", 3)
    kw.setdefault("out_channels", 1)
    kw.setdefault("channels", 64)
    return DiscriminatorUNet(**kw)


@register("discriminator_unet_sa")
def discriminator_unet_sa(**kw: Any) -> DiscriminatorUNetSA:
    return DiscriminatorUNetSA(**kw)


@register("uNetDiscriminatorAesrgan")
@register("discriminator_attention_unet")
def discriminator_attention_unet(**kw: Any) -> AttentionUNetDiscriminator:
    return AttentionUNetDiscriminator(**kw)


@register("discriminator_attention_unet_ms")
def discriminator_attention_unet_ms(**kw: Any) -> MultiScaleAttentionDiscriminator:
    return MultiScaleAttentionDiscriminator(**kw)
