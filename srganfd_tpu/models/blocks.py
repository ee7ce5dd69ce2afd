"""Shared Flax building blocks (NHWC, bf16-friendly).

Parity notes reference the PyTorch originals:
- ResidualDenseBlock / RRDB: ``ESRGAN/model.py:29-86`` (identical clones in
  the other three folders).
- Kaiming-normal x0.1 conv init: ``ESRGAN/model.py:237-243``.
- Spectral-norm convs: ``Real_ESRGAN/model.py:29-105`` (torch
  ``spectral_norm`` with one power iteration per step).
- Token self-attention: ``BSRGAN/model.py:388-402`` (nn.MultiheadAttention
  over flattened HW tokens, 8 heads, returning head-averaged weights).
- Transformer encoder: torch ``nn.TransformerEncoderLayer`` defaults
  (post-LN, ff=2048, ReLU, dropout 0.1) as used by ``BSRGANtrans``
  (``A-ESRGAN/model.py:667-680``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# Kaiming-normal (torch default: gain sqrt(2), fan_in) scaled by 0.1 =>
# variance 2/fan_in * 0.01.
kaiming_x01 = nn.initializers.variance_scaling(0.02, "fan_in", "normal")
kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def lrelu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class Conv(nn.Module):
    """3x3/s1 'same' conv by default; torch-style explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None  # None => torch p = k//2 for odd k, 1 for k=4
    use_bias: bool = True
    scaled_init: bool = False  # kaiming x0.1 (generator convention)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if pad is None:
            pad = 1 if self.kernel in (3, 4) else self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=kaiming_x01 if self.scaled_init else nn.initializers.lecun_normal(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class SNConv(nn.Module):
    """Conv2d wrapped in spectral normalization (one power iteration per
    training step, matching torch's ``spectral_norm`` default).

    The left-singular-vector estimate ``u`` lives in the ``spectral``
    variable collection; pass ``update_stats=True`` during training steps.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.he_uniform(),
            (self.kernel, self.kernel, in_ch, self.features),
            jnp.float32,
        )
        # torch views the weight as (out, in*k*k); ours is (k,k,in,out).
        w = k.reshape(-1, self.features).T  # (out, in*k*k)
        u_var = self.variable(
            "spectral", "u", lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,))
        )
        u = u_var.value
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        sigma = jax.lax.stop_gradient(u_new) @ w @ jax.lax.stop_gradient(v)
        k_sn = (k / sigma).astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k_sn,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + b.astype(self.dtype)
        return out


class ResidualDenseBlock(nn.Module):
    """5-conv dense block, LeakyReLU(0.2), 0.2-scaled residual
    (ESRGAN/model.py:29-60)."""

    channels: int
    growth_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def c(features):
            return Conv(features, scaled_init=True, dtype=self.dtype)

        out1 = lrelu(c(self.growth_channels)(x))
        out2 = lrelu(c(self.growth_channels)(jnp.concatenate([x, out1], -1)))
        out3 = lrelu(c(self.growth_channels)(jnp.concatenate([x, out1, out2], -1)))
        out4 = lrelu(c(self.growth_channels)(jnp.concatenate([x, out1, out2, out3], -1)))
        out5 = c(self.channels)(jnp.concatenate([x, out1, out2, out3, out4], -1))
        return out5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3 RDBs + 0.2-scaled residual
    (ESRGAN/model.py:63-86)."""

    channels: int
    growth_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = ResidualDenseBlock(self.channels, self.growth_channels, self.dtype)(x)
        out = ResidualDenseBlock(self.channels, self.growth_channels, self.dtype)(out)
        out = ResidualDenseBlock(self.channels, self.growth_channels, self.dtype)(out)
        return out * 0.2 + x


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel-unshuffle matching torch ``nn.PixelUnshuffle``: output
    channel order is (c, fh, fw)."""
    if factor == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h', w', c, fh, fw
    return x.reshape(n, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel-shuffle (inverse of the above, torch channel order)."""
    if factor == 1:
        return x
    n, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(n, h, w, co, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * factor, w * factor, co)


class TokenSelfAttention(nn.Module):
    """Multi-head self-attention over flattened HW tokens; returns
    (output, head-averaged attention weights) like torch
    ``nn.MultiheadAttention`` (BSRGAN/model.py:388-402).

    O((HW)^2) — the reference's known memory hot spot; keep inputs small.
    """

    channels: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c).astype(self.dtype)
        d = c // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            (self.num_heads, d), axis=-1, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("query")(tokens)
        k = dense("key")(tokens)
        v = dense("value")(tokens)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(d).astype(self.dtype)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", weights, v)
        out = nn.DenseGeneral(
            c, axis=(-2, -1), dtype=self.dtype, param_dtype=jnp.float32, name="out"
        )(out)
        avg_weights = jnp.mean(weights, axis=1)  # (n, q, k), torch-style head avg
        return out.reshape(n, h, w, c), avg_weights


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` defaults: post-LN, MHA, ReLU
    MLP with dim_feedforward=2048, dropout 0.1 (off when deterministic)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            deterministic=True,
        )(x, x)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x + attn)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x + y)
