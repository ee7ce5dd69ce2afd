"""Post-training int8 quantization for generator serving.

The reference serves fp32 torch modules (``ESRGAN/inference.py:39-74``)
and has no quantized path. On TPU the MXU executes s8 x s8 -> s32 at
twice the bf16 MAC rate (v5e: 394 vs 197 TOPS) and int8 activations
move a quarter of the f32 HBM bytes, so an int8 path is the natural
serving-speed lever for the conv trunk. This module implements symmetric
post-training quantization (PTQ):

- **weights**: per-output-channel symmetric int8, scale = absmax/127
  over the (kh, kw, cin) fan-in. Computed at trace time from the f32
  params (one cheap pass over the kernel; for a frozen serving params
  tree XLA hoists it out of any scan body loop-invariantly).
- **activations**: dynamic per-tensor symmetric int8 (scale from the
  live tensor's absmax, a VPU reduction). No calibration pass needed;
  the cost is one extra reduction + elementwise pass per conv input,
  negligible next to the conv.

Only the RDB trunk is quantized (~95% of generator FLOPs; see
``models.blocks.ResidualDenseBlock``); head/upsample/tail convs stay in
the configured compute dtype, confining quantization error to the
network's most redundant part. Accumulation is exact int32 inside the
conv and f32 across the dense-block source sums.

Opt-in and measurement-gated like every alternative execution path in
this repo (``docs/tpu_performance.md``): quality delta and speedup are
workload facts to be measured, not assumed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_symmetric(
    x: jax.Array, channel_axis: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization: returns ``(q, scale)`` with
    ``q = round(x / scale)`` clipped to [-127, 127].

    ``channel_axis=None`` -> one per-tensor scale (shape ``()``);
    otherwise per-channel scales along ``channel_axis`` (shape keeps
    that axis, size-1 elsewhere) so ``q * scale`` broadcasts back.
    """
    xf = x.astype(jnp.float32)
    if channel_axis is None:
        absmax = jnp.max(jnp.abs(xf))
    else:
        axes = tuple(a for a in range(x.ndim) if a != channel_axis % x.ndim)
        absmax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize(q: jax.Array, scale: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_symmetric` (up to rounding)."""
    return q.astype(jnp.float32) * scale


def qconv2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int = 1,
    padding: int = 1,
) -> jax.Array:
    """int8 x int8 -> int32 'same' convolution with f32 dequantized output.

    ``x``: NHWC activations (any float dtype), quantized per-tensor on
    the fly; ``kernel``: HWIO f32 weights, quantized per-output-channel.
    The conv accumulates exactly in int32 on the MXU; the only error is
    the two quantization roundings. Output is f32 (callers cast).
    """
    xq, xs = quantize_symmetric(x, channel_axis=None)
    kq, ks = quantize_symmetric(kernel, channel_axis=3)
    y = jax.lax.conv_general_dilated(
        xq,
        kq,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # ks is (1, 1, 1, O); fold both scales into one broadcast multiply.
    return y.astype(jnp.float32) * (xs * ks.reshape(1, 1, 1, -1))
