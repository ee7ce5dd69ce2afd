"""Per-sample batched 2-D filtering as a Pallas TPU kernel.

Replaces the XLA lowering of ``ops.filters.filter2d`` (depthwise conv with
N*C feature groups, ``Real_ESRGAN/imgproc.py:1092-1124`` semantics): one
grid step per batch element; the padded image block and that sample's
KxK kernel live in VMEM; taps accumulate as shifted multiply-adds on the
VPU with full f32 accumulation.

Layout: images are transposed to (N, C, H, W) before the kernel so the
W axis (a multiple of 128 for training crops) occupies the lane dimension
and H the sublanes. Keeping the public NHWC layout inside the kernel puts
C=3 in the lanes, padding every block 3->128 lanes — a 42x VMEM blow-up
that OOMs scoped VMEM on real hardware (38.5M vs the 16M limit) for a
batch-16 128px block.

Correctness is pinned against the XLA implementation (tests run the
interpreter on CPU). Use ``interpret=True`` off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["filter2d_pallas"]


def _filter_kernel(img_ref, kern_ref, out_ref, *, ksize: int, h: int, w: int):
    """One batch element: img_ref (1, C, H+K-1, W+K-1), kern_ref (1, K, K),
    out_ref (1, C, H, W)."""
    img = img_ref[0]
    acc = jnp.zeros_like(out_ref[0], dtype=jnp.float32)
    # K*K static taps: shifted windows scaled by the scalar kernel entry.
    for dy in range(ksize):
        for dx in range(ksize):
            tap = kern_ref[0, dy, dx]
            acc = acc + tap.astype(jnp.float32) * img[:, dy : dy + h, dx : dx + w].astype(
                jnp.float32
            )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def filter2d_pallas(images: jax.Array, kernels: jax.Array, interpret: bool = False) -> jax.Array:
    """images: (N, H, W, C); kernels: (N, K, K) with K odd. Reflect-101
    boundary, matching ``ops.filters.filter2d``."""
    n, h, w, c = images.shape
    k = kernels.shape[-1]
    pad = k // 2
    chw = jnp.transpose(images, (0, 3, 1, 2))
    padded = jnp.pad(chw, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")

    out = pl.pallas_call(
        functools.partial(_filter_kernel, ksize=k, h=h, w=w),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, c, h + 2 * pad, w + 2 * pad),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), images.dtype),
        interpret=interpret,
    )(padded, kernels)
    return jnp.transpose(out, (0, 2, 3, 1))
