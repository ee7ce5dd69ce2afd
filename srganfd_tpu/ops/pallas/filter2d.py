"""Per-sample batched 2-D filtering as a Pallas TPU kernel.

Replaces the XLA lowering of ``ops.filters.filter2d`` (depthwise conv with
N*C feature groups, ``Real_ESRGAN/imgproc.py:1092-1124`` semantics).

Design (v3, the one that survived hardware):
- One grid step per batch element; the padded image, that sample's banded
  kernel matrices, and the output tile live in VMEM.
- Images are transposed to (N, C, H, W) so W occupies the lane dimension.
  The public NHWC layout would put C=3 in the lanes, padding every block
  3->128 lanes — a 42x VMEM blow-up that OOM'd scoped VMEM on v5e.
- The K*K taps run on the MXU as K banded matmuls: for each kernel row
  ``dy``, the H-shifted image tile (C*H, Wp) contracts its padded W axis
  with a banded Toeplitz matrix (Wp, W) of that row (see
  ``ops.filters.banded_row_matrices``). The earlier formulation — K*K
  statically shifted multiply-adds on the VPU — generated 208 MB of
  register-allocator spill slots at K=25 and failed to compile.

Correctness is pinned against the XLA implementation (tests run the
interpreter on CPU). Use ``interpret=True`` off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srganfd_tpu.ops.filters import banded_row_matrices

__all__ = ["filter2d_pallas"]


def _filter_kernel(img_ref, band_ref, out_ref, *, ksize: int, h: int, w: int):
    """One batch element: img_ref (1, C, H+K-1, W+K-1) CHW-padded input,
    band_ref (1, K, W+K-1, W) banded row matrices, out_ref (1, C, H, W)."""
    c = out_ref.shape[1]
    acc = jnp.zeros((c * h, w), dtype=jnp.float32)
    for dy in range(ksize):
        sl = img_ref[0, :, dy : dy + h, :].astype(jnp.float32)  # (C, H, Wp)
        acc = acc + jax.lax.dot_general(
            sl.reshape(c * h, -1),
            band_ref[0, dy].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc.reshape(c, h, w).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def filter2d_pallas(images: jax.Array, kernels: jax.Array, interpret: bool = False) -> jax.Array:
    """images: (N, H, W, C); kernels: (N, K, K) with K odd. Reflect-101
    boundary, matching ``ops.filters.filter2d``."""
    n, h, w, c = images.shape
    k = kernels.shape[-1]
    pad = k // 2
    chw = jnp.transpose(images, (0, 3, 1, 2))
    padded = jnp.pad(chw, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    # bands[n, dy, wp, w] = kernels[n, dy, wp - w] (zero outside the band)
    bands = banded_row_matrices(jnp.transpose(kernels, (0, 2, 1)).astype(jnp.float32), w)

    out = pl.pallas_call(
        functools.partial(_filter_kernel, ksize=k, h=h, w=w),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, c, h + 2 * pad, w + 2 * pad),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, w + 2 * pad, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), images.dtype),
        interpret=interpret,
    )(padded, bands)
    return jnp.transpose(out, (0, 2, 3, 1))
