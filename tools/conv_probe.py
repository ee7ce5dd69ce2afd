"""Probe XLA's TPU conv lowering at the RDB's exact shapes.

The generator runs ~20% MXU across spatial sizes; this measures whether
the 3x3 convs themselves are the ceiling, against two alternatives at
identical math:

  conv    : lax.conv_general_dilated, NHWC, bf16
  im2col  : 9 shifted slices concatenated -> ONE (M, 9*Cin) @ (9*Cin, Cout)
  matmul  : the bare (M, 9*Cin) @ (9*Cin, Cout) GEMM (roofline; no data
            rearrangement)

    python tools/conv_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def chain_time(body, x0, iters=16, label="", flops=0):
    import jax
    from jax import lax

    f = jax.jit(lambda x: lax.fori_loop(0, iters, lambda i, v: body(v), x))
    try:
        jax.block_until_ready(f(x0))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0))
        dt = (time.perf_counter() - t0) / iters
        tf = flops / dt / 1e12 if flops else 0.0
        print(f"{label}: {dt * 1e3:.3f} ms" + (f"  ({tf:.1f} TFLOP/s)" if flops else ""), flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label} FAILED: {str(e).splitlines()[0][:200]}", flush=True)
        return None


def main() -> None:
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    b, h, w, cin, cout = 16, 32, 32, 64, 192
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)).astype(jnp.bfloat16)
    kmat = k.reshape(9 * cin, cout)
    m = b * h * w
    flops = 2 * m * 9 * cin * cout

    def body_conv(v):
        y = lax.conv_general_dilated(
            v, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return v + 1e-6 * y[..., :cin]

    chain_time(body_conv, x, label=f"conv3x3 {cin}->{cout} bf16 ({b}x{h}x{w})", flops=flops)

    pad_spec = ((0, 0), (1, 1), (1, 1), (0, 0))

    def body_im2col(v):
        p = jnp.pad(v, pad_spec)
        cols = jnp.concatenate(
            [p[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
            axis=-1,
        )
        y = lax.dot_general(
            cols.reshape(m, 9 * cin),
            kmat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return v + 1e-6 * y.reshape(b, h, w, cout)[..., :cin]

    chain_time(body_im2col, x, label="im2col+GEMM same math", flops=flops)

    cols0 = jnp.asarray(rng.normal(size=(m, 9 * cin)).astype(np.float32)).astype(jnp.bfloat16)

    def body_matmul(v):
        y = lax.dot_general(
            v, kmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return v + 1e-6 * jnp.pad(y, ((0, 0), (0, 9 * cin - cout)))

    chain_time(body_matmul, cols0, label="bare GEMM roofline (16384x576x192)", flops=flops)

    # the five regrouped RDB convs back to back (the real per-RDB dataflow)
    widths = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]
    ks = [
        jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32)).astype(jnp.bfloat16)
        for ci, co in widths
    ]
    rdb_flops = sum(2 * m * 9 * ci * co for ci, co in widths)

    def body_rdb_convs(v):
        outs = []
        cur = v
        for (ci, co), kk in zip(widths, ks):
            y = lax.conv_general_dilated(
                cur[..., :ci], kk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(y)
            cur = jnp.where(y[..., :cin] >= 0, y[..., :cin], 0.2 * y[..., :cin])
        return v + 1e-6 * outs[-1][..., :cin]

    chain_time(body_rdb_convs, x, label="5 regrouped convs chained", flops=rdb_flops)


if __name__ == "__main__":
    main()
