"""Profile the headline train step on the real TPU.

Run (one TPU process at a time!):
    python tools/tpu_profile.py [--trace-dir /tmp/trace]

Prints per-phase timings (degradation, G fwd, D fwd, full GAN step) and
writes a jax.profiler trace for TensorBoard/Perfetto when --trace-dir is
given — the input for deciding where a Pallas kernel beats XLA.

Measurement notes:
- every timed call gets a DIFFERENT input (cycled from a small pool) so
  a remote executor cannot serve a memoized result for repeated identical
  (executable, args) pairs — timing the same buffers through the axon
  tunnel reported a 23-RRDB forward at 0.09 ms, which is physically
  impossible (~0.5 TFLOP of conv work);
- each phase is wrapped in try/except so a failing Pallas candidate does
  not lose the XLA numbers (stdout is flushed per line).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def timeit(fns, warmup=2, iters=10):
    """fns: list of zero-arg thunks cycled per iteration (distinct inputs)."""
    import jax

    out = None
    for i in range(warmup):
        out = fns[i % len(fns)]()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fns[i % len(fns)]()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gt-size", type=int, default=128)
    ap.add_argument("--pool", type=int, default=4, help="distinct inputs cycled per phase")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    def say(msg: str) -> None:
        print(msg, flush=True)

    say(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b, s = args.batch, args.gt_size
    npool = args.pool
    gts = [
        jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32)) for _ in range(npool)
    ]
    lrs = [
        jnp.asarray(rng.uniform(size=(b, s // 4, s // 4, 3)).astype(np.float32))
        for _ in range(npool)
    ]
    gt, lr = gts[0], lrs[0]

    cfg = get_config("bsrgan").replace(
        upscale_factor=4,
        g_arch="bsrgan_x4",
        g_kwargs={"scan_blocks": True},
        gt_image_size=s,
        batch_size=b,
        content_weight=(),
        compute_dtype="bfloat16",
    )
    trainer = Trainer(cfg, steps_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)

    # generator forward (inference path)
    try:
        t_fwd = timeit([lambda x=x: trainer.eval_sr(state.g_params, x) for x in lrs])
        mps = b * (s // 4) ** 2 / t_fwd / 1e6
        say(f"G forward: {t_fwd * 1e3:.2f} ms  ({mps:.1f} MP/s input, x4)")
    except Exception as e:  # noqa: BLE001
        say(f"G forward FAILED: {e}")

    # discriminator forward (SN U-Net at GT resolution)
    try:
        d_apply = jax.jit(
            lambda p, v, x: trainer._d_apply(p, v, x, update_stats=False)[0]
        )
        t_dfwd = timeit([lambda x=x: d_apply(state.d_params, state.d_vars, x) for x in gts])
        say(f"D forward ({s}px): {t_dfwd * 1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"D forward FAILED: {e}")

    # full GAN train step
    def step(x, y):
        nonlocal state
        state, metrics = trainer.train_step(state, x, y)
        return metrics["g_loss"]

    try:
        t_step = timeit(
            [lambda x=x, y=y: step(x, y) for x, y in zip(gts, lrs)], warmup=3, iters=20
        )
        say(f"GAN train step: {t_step * 1e3:.2f} ms  ({1 / t_step:.2f} steps/s)")
    except Exception as e:  # noqa: BLE001
        say(f"GAN train step FAILED: {e}")

    # degradation chain
    try:
        from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch

        plans = [plan_bsrgan_batch(rng, b, 4) for _ in range(npool)]
        t_deg = timeit(
            [lambda x=x, p=p: apply_bsrgan_batch(x, p) for x, p in zip(gts, plans)]
        )
        say(f"BSRGAN degradation (gt {s}px, batch {b}): {t_deg * 1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"degradation FAILED: {e}")

    # Pallas candidates vs their XLA counterparts
    from srganfd_tpu.ops import filters
    from srganfd_tpu.ops.kernels import fspecial_gaussian, pad_kernel

    blurs = [
        jnp.asarray(
            np.stack([pad_kernel(fspecial_gaussian(21, 2.0 + 0.1 * i), 25)] * b).astype(
                np.float32
            )
        )
        for i in range(npool)
    ]
    try:
        t_f_xla = timeit([lambda x=x, k=k: filters.filter2d(x, k) for x, k in zip(gts, blurs)])
        say(f"filter2d 25x25 XLA (batch {b}, {s}px): {t_f_xla * 1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"filter2d XLA FAILED: {e}")
    try:
        from srganfd_tpu.ops.pallas.filter2d import filter2d_pallas

        t_f_pl = timeit(
            [lambda x=x, k=k: filter2d_pallas(x, k) for x, k in zip(gts, blurs)]
        )
        say(f"filter2d 25x25 Pallas (batch {b}, {s}px): {t_f_pl * 1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"filter2d Pallas FAILED: {e}")

    from srganfd_tpu.models.blocks import ResidualDenseBlock

    block = ResidualDenseBlock(64, 32)
    xbs = [
        jnp.asarray(rng.uniform(size=(b, 32, 32, 64)).astype(np.float32))
        for _ in range(npool)
    ]
    params = block.init(jax.random.PRNGKey(0), xbs[0])["params"]
    kerns = tuple(jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5))
    biases = tuple(jnp.asarray(params[f"conv{k}_bias"]) for k in range(5))
    fused = jax.jit(lambda p, z: block.apply({"params": p}, z))
    try:
        t_rdb_xla = timeit([lambda z=z: fused(params, z) for z in xbs])
        say(f"RDB fwd XLA (batch {b}, 32px, 64/32ch): {t_rdb_xla * 1e3:.3f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"RDB XLA FAILED: {e}")
    try:
        from srganfd_tpu.ops.pallas.rdb import rdb_forward_pallas

        t_rdb_pl = timeit(
            [lambda z=z: rdb_forward_pallas(z, kerns, biases, tile_h=32) for z in xbs]
        )
        say(f"RDB fwd Pallas (batch {b}, 32px, 64/32ch): {t_rdb_pl * 1e3:.3f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"RDB Pallas FAILED: {e}")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        for i in range(3):
            step(gts[i % npool], lrs[i % npool])
        jax.block_until_ready(state.g_params)
        jax.profiler.stop_trace()
        say(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
