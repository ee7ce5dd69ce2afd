"""Profile the headline train step on the real TPU.

Run (one TPU process at a time!):
    python tools/tpu_profile.py [--trace-dir /tmp/trace]

Prints per-phase timings (degradation, G fwd, full GAN step) and writes a
jax.profiler trace for TensorBoard/Perfetto when --trace-dir is given —
the input for deciding where a Pallas kernel beats XLA.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gt-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srganfd_tpu.configs import get_config
    from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch
    from srganfd_tpu.train.loop import Trainer

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    b, s = args.batch, args.gt_size
    gt = jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32))
    lr = jnp.asarray(rng.uniform(size=(b, s // 4, s // 4, 3)).astype(np.float32))

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
    t_fwd = timeit(lambda: trainer.eval_sr(state.g_params, lr))
    mps = b * (s // 4) ** 2 / t_fwd / 1e6
    print(f"G forward: {t_fwd * 1e3:.2f} ms  ({mps:.1f} MP/s input, x4)")

    # full GAN train step
    def step():
        nonlocal state
        state, metrics = trainer.train_step(state, gt, lr)
        return metrics["g_loss"]

    t_step = timeit(step)
    print(f"GAN train step: {t_step * 1e3:.2f} ms  ({1 / t_step:.2f} steps/s)")

    # degradation chain
    plan = plan_bsrgan_batch(rng, b, 4)
    t_deg = timeit(lambda: apply_bsrgan_batch(gt, plan))
    print(f"BSRGAN degradation (gt {s}px, batch {b}): {t_deg * 1e3:.2f} ms")

    # Pallas candidates vs their XLA counterparts
    from srganfd_tpu.models.blocks import ResidualDenseBlock
    from srganfd_tpu.ops import filters
    from srganfd_tpu.ops.kernels import fspecial_gaussian, pad_kernel
    from srganfd_tpu.ops.pallas.filter2d import filter2d_pallas
    from srganfd_tpu.ops.pallas.rdb import rdb_forward_pallas

    blur = jnp.asarray(
        np.stack([pad_kernel(fspecial_gaussian(21, 2.0), 25)] * b).astype(np.float32)
    )
    t_f_xla = timeit(lambda: filters.filter2d(gt, blur))
    t_f_pl = timeit(lambda: filter2d_pallas(gt, blur))
    print(f"filter2d 25x25 (batch {b}, {s}px): XLA {t_f_xla * 1e3:.2f} ms | Pallas {t_f_pl * 1e3:.2f} ms")

    block = ResidualDenseBlock(64, 32)
    xb = jnp.asarray(rng.uniform(size=(b, 32, 32, 64)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), xb)["params"]
    kerns = [jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5)]
    biases = [jnp.asarray(params[f"conv{k}_bias"]) for k in range(5)]
    fused = jax.jit(lambda p, z: block.apply({"params": p}, z))
    t_rdb_xla = timeit(lambda: fused(params, xb))
    t_rdb_pl = timeit(lambda: rdb_forward_pallas(xb, kerns, biases, tile_h=32))
    print(f"RDB fwd (batch {b}, 32px, 64/32ch): XLA {t_rdb_xla * 1e3:.3f} ms | Pallas {t_rdb_pl * 1e3:.3f} ms")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(3):
            step()
        jax.block_until_ready(state.g_params)
        jax.profiler.stop_trace()
        print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
