"""A/B: python-loop train steps vs K-step lax.scan dispatch on hardware.

The bench headline (bench.py) times a python loop over the donated-state
jitted GAN step; each iteration is one remote execution through the axon
tunnel. This tool measures how much of the per-step time is per-EXECUTION
overhead by scanning K steps (with K distinct stacked batches as scan
operands — exactly what an on-device-prefetched production loop would
feed) inside one jitted program.

    python tools/kstep_ab.py --k 1 --k 4 --k 8 --steps 24

Timing scheme: donated python loop closed by a byte fetch (the bench.py
scheme — see docs/tpu_performance.md "Measuring through a remote-
execution tunnel"); each outer iteration carries fresh operands so no
(executable, args) pair repeats.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, action="append", default=None)
    ap.add_argument("--steps", type=int, default=24, help="total train steps per variant")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gt", type=int, default=128)
    args = ap.parse_args()
    ks = args.k or [1, 2, 4, 8]
    sys.path.insert(0, ".")

    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        upscale_factor=4,
        g_arch="bsrgan_x4",
        g_kwargs={"scan_blocks": True},
        gt_image_size=args.gt,
        batch_size=args.batch,
        content_weight=(),
        compute_dtype="bfloat16",
        fuse_d_forwards=True,
    )  # = bench.py's headline config
    trainer = Trainer(cfg, steps_per_epoch=1000)
    lr_size = args.gt // 4
    rng = np.random.default_rng(0)

    def batches(n):
        gt = jnp.asarray(rng.uniform(size=(n, args.batch, args.gt, args.gt, 3)).astype(np.float32))
        lr = jnp.asarray(rng.uniform(size=(n, args.batch, lr_size, lr_size, 3)).astype(np.float32))
        return gt, lr

    step = trainer.train_step

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def multi(state, gts, lrs, n):
        def body(st, xs):
            g, l = xs
            st, m = step(st, g, l)
            return st, m["g_loss"]

        state, losses = jax.lax.scan(body, state, (gts, lrs))
        return state, losses[-1]

    for k in ks:
        state = trainer.init_state(
            jax.random.PRNGKey(0), (args.batch, lr_size, lr_size, 3),
            (args.batch, args.gt, args.gt, 3),
        )
        n_outer = max(1, args.steps // k)
        # warmup: compile + 2 executions
        for _ in range(2):
            g, l = batches(k)
            if k == 1:
                state, m = step(state, g[0], l[0])
                loss = m["g_loss"]
            else:
                state, loss = multi(state, g, l, k)
        jax.block_until_ready(loss)

        ops = [batches(k) for _ in range(n_outer)]  # pre-staged on device
        jax.block_until_ready(ops[-1][0])
        t0 = time.perf_counter()
        for g, l in ops:
            if k == 1:
                state, m = step(state, g[0], l[0])
                loss = m["g_loss"]
            else:
                state, loss = multi(state, g, l, k)
        float(loss)  # terminal byte fetch closes the pipeline
        dt = time.perf_counter() - t0
        n_steps = n_outer * k
        print(
            f"K={k:2d}: {n_steps} steps in {dt:.3f}s -> {dt / n_steps * 1e3:6.1f} ms/step "
            f"({n_steps / dt:5.2f} steps/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
