"""Profile the headline train step on the real TPU.

Run (one TPU process at a time!):
    python tools/tpu_profile.py [--trace-dir /tmp/trace]

Prints per-phase timings (G fwd, D fwd, degradation, full GAN step) and
the Pallas-vs-XLA comparisons that gate kernel wiring.

Measurement method: every phase is timed as ``iters`` CHAINED iterations
inside one jitted ``lax.fori_loop`` whose carry feeds each iteration from
the previous output. Through the axon tunnel, independent repeated calls
report physically impossible times (a 23-RRDB forward in 0.04 ms —
~0.5 TFLOP of conv work), evidently served from a cache or completed
out of order; a loop-carried dependency forces real sequential execution.
The full-step number cross-checks against bench.py (donated state chains
it naturally).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def chain_time(body, x0, iters=16, label="", extra=""):
    """Time ``iters`` loop-carried applications of ``body`` inside one jit;
    prints and returns seconds/iteration (compile excluded)."""
    import jax
    from jax import lax

    f = jax.jit(lambda x: lax.fori_loop(0, iters, lambda i, v: body(v), x))
    try:
        jax.block_until_ready(f(x0))  # compile + first run
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:.3f} ms{extra and '  ' + extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:300]
        print(f"{label} FAILED: {msg}", flush=True)
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gt-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    b, s, it = args.batch, args.gt_size, args.iters
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

    # generator forward (inference path): feed a strided slice of sr back in
    t = chain_time(
        lambda x: x + 1e-9 * trainer.eval_sr(state.g_params, x)[:, :: 4, :: 4, :],
        lr,
        it,
        f"G forward (lr {s // 4}px, batch {b})",
    )
    if t:
        print(f"  -> {b * (s // 4) ** 2 / t / 1e6:.1f} MP/s input, x4", flush=True)

    # discriminator forward (SN U-Net at GT resolution, per-pixel map)
    def d_body(x):
        out = trainer._d_apply(state.d_params, state.d_vars, x, update_stats=False)[0]
        return x + 1e-9 * out  # (b,s,s,1) broadcasts over C

    chain_time(d_body, gt, it, f"D forward ({s}px, batch {b})")

    # full GAN train step (state is the carry; inputs derived from it)
    def step_body(st):
        st2, _ = trainer.train_step(st, gt, lr)
        return st2

    t_step = chain_time(step_body, state, it, f"GAN train step ({s}px GT, batch {b})")
    if t_step:
        print(f"  -> {1 / t_step:.2f} steps/s", flush=True)

    # degradation chain (one plan variant; scalar feedback keeps the chain)
    try:
        from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch

        # per-batch slot for comparability with pre-default-flip records
        plan = plan_bsrgan_batch(rng, b, 4, per_sample_order=False)
        chain_time(
            lambda x: x + 1e-9 * jnp.mean(apply_bsrgan_batch(x, plan)[0]),
            gt,
            it,
            f"BSRGAN degradation (gt {s}px, batch {b})",
        )
    except Exception as e:  # noqa: BLE001
        print(f"degradation FAILED: {e}", flush=True)

    # Pallas candidates vs their XLA counterparts
    from srganfd_tpu.ops import filters
    from srganfd_tpu.ops.kernels import fspecial_gaussian, pad_kernel

    blur = jnp.asarray(
        np.stack([pad_kernel(fspecial_gaussian(21, 2.0 + 0.05 * i), 25) for i in range(b)]).astype(
            np.float32
        )
    )
    chain_time(
        lambda x: filters.filter2d_depthwise(x, blur),
        gt,
        it,
        f"filter2d 25x25 XLA depthwise ({s}px)",
    )
    chain_time(
        lambda x: filters.filter2d_gemm(x, blur),
        gt,
        it,
        f"filter2d 25x25 XLA banded-GEMM ({s}px)",
    )
    try:
        from srganfd_tpu.ops.pallas.filter2d import filter2d_pallas

        chain_time(
            lambda x: filter2d_pallas(x, blur), gt, it, f"filter2d 25x25 Pallas ({s}px)"
        )
    except Exception as e:  # noqa: BLE001
        print(f"filter2d Pallas FAILED: {e}", flush=True)

    from srganfd_tpu.models.blocks import ResidualDenseBlock

    # bf16 like the in-model hot path (the f32 block is ~10x off-profile)
    block = ResidualDenseBlock(64, 32, dtype=jnp.bfloat16)
    xb = jnp.asarray(rng.uniform(size=(b, 32, 32, 64)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), xb)["params"]
    kerns = tuple(jnp.asarray(params[f"conv{k}_kernel"]) for k in range(5))
    biases = tuple(jnp.asarray(params[f"conv{k}_bias"]) for k in range(5))
    chain_time(
        lambda z: block.apply({"params": params}, z).astype(jnp.float32),
        xb,
        it,
        f"RDB fwd XLA bf16 (batch {b}, 32px, 64/32ch)",
    )
    block_lit = ResidualDenseBlock(64, 32, dtype=jnp.bfloat16, fused=False)
    chain_time(
        lambda z: block_lit.apply({"params": params}, z).astype(jnp.float32),
        xb,
        it,
        f"RDB fwd XLA bf16 literal/unfused (batch {b}, 32px, 64/32ch)",
    )
    try:
        from srganfd_tpu.ops.pallas.rdb import rdb_forward_pallas

        chain_time(
            lambda z: rdb_forward_pallas(
                z.astype(jnp.bfloat16), kerns, biases, tile_h=32
            ).astype(jnp.float32),
            xb,
            it,
            f"RDB fwd Pallas bf16-in (batch {b}, 32px, 64/32ch)",
        )
    except Exception as e:  # noqa: BLE001
        print(f"RDB Pallas FAILED: {e}", flush=True)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        st = state
        for _ in range(3):
            st, _ = trainer.train_step(st, gt, lr)
        jax.block_until_ready(st.g_params)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}", flush=True)


if __name__ == "__main__":
    main()
