"""Profile the CLI training pipeline phase by phase on the real TPU.

Replicates run_train's inner loop (loader -> DegradationAdapter -> jitted
step) with timers around each phase to find what serializes the ~2 s/step
observed in the end-to-end soak vs the ~0.15 s the device work costs.

    PYTHONPATH=/root/.axon_site:/root/repo python tools/pipeline_profile.py \
        --train-dir /tmp/soak_data/train --steps 30
"""

from __future__ import annotations

import argparse
import sys
import time


def loader_only(args) -> None:
    """Measure the input pipeline in ISOLATION (no TPU, no jax): native
    loader decode+crop+augment images/s at each thread count, cold
    (first pass decodes) vs warm (decoded-image cache hot). This is the
    half of the end-to-end rate most likely to bind on a few-core host —
    the reference's own fatal bottleneck was exactly here
    (SURVEY §3.1 hot loop (b), ``BSRGAN/dataset.py:64-96``)."""
    import glob
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from srganfd_tpu.data import native_loader

    paths = sorted(
        p
        for ext in ("png", "jpg")
        for p in glob.glob(f"{args.train_dir}/*.{ext}")
    )
    print(f"{len(paths)} images; crop {args.crop}, batch {args.batch}")
    if not native_loader.available():
        sys.exit("native loader unavailable")
    for threads in args.threads:
        loader = native_loader.NativeBatchLoader(
            paths, crop=args.crop, batch_size=args.batch, seed=0,
            num_threads=threads, uint8=True,
        )
        it = iter(loader)
        # cold window: every decode is fresh until the cache covers the
        # dataset; size the window to one full pass
        cold_batches = max(1, len(paths) // args.batch)
        t0 = time.perf_counter()
        for _ in range(cold_batches):
            next(it)
        cold = cold_batches * args.batch / (time.perf_counter() - t0)
        # warm window: decoded cache hot; crop+augment+copy only
        warm_batches = max(cold_batches, 50)
        t0 = time.perf_counter()
        for _ in range(warm_batches):
            next(it)
        warm = warm_batches * args.batch / (time.perf_counter() - t0)
        loader.close()
        print(
            f"  threads={threads}: cold {cold:7.1f} img/s "
            f"({cold / args.batch:6.2f} batch/s)   warm {warm:7.1f} img/s "
            f"({warm / args.batch:6.2f} batch/s)",
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-dir", required=True)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--config", default="bsrgan")
    ap.add_argument(
        "--loader-only", action="store_true",
        help="measure the native loader in isolation (no jax/TPU): "
        "cold/warm images/s per thread count",
    )
    ap.add_argument("--crop", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument(
        "--fuse-step",
        action="store_true",
        help="degradation+crop fused INTO the train step (SRGANFD_FUSE_STEP mode)",
    )
    ap.add_argument(
        "--steps-per-dispatch",
        type=int,
        default=1,
        help="K-step scanned dispatch (SRGANFD_STEPS_PER_DISPATCH mode; implies --fuse-step)",
    )
    args = ap.parse_args()
    if args.loader_only:
        loader_only(args)
        return
    if args.steps_per_dispatch > 1:
        args.fuse_step = True
    sys.path.insert(0, ".")

    import jax

    from srganfd_tpu import configs
    from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
    from srganfd_tpu.cli.train import build_datasets
    from srganfd_tpu.train.loop import Trainer

    cfg = configs.get_config(args.config, train_gt_images_dir=args.train_dir,
                             valid_gt_images_dir=args.train_dir)
    print(f"devices: {jax.devices()}  crop {cfg.crop_image_size} gt {cfg.gt_image_size} "
          f"batch {cfg.batch_size}", flush=True)
    train_ds, _ = build_datasets(cfg)

    from srganfd_tpu.data import native_loader

    if native_loader.available():
        loader = native_loader.NativeBatchLoader(
            train_ds.paths,
            crop=cfg.crop_image_size or cfg.gt_image_size,
            batch_size=cfg.batch_size,
            seed=cfg.seed,
            num_threads=max(cfg.num_workers, 2),
            uint8=cfg.degradation == "bsrgan",  # mirror run_train
        )
        print("native loader", flush=True)
    else:
        from srganfd_tpu.data.datasets import BatchLoader

        loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                             num_workers=cfg.num_workers)

    trainer = Trainer(cfg, steps_per_epoch=1000)
    adapter = DegradationAdapter(cfg, seed=cfg.seed, train=True)
    lr_size = cfg.gt_image_size // cfg.upscale_factor
    state = trainer.init_state(
        jax.random.PRNGKey(0),
        (cfg.batch_size, lr_size, lr_size, 3),
        (cfg.batch_size, cfg.gt_image_size, cfg.gt_image_size, 3),
    )
    step_fn = trainer.train_step

    it = iter(loader)
    phases = {"loader": 0.0, "adapter": 0.0, "step_dispatch": 0.0, "sync": 0.0}
    fuse_buffers: dict[tuple, list] = {}
    n = 0
    t_all0 = time.perf_counter()
    warmup = 12  # cover degradation plan variants + step compile
    if args.steps_per_dispatch > 1:
        warmup *= args.steps_per_dispatch  # compile all branch programs
    for i in range(args.steps + warmup):
        if i == warmup:
            jax.block_until_ready(jax.tree_util.tree_leaves(state.g_params)[0])
            for k in phases:
                phases[k] = 0.0
            # steps buffered across the window boundary are dropped (timing
            # tool only): `n` counts DISPATCHED steps in the measure window
            fuse_buffers.clear()
            n = 0
            t_all0 = time.perf_counter()
        t0 = time.perf_counter()
        host_batch = next(it)
        t1 = time.perf_counter()
        if args.fuse_step:
            from srganfd_tpu.ops.degrade import bsrgan_lr_size, plan_bsrgan_batch

            bsz = int(len(host_batch["gt"]))  # NOT `n` — that's the step counter
            step_rng = adapter.step_rng(n)
            plan = plan_bsrgan_batch(
                step_rng, bsz, cfg.upscale_factor, per_sample_order=True
            )
            lim = bsrgan_lr_size(int(host_batch["gt"].shape[1]), plan) - (
                cfg.gt_image_size // cfg.upscale_factor
            )
            tops = step_rng.integers(0, lim + 1, bsz)
            lefts = step_rng.integers(0, lim + 1, bsz)
            t2 = time.perf_counter()
            if args.steps_per_dispatch > 1:
                skey = (plan.scale2, plan.scale2_interp, plan.effective_upscale)
                buf = fuse_buffers.setdefault(skey, [])
                buf.append((host_batch["gt"], plan, tops, lefts))
                n -= 1  # only dispatched steps count (re-added below)
                if len(buf) == args.steps_per_dispatch:
                    gts, plans, topss, leftss = zip(*buf)
                    state, metrics = trainer.bsrgan_fused_train_multi_step(
                        state, gts, plans, topss, leftss, cfg.gt_image_size
                    )
                    n += len(buf)
                    buf.clear()
            else:
                state, metrics = trainer.bsrgan_fused_train_step(
                    state, host_batch["gt"], plan, tops, lefts, cfg.gt_image_size
                )
            t3 = time.perf_counter()
        else:
            batch = adapter(host_batch, i)
            t2 = time.perf_counter()
            state, metrics = step_fn(state, batch["gt"], batch["lr"])
            t3 = time.perf_counter()
        phases["loader"] += t1 - t0
        phases["adapter"] += t2 - t1
        phases["step_dispatch"] += t3 - t2
        n += 1
    t_sync0 = time.perf_counter()
    jax.block_until_ready(jax.tree_util.tree_leaves(state.g_params)[0])
    phases["sync"] = time.perf_counter() - t_sync0
    total = time.perf_counter() - t_all0
    if n == 0:
        sys.exit(
            f"no K-step dispatch completed in the measured window (buffers "
            f"fill per degradation branch); raise --steps above "
            f"{args.steps_per_dispatch} x #branches"
        )
    print(f"steps timed: {n}; wall {total:.2f}s -> {total / n * 1e3:.1f} ms/step", flush=True)
    for k, v in phases.items():
        per = v / n if k != "sync" else v
        print(f"  {k:>14}: {v:.2f}s total  ({per * 1e3:.1f} ms{'/step' if k != 'sync' else ' once'})",
              flush=True)


if __name__ == "__main__":
    main()
