"""Headline benchmark: SR-GAN train steps/sec/chip on real TPU hardware.

Three configurations, one JSON line each (headline first):

1. bsrgan_x4 (BASELINE.json's headline metric): full GAN training step
   (23-RRDB x4 generator + spectral-norm U-Net discriminator, pixel +
   multi-node VGG19 content + adversarial loss, EMA) at batch 16 with
   128-px GT crops (LR 32).
2. bsrgan_x2 at the thesis's own training shape
   (``BSRGAN/bsrgan_config.py:97-101``): gt 144, batch 16, LR 72 — the
   72-px trunk carries ~3.2x the x4 step FLOPs (16.87 vs 5.21 TFLOPs,
   ``tools/torch_anchor.py``).
3. bsrgan_x4 END-TO-END: the same step measured through the production
   input path — native C++ loader over a >=5000-tile 320px dataset
   (uint8 transport), host-sampled degradation plans, the on-device
   BSRGAN chain + aligned random crop, then the train step — i.e. what
   ``cli.train`` actually runs, not a fixed-tensor loop. The tile
   dataset self-bootstraps into ``~/.cache/srganfd_bench_tiles`` (from
   the thesis frames under /root/reference when present, else synthetic
   CFD-like fields), so the line is reproducible in a bare image.

The measured step includes the reference's per-step content cost: the
multi-node VGG19 forwards on sr and gt (seeded weights — identical FLOPs
to pretrained ones). It runs with ``content_detach_bug=True``, the
reference's LITERAL semantics (``BSRGAN/model.py:552`` detaches the
content loss, so the reference never pays a VGG backward — SURVEY §2.10);
this keeps the FLOP enumeration symmetric between the measured step and
the anchor. The default-fixed path (gradients flowing) additionally pays
a VGG backward-to-input and is NOT what the reference's step costs.

Baselines: the reference publishes no steps/sec (BASELINE.md); the
north-star target is ">5x A100 per-chip step throughput". ``vs_baseline``
anchors each line to the A100 throughput implied by the SAME derived
utilization (BASELINE.md "Derivation of the 2.5 steps/s A100 anchor",
defined on the pre-content 4.8034 TFLOPs/step workload): 5.21 TFLOPs/step
-> 2.304 steps/s for x4 (~3.85% of bf16 peak, bracketed 2-4), and 16.87
TFLOPs/step -> 0.712 steps/s for the x2 shape at the same utilization.
The end-to-end line reuses the x4 anchor — conservative, since the
reference additionally pays its own (CPU-bound, SURVEY §3.1) input
pipeline that this anchor excludes.

Prints one JSON line per config:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N,
   "tflops": N, "mfu": N, "spread": N}
where value is the mean over the config's independent timed windows,
``tflops`` = achieved TFLOP/s (train-step FLOPs from
``tools/torch_anchor.py`` x steps/s; the end-to-end line's degradation-
chain FLOPs are not enumerated — its mfu is slightly understated),
``mfu`` = fraction of the v5e bf16 peak (197 TFLOP/s), and ``spread`` =
(max-min)/mean across the windows. tests/test_bench_contract.py pins the
hardcoded tflops/anchor numbers against the enumeration.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

CONFIGS = [
    {
        "metric": "bsrgan_x4 GAN train steps/sec/chip (batch 16, 128px GT)",
        "arch": "bsrgan_x4",
        "upscale": 4,
        "gt": 128,
        "batch": 16,
        # documented derivation, see module docstring + BASELINE.md
        "anchor_steps_per_sec": 2.304,
        # conv+VGG MACs enumerated by tools/torch_anchor.bench_step_flops
        "step_tflops": 5.21,
        "e2e": False,
    },
    {
        "metric": "bsrgan_x2 GAN train steps/sec/chip (batch 16, 144px GT — thesis shape)",
        "arch": "bsrgan_x2",
        "upscale": 2,
        "gt": 144,
        "batch": 16,
        # same derived A100 utilization applied to 16.87 TFLOPs/step
        "anchor_steps_per_sec": 0.712,
        # tools/torch_anchor.bench_step_flops_x2
        "step_tflops": 16.87,
        "e2e": False,
    },
    {
        "metric": (
            "bsrgan_x4 END-TO-END train steps/sec/chip "
            "(native loader + on-device degradation + GAN step, batch 16, 320px tiles)"
        ),
        "arch": "bsrgan_x4",
        "upscale": 4,
        "gt": 128,
        "batch": 16,
        "anchor_steps_per_sec": 2.304,
        "step_tflops": 5.21,
        "e2e": True,
    },
    {
        "metric": (
            "bsrgan_x4 END-TO-END FUSED train steps/sec/chip "
            "(single-dispatch degradation+crop+GAN step — the "
            "SRGANFD_FUSE_STEP=1 production mode for remote tunnels)"
        ),
        "arch": "bsrgan_x4",
        "upscale": 4,
        "gt": 128,
        "batch": 16,
        "anchor_steps_per_sec": 2.304,
        "step_tflops": 5.21,
        "e2e": True,
        "fused": True,
        # the fused chain's static-branch space is tiny (scale2 x interp),
        # so far fewer warmup steps cover it than the adapter path needs
        "warmup": 30,
    },
]

WARMUP_STEPS = 3
MEASURE_STEPS = 20
MEASURE_WINDOWS = 3  # independent timed windows -> mean + spread
# Warmup must cover the degradation-plan STATIC BRANCH space: each new
# blur-slot/scale2/jpeg combination compiles its own chain program, and
# through the tunnel each compile costs seconds. The round-5 convergence
# run needed ~90 production steps to reach steady state; 14 warmup steps
# measured 0.51/1.30 steps/s windows (spread 0.88) purely from compiles
# landing inside the timed windows.
E2E_WARMUP_STEPS = 120
E2E_MEASURE_STEPS = 25
E2E_MEASURE_WINDOWS = 3
V5E_BF16_PEAK_TFLOPS = 197.0

TILE_CACHE = os.path.expanduser("~/.cache/srganfd_bench_tiles/cfd320")
MIN_TILES = 5000


def _note(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _arm_watchdog(seconds: float, emitted: list) -> threading.Event:
    """The axon TPU tunnel can wedge on a stale claim (single-tenant
    grant); if the bench cannot produce its numbers in time, emit sentinel
    JSON lines for every config not yet reported instead of hanging the
    driver. Exit code: 0 when the HEADLINE (first) config was measured
    before the timeout (a partial run with a real headline is a success),
    2 when even that is missing."""
    done = threading.Event()

    def watch() -> None:
        if not done.wait(seconds):
            for c in CONFIGS:
                if c["metric"] not in emitted:
                    print(
                        json.dumps(
                            {
                                "metric": c["metric"],
                                "value": 0.0,
                                "unit": "steps/sec",
                                "vs_baseline": 0.0,
                                "error": "TPU unavailable within watchdog timeout",
                            }
                        ),
                        flush=True,
                    )
            os._exit(0 if CONFIGS[0]["metric"] in emitted else 2)

    threading.Thread(target=watch, daemon=True).start()
    return done


def _bench_cfg(c: dict):
    from srganfd_tpu.configs import get_config

    return get_config("bsrgan").replace(
        upscale_factor=c["upscale"],
        g_arch=c["arch"],
        g_kwargs={"scan_blocks": True},  # one compiled RRDB body instead of 23
        gt_image_size=c["gt"],
        batch_size=c["batch"],
        # the reference's literal content semantics: multi-node VGG19
        # forwards on sr+gt every G step, detached (no VGG backward) —
        # seeded weights carry identical FLOPs to pretrained ones
        content_detach_bug=True,
        compute_dtype="bfloat16",
        fuse_d_forwards=True,  # perf opt-in (PARITY.md item 6)
    )


def _bench_one(c: dict) -> list[float]:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.train.loop import Trainer

    trainer = Trainer(_bench_cfg(c), steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    gt_px, lr_px = c["gt"], c["gt"] // c["upscale"]
    gt = jnp.asarray(rng.uniform(size=(c["batch"], gt_px, gt_px, 3)).astype(np.float32))
    lr = jnp.asarray(rng.uniform(size=(c["batch"], lr_px, lr_px, 3)).astype(np.float32))

    state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    step = trainer.train_step

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, gt, lr)
    jax.block_until_ready(metrics["g_loss"])

    rates = []
    for _ in range(MEASURE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, metrics = step(state, gt, lr)
        jax.block_until_ready(metrics["g_loss"])
        rates.append(MEASURE_STEPS / (time.perf_counter() - t0))
    return rates


# ---------------------------------------------------------------------------
# end-to-end line: production input path feeding the same step
# ---------------------------------------------------------------------------


def _synthetic_frames(n: int = 48, h: int = 480, w: int = 640) -> list[np.ndarray]:
    """Deterministic CFD-like frames (smooth multi-scale fields) for
    images when /root/reference is absent: PNG decode cost depends on
    content, so pure noise would misrepresent the loader."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for _ in range(n):
        img = np.zeros((h, w, 3), np.float32)
        for _ in range(6):
            fx, fy = rng.uniform(0.3, 8.0, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            col = rng.uniform(0.2, 1.0, 3).astype(np.float32)
            img += (
                np.sin(fx * xx / w * 2 * np.pi + ph[0])
                * np.cos(fy * yy / h * 2 * np.pi + ph[1])
            )[..., None] * col
        img += 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)
        lo, hi = img.min(), img.max()
        frames.append(((img - lo) / (hi - lo + 1e-6) * 255).astype(np.uint8))
    return frames


def _ensure_tiles(
    cache: str | None = None,
    min_tiles: int | None = None,
    stride: int = 20,
    frames_glob: str = "/root/reference/Results/**/*.jpg",
) -> str:
    """Build (once) and return the >=min_tiles 320px-tile dataset dir."""
    import glob

    cache = cache or TILE_CACHE
    min_tiles = min_tiles or MIN_TILES
    if len(glob.glob(os.path.join(cache, "*.png"))) >= min_tiles:
        return cache
    import cv2

    os.makedirs(cache, exist_ok=True)
    frames = []
    for f in sorted(glob.glob(frames_glob, recursive=True)):
        im = cv2.imread(f, cv2.IMREAD_COLOR)
        if im is not None:
            frames.append(im)
    source = "thesis frames"
    if not frames:
        frames = _synthetic_frames()
        source = "synthetic CFD-like frames"
    _note(f"bootstrapping bench tile dataset from {len(frames)} {source} ...")
    tile, n = 320, 0
    t0 = time.perf_counter()
    for fi, im in enumerate(frames):
        h, w = im.shape[:2]
        for top in range(0, h - tile + 1, stride):
            for left in range(0, w - tile + 1, stride):
                cv2.imwrite(
                    os.path.join(cache, f"t{fi:03d}_{top:04d}_{left:04d}.png"),
                    im[top : top + tile, left : left + tile],
                )
                n += 1
    _note(f"wrote {n} tiles to {cache} in {time.perf_counter() - t0:.0f}s")
    return cache


def _bench_e2e(c: dict) -> tuple[list[float], str]:
    """Measure the production path: loader -> host plan -> on-device
    degradation chain + aligned crop -> train step (the cli.train default
    route, srganfd_tpu/cli/train.py). Returns (window rates, loader kind).
    """
    import glob

    import jax

    from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
    from srganfd_tpu.data import native_loader
    from srganfd_tpu.train.loop import Trainer

    tiles_dir = _ensure_tiles()
    paths = sorted(glob.glob(os.path.join(tiles_dir, "*.png")))
    cfg = _bench_cfg(c).replace(crop_image_size=320)
    loader_kind = "native"
    if native_loader.available():
        loader = native_loader.NativeBatchLoader(
            paths,
            crop=320,
            batch_size=cfg.batch_size,
            seed=cfg.seed,
            num_threads=max(cfg.num_workers, 2),
            uint8=True,  # /255 folds into the degradation program
        )
    else:  # degraded environment: fall back so the line still reports
        from srganfd_tpu.data.datasets import BatchLoader, TrainValidImageDataset

        loader_kind = "python"
        ds = TrainValidImageDataset(tiles_dir, cfg.gt_image_size, "Train", 320)
        loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=cfg.seed)

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
    step = 0

    if c.get("fused"):
        # the cli.train SRGANFD_FUSE_STEP=1 route (cli/train.py:550-568):
        # host-sampled plan, chain+aligned-crop+GAN update in ONE dispatch
        from srganfd_tpu.ops.degrade import bsrgan_lr_size, plan_bsrgan_batch

        jpeg_prob = cfg.degradation_params.get("jpeg_prob", 0.9)
        scale2_prob = cfg.degradation_params.get("scale2_prob", 0.25)

        def run_steps(n: int):
            nonlocal state, step
            metrics = None
            for _ in range(n):
                host_batch = next(it)
                nb = int(np.shape(host_batch["gt"])[0])
                rng = adapter.step_rng(step)
                plan = plan_bsrgan_batch(
                    rng, nb, cfg.upscale_factor,
                    jpeg_prob=jpeg_prob, scale2_prob=scale2_prob,
                    per_sample_order=True,
                )
                lr_edge = bsrgan_lr_size(int(np.shape(host_batch["gt"])[1]), plan)
                lim = lr_edge - cfg.gt_image_size // cfg.upscale_factor
                tops = rng.integers(0, lim + 1, nb)
                lefts = rng.integers(0, lim + 1, nb)
                state, metrics = trainer.bsrgan_fused_train_step(
                    state, host_batch["gt"], plan, tops, lefts, cfg.gt_image_size
                )
                step += 1
            float(metrics["g_loss"])
    else:

        def run_steps(n: int):
            nonlocal state, step
            metrics = None
            for _ in range(n):
                batch = adapter(next(it), step)
                state, metrics = step_fn(state, batch["gt"], batch["lr"])
                step += 1
            # close the dispatch chain with a byte fetch (tunnel-safe timing)
            float(metrics["g_loss"])

    run_steps(int(c.get("warmup", E2E_WARMUP_STEPS)))
    rates = []
    for _ in range(E2E_MEASURE_WINDOWS):
        t0 = time.perf_counter()
        run_steps(E2E_MEASURE_STEPS)
        rates.append(E2E_MEASURE_STEPS / (time.perf_counter() - t0))
    if hasattr(loader, "close"):
        loader.close()
    return rates, loader_kind


def main() -> None:
    emitted: list[str] = []
    done = _arm_watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "3600")), emitted)
    for c in CONFIGS:
        extra = {}
        if c["e2e"]:
            rates, loader_kind = _bench_e2e(c)
            extra["loader"] = loader_kind
            extra["images_per_sec"] = round(
                c["batch"] * sum(rates) / len(rates), 1
            )
        else:
            rates = _bench_one(c)
        steps_per_sec = sum(rates) / len(rates)
        achieved_tflops = steps_per_sec * c["step_tflops"]
        print(
            json.dumps(
                {
                    "metric": c["metric"],
                    "value": round(steps_per_sec, 4),
                    "unit": "steps/sec",
                    "vs_baseline": round(steps_per_sec / c["anchor_steps_per_sec"], 4),
                    "tflops": round(achieved_tflops, 2),
                    "mfu": round(achieved_tflops / V5E_BF16_PEAK_TFLOPS, 4),
                    "spread": round((max(rates) - min(rates)) / steps_per_sec, 4),
                    "windows": [round(r, 3) for r in rates],
                    **extra,
                }
            ),
            flush=True,
        )
        # append only after the line is on stdout: if the watchdog fires in
        # between, it must still emit a sentinel rather than report success
        # for a metric that never printed (ADVICE r3)
        emitted.append(c["metric"])
    done.set()


if __name__ == "__main__":
    main()
