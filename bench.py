"""Headline benchmark: SR-GAN train steps/sec/chip on real TPU hardware.

Two configurations, one JSON line each (headline first):

1. bsrgan_x4 (BASELINE.json's headline metric): full GAN training step
   (23-RRDB x4 generator + spectral-norm U-Net discriminator, pixel +
   adversarial loss, EMA) at batch 16 with 128-px GT crops (LR 32).
2. bsrgan_x2 at the thesis's own training shape
   (``BSRGAN/bsrgan_config.py:97-101``): gt 144, batch 16, LR 72 — the
   72-px trunk carries ~3.4x the x4 step FLOPs (16.36 vs 4.80 TFLOPs,
   ``tools/torch_anchor.py``).

Baselines: the reference publishes no steps/sec (BASELINE.md); the
north-star target is ">5x A100 per-chip step throughput". ``vs_baseline``
anchors each line to the A100 throughput implied by the SAME derived
utilization (BASELINE.md "Derivation of the 2.5 steps/s A100 anchor"):
4.80 TFLOPs/step -> 2.5 steps/s for x4 (~3.85% of bf16 peak, bracketed
2-4), and 16.36 TFLOPs/step -> 0.73 steps/s for the x2 shape at the same
utilization. vs_baseline > 5.0 on the headline meets the north star for
any x4 anchor <= 3.0 steps/s.

Prints one JSON line per config:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N,
   "tflops": N, "mfu": N, "spread": N}
where value is the mean over MEASURE_WINDOWS independent timed windows,
``tflops`` = achieved TFLOP/s (step FLOPs from ``tools/torch_anchor.py``
x steps/s), ``mfu`` = fraction of the v5e bf16 peak (197 TFLOP/s), and
``spread`` = (max-min)/mean across the windows — the run-to-run
variability the anchor comparison has to absorb.
"""

from __future__ import annotations

import json
import os
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
        # documented estimate, see module docstring + BASELINE.md
        "anchor_steps_per_sec": 2.5,
        # conv MACs enumerated by tools/torch_anchor.bench_step_flops
        "step_tflops": 4.80,
    },
    {
        "metric": "bsrgan_x2 GAN train steps/sec/chip (batch 16, 144px GT — thesis shape)",
        "arch": "bsrgan_x2",
        "upscale": 2,
        "gt": 144,
        "batch": 16,
        # same derived A100 utilization applied to 16.36 TFLOPs/step
        "anchor_steps_per_sec": 0.73,
        # tools/torch_anchor.bench_step_flops_x2
        "step_tflops": 16.36,
    },
]

WARMUP_STEPS = 3
MEASURE_STEPS = 20
MEASURE_WINDOWS = 3  # independent timed windows -> mean + spread
V5E_BF16_PEAK_TFLOPS = 197.0


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


def _bench_one(c: dict) -> list[float]:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        upscale_factor=c["upscale"],
        g_arch=c["arch"],
        g_kwargs={"scan_blocks": True},  # one compiled RRDB body instead of 23
        gt_image_size=c["gt"],
        batch_size=c["batch"],
        content_weight=(),  # VGG19 weights unavailable in this image; the
        # pixel+adversarial GAN step is the measured hot path
        compute_dtype="bfloat16",
        fuse_d_forwards=True,  # perf opt-in (PARITY.md item 6)
    )
    trainer = Trainer(cfg, steps_per_epoch=1000)

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


def main() -> None:
    emitted: list[str] = []
    done = _arm_watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "3600")), emitted)
    for c in CONFIGS:
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
