"""Headline benchmark: SR-GAN train steps/sec/chip on real TPU hardware.

Config matches BASELINE.json's headline metric: BSRGAN-family full GAN
training step (23-RRDB x4 generator + spectral-norm U-Net discriminator,
pixel + adversarial loss, EMA) at batch 16 with 128-px GT crops (LR 32).

Baseline: the reference publishes no steps/sec (BASELINE.md); the
north-star target is ">5x A100 per-chip step throughput". We anchor
``vs_baseline`` to 2.5 steps/s for the PyTorch reference on A100 —
derived and bracketed in BASELINE.md ("Derivation of the 2.5 steps/s
A100 anchor"): 4.80 TFLOPs/step against A100 tensor-core rooflines at
the utilization eager torch reaches on these small-spatial shapes,
sanity-checked by ``tools/torch_anchor.py`` (the same torch step runs at
its fp32 roofline on this host's CPU). vs_baseline > 5.0 meets the
north star for any anchor <= 3.0 steps/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

BASELINE_STEPS_PER_SEC_A100 = 2.5  # documented estimate, see module docstring

BATCH = 16
GT_SIZE = 128
UPSCALE = 4
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def _arm_watchdog(seconds: float) -> threading.Event:
    """The axon TPU tunnel can wedge on a stale claim (single-tenant
    grant); if the bench cannot produce a number in time, emit a sentinel
    JSON line instead of hanging the driver."""
    done = threading.Event()

    def watch() -> None:
        if not done.wait(seconds):
            print(
                json.dumps(
                    {
                        "metric": "bsrgan_x4 GAN train steps/sec/chip (batch 16, 128px GT)",
                        "value": 0.0,
                        "unit": "steps/sec",
                        "vs_baseline": 0.0,
                        "error": "TPU unavailable within watchdog timeout",
                    }
                ),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main() -> None:
    done = _arm_watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "2400")))
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        upscale_factor=UPSCALE,
        g_arch="bsrgan_x4",
        g_kwargs={"scan_blocks": True},  # one compiled RRDB body instead of 23
        gt_image_size=GT_SIZE,
        batch_size=BATCH,
        content_weight=(),  # VGG19 weights unavailable in this image; the
        # pixel+adversarial GAN step is the measured hot path
        compute_dtype="bfloat16",
        fuse_d_forwards=True,  # perf opt-in (PARITY.md item 6)
    )
    trainer = Trainer(cfg, steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(size=(BATCH, GT_SIZE, GT_SIZE, 3)).astype(np.float32))
    lr = jnp.asarray(
        rng.uniform(size=(BATCH, GT_SIZE // UPSCALE, GT_SIZE // UPSCALE, 3)).astype(np.float32)
    )

    state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    step = trainer.train_step

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, gt, lr)
    jax.block_until_ready(metrics["g_loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step(state, gt, lr)
    jax.block_until_ready(metrics["g_loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = MEASURE_STEPS / dt
    done.set()
    print(
        json.dumps(
            {
                "metric": "bsrgan_x4 GAN train steps/sec/chip (batch 16, 128px GT)",
                "value": round(steps_per_sec, 4),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC_A100, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
