"""Hardware benchmark suite: one JSON line per measurement (real TPU).

Covers every training family's full step plus generator inference at
serving sizes and both degradation chains. Timing is loop-carried
(see tools/tpu_profile.py). Appends results to BENCH_HW.jsonl.

    python tools/bench_suite.py [--families bsrgan esrgan ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

FAMILIES = {
    # config name -> (g_arch override or None, gt size, batch, upscale)
    "rrdbnet": (None, 128, 16, 4),
    "esrgan": (None, 128, 16, 4),
    "bsrgan": ("bsrgan_x4", 128, 16, 4),
    # the thesis's own headline config (BSRGAN x2 on Bubbles, gt 144)
    "bsrgan_x2": (None, 144, 16, 2),
    "realesrgan": (None, 256, 12, 4),
    # BSRGANtrans token attention is O((HW)^2): the reference trains at
    # gt 120 / batch 8 (aesrgan_config.py:101-102) — larger crops OOM
    "aesrgan": (None, 120, 8, 2),
}


def timed_loop(step, x0, fetch, iters=20):
    """bench.py-style timing: a python loop over a DONATED carry->carry
    step, closed by fetching real bytes. The axon tunnel memoizes repeated
    identical (executable, args) pairs and can ack block_until_ready
    before remote completion, so chained donation + a byte fetch is the
    only trustworthy scheme (matches bench.py within noise)."""
    x = step(x0)
    fetch(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    fetch(x)
    return (time.perf_counter() - t0) / iters


def chain_time(body, x0, iters=10):
    """Loop-carried timing: wrap ``body`` as a donated carry step."""
    import jax
    import numpy as np_

    f = jax.jit(body, donate_argnums=0)

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np_.asarray(leaf[(0,) * leaf.ndim])

    return timed_loop(f, x0, fetch, iters)


def emit(record: dict) -> None:
    line = json.dumps(record)
    print(line, flush=True)
    with open("BENCH_HW.jsonl", "a") as f:
        f.write(line + "\n")


def bench_family(name: str) -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    arch, gt_size, batch, up = FAMILIES[name]
    rng = np.random.default_rng(0)
    cfg = get_config(name.removesuffix("_x2"))
    over = {
        "gt_image_size": gt_size,
        "batch_size": batch,
        "content_weight": (),  # no pretrained VGG19 in this image
        "compute_dtype": "bfloat16",
        "fuse_d_forwards": True,  # perf opt-in, matching bench.py (PARITY item 7)
    }
    if arch:
        over.update({"g_arch": arch, "upscale_factor": up})
    cfg = cfg.replace(**over)
    up = cfg.upscale_factor
    gt = jnp.asarray(rng.uniform(size=(batch, gt_size, gt_size, 3)).astype(np.float32))
    lr = jnp.asarray(
        rng.uniform(size=(batch, gt_size // up, gt_size // up, 3)).astype(np.float32)
    )
    # scan the RRDB trunk when the arch supports it (compile-time win)
    try:
        trainer = Trainer(
            cfg.replace(g_kwargs={**(cfg.g_kwargs or {}), "scan_blocks": True}),
            steps_per_epoch=1000,
        )
        state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    except TypeError:
        trainer = Trainer(cfg, steps_per_epoch=1000)
        state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)

    # use the trainer's own donated jitted step directly — wrapping it in
    # an outer jit would force a second multi-minute remote compile
    def step(st):
        st2, _ = trainer.train_step(st, gt, lr)
        return st2

    def fetch(st):
        return np.asarray(st.step)

    try:
        t = timed_loop(step, state, fetch)
        emit(
            {
                "metric": f"{name} GAN/train step (batch {batch}, {gt_size}px GT, x{up})",
                "value": round(1 / t, 3),
                "unit": "steps/sec",
                "ms_per_step": round(t * 1e3, 2),
            }
        )
    except Exception as e:  # noqa: BLE001
        emit({"metric": f"{name} train step", "error": str(e).splitlines()[0][:200]})


def bench_inference() -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    rng = np.random.default_rng(0)
    model = create_model("bsrgan_x4", dtype=jnp.bfloat16, scan_blocks=True)
    for b, size in ((1, 128), (1, 256), (4, 256), (1, 512)):
        x = jnp.asarray(rng.uniform(size=(b, size, size, 3)).astype(np.float32))
        params = None
        try:
            params = model.init(jax.random.PRNGKey(0), x)["params"]
            apply = jax.jit(lambda p, z: model.apply({"params": p}, z))

            def body(z):
                return z + 1e-9 * apply(params, z)[:, ::4, ::4, :]

            t = chain_time(body, x, iters=6)
            emit(
                {
                    "metric": f"bsrgan_x4 inference (batch {b}, {size}px LR -> {4 * size}px)",
                    "value": round(b * size * size / t / 1e6, 2),
                    "unit": "MP/s (input)",
                    "ms": round(t * 1e3, 2),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit(
                {
                    "metric": f"bsrgan_x4 inference {b}x{size}",
                    "error": str(e).splitlines()[0][:200],
                }
            )
        finally:
            del params


def bench_degradations() -> None:
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, s = 16, 128
    gt = jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32))
    try:
        from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch

        # per-batch slot: keeps this metric comparable with the numbers
        # recorded before per_sample_order's default flipped to True
        plan = plan_bsrgan_batch(rng, b, 4, per_sample_order=False)
        t = chain_time(lambda x: x + 1e-9 * jnp.mean(apply_bsrgan_batch(x, plan)), gt)
        emit(
            {
                "metric": f"BSRGAN degradation chain (batch {b}, {s}px)",
                "value": round(t * 1e3, 2),
                "unit": "ms/batch",
            }
        )
    except Exception as e:  # noqa: BLE001
        emit({"metric": "bsrgan degradation", "error": str(e).splitlines()[0][:200]})
    try:
        import jax

        from srganfd_tpu.configs import get_config
        from srganfd_tpu.ops.realesrgan_degrade import (
            apply_realesrgan_batch,
            plan_realesrgan_batch,
            sample_kernel_triple,
        )

        s2, b2 = 256, 12
        p = get_config("realesrgan").degradation_params
        gt2 = jnp.asarray(rng.uniform(size=(b2, s2, s2, 3)).astype(np.float32))
        triples = [sample_kernel_triple(rng, p["model"]) for _ in range(b2)]
        k1 = jnp.asarray(np.stack([t[0] for t in triples]).astype(np.float32))
        k2 = jnp.asarray(np.stack([t[1] for t in triples]).astype(np.float32))
        sinc = jnp.asarray(np.stack([t[2] for t in triples]).astype(np.float32))
        plan = plan_realesrgan_batch(rng, b2, (s2, s2), 4, p["process"])
        key = jax.random.PRNGKey(0)
        t = chain_time(
            lambda x: x
            + 1e-9 * jnp.mean(apply_realesrgan_batch(x, k1, k2, sinc, key, plan)),
            gt2,
            iters=6,
        )
        emit(
            {
                "metric": f"Real-ESRGAN 2nd-order degradation (batch 12, {s2}px)",
                "value": round(t * 1e3, 2),
                "unit": "ms/batch",
            }
        )
    except Exception as e:  # noqa: BLE001
        emit({"metric": "realesrgan degradation", "error": str(e).splitlines()[0][:200]})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--skip-inference", action="store_true")
    ap.add_argument("--skip-degradations", action="store_true")
    args = ap.parse_args()
    sys.path.insert(0, ".")
    import jax

    emit({"devices": str(jax.devices()), "ts": time.time()})
    for fam in args.families:
        bench_family(fam)
    if not args.skip_inference:
        bench_inference()
    if not args.skip_degradations:
        bench_degradations()


if __name__ == "__main__":
    main()
