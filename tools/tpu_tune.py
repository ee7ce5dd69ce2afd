"""Step-composition experiments on the real TPU (one process at a time!).

Breaks the headline GAN step into its constituents and times config
variants, all via loop-carried chains (see tools/tpu_profile.py for why
independent repeated calls cannot be trusted through the axon tunnel):

  python tools/tpu_tune.py            # all experiments
  python tools/tpu_tune.py g_only d_cost batch32 unrolled
"""

from __future__ import annotations

import sys
import time

import numpy as np

BATCH = 16
GT = 128


def chain_time(body, x0, iters=12, label=""):
    import jax
    from jax import lax

    f = jax.jit(lambda x: lax.fori_loop(0, iters, lambda i, v: body(v), x))
    try:
        jax.block_until_ready(f(x0))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:.2f} ms  ({1 / dt:.2f}/s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label} FAILED: {str(e).splitlines()[0][:300]}", flush=True)
        return None


def make(cfg_overrides, batch=BATCH, gt_size=GT):
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(size=(batch, gt_size, gt_size, 3)).astype(np.float32))
    lr = jnp.asarray(
        rng.uniform(size=(batch, gt_size // 4, gt_size // 4, 3)).astype(np.float32)
    )
    base = dict(
        upscale_factor=4,
        g_arch="bsrgan_x4",
        gt_image_size=gt_size,
        batch_size=batch,
        content_weight=(),
        compute_dtype="bfloat16",
    )
    base.update(cfg_overrides)
    cfg = get_config("bsrgan").replace(**base)
    trainer = Trainer(cfg, steps_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    return trainer, state, gt, lr


def step_body(trainer, gt, lr):
    def body(st):
        st2, _ = trainer.train_step(st, gt, lr)
        return st2

    return body


def main() -> None:
    import jax

    sys.path.insert(0, ".")
    which = set(sys.argv[1:]) or {
        "calib",
        "baseline",
        "unrolled",
        "g_only",
        "d_cost",
        "batch32",
        "f32",
        "content",
        "per_sample_order",
    }
    print(f"devices: {jax.devices()}", flush=True)

    if "calib" in which:
        # fori_loop per-iteration overhead floor (empty-ish body)
        import jax.numpy as jnp

        z = jnp.zeros((16, 32, 32, 64), jnp.float32)
        chain_time(lambda x: x + 1.0, z, label="calib: fori_loop x+1 body")

    if "baseline" in which:
        trainer, state, gt, lr = make({"g_kwargs": {"scan_blocks": True}})
        chain_time(step_body(trainer, gt, lr), state, label="GAN step scan trunk (baseline)")

    if "fuse_ab" in which:
        for fuse in (True, False):
            trainer, state, gt, lr = make(
                {"g_kwargs": {"scan_blocks": True}, "fuse_d_forwards": fuse}
            )
            chain_time(
                step_body(trainer, gt, lr), state, label=f"GAN step fuse_d_forwards={fuse}"
            )

    if "unrolled" in which:
        trainer, state, gt, lr = make({"g_kwargs": {}})
        chain_time(step_body(trainer, gt, lr), state, label="GAN step unrolled trunk")

    if "g_only" in which:
        # adversarial off => G update only (pixel loss), D untouched
        trainer, state, gt, lr = make(
            {"g_kwargs": {"scan_blocks": True}, "adversarial_weight": ()}
        )
        chain_time(step_body(trainer, gt, lr), state, label="G-only update (pixel loss)")

    if "d_cost" in which:
        # freeze G: time one D update (two D fwd + bwd) with a fixed sr
        import jax.numpy as jnp

        trainer, state, gt, lr = make({"g_kwargs": {"scan_blocks": True}})
        sr = trainer.eval_sr(state.g_params, lr)
        step = trainer.make_train_step()  # build to reuse internals? simpler: time d_apply fwd
        d_fwd = jax.jit(
            lambda p, v, x: trainer._d_apply(p, v, x, update_stats=False)[0]
        )

        def body(x):
            return x + 1e-9 * d_fwd(state.d_params, state.d_vars, x)

        chain_time(body, gt, label="D forward only (128px)")

    if "batch32" in which:
        trainer, state, gt, lr = make({"g_kwargs": {"scan_blocks": True}}, batch=32)
        t = chain_time(step_body(trainer, gt, lr), state, label="GAN step batch 32")
        if t:
            print(f"  -> {32 / t:.1f} img/s (vs batch16 at 13.4 steps/s = 214 img/s)", flush=True)

    if "f32" in which:
        trainer, state, gt, lr = make(
            {"g_kwargs": {"scan_blocks": True}, "compute_dtype": "float32"}
        )
        chain_time(step_body(trainer, gt, lr), state, label="GAN step f32 compute")

    if "content" in which:
        # full reference loss mix: multi-node VGG19 content loss included
        # (deterministic-seeded weights — identical FLOPs to the real ones)
        trainer, state, gt, lr = make(
            {
                "g_kwargs": {"scan_blocks": True},
                "content_weight": (1.0,),
            }
        )
        chain_time(
            step_body(trainer, gt, lr), state, label="GAN step + VGG19 content loss"
        )

    if "per_sample_order" in which:
        import jax.numpy as jnp

        from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch

        rng = np.random.default_rng(0)
        gt = jnp.asarray(rng.uniform(size=(BATCH, GT, GT, 3)).astype(np.float32))
        plan_b = plan_bsrgan_batch(rng, BATCH, 4, per_sample_order=False)
        chain_time(
            lambda x: x + 1e-9 * jnp.mean(apply_bsrgan_batch(x, plan_b)[0]),
            gt,
            label="degradation per-batch order",
        )
        plan_s = plan_bsrgan_batch(rng, BATCH, 4, per_sample_order=True)
        chain_time(
            lambda x: x + 1e-9 * jnp.mean(apply_bsrgan_batch(x, plan_s)[0]),
            gt,
            label="degradation per-sample order (3x masked JPEG)",
        )


if __name__ == "__main__":
    main()
