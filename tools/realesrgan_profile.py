"""Per-phase profile for the Real-ESRGAN family's bench shape
(gt 256 / batch 12 / x4 — Real_ESRGAN/realesrgan_config.py:106-110 uses
gt 256, batch 48 on 4x A100; 12 is the single-chip bench slice). The
round-2 suite recorded 3.85 steps/s with no phase breakdown (VERDICT r2
candidate #3).

Run alone: python tools/realesrgan_profile.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from bench_suite import emit, timed_loop  # noqa: E402
from tpu_profile import chain_time  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.models import create_model
    from srganfd_tpu.train.loop import Trainer

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    batch, gt_size, up = 12, 256, 4
    lr_size = gt_size // up
    gt = jnp.asarray(rng.uniform(size=(batch, gt_size, gt_size, 3)).astype(np.float32))
    lr = jnp.asarray(rng.uniform(size=(batch, lr_size, lr_size, 3)).astype(np.float32))

    # phase: G forward / fwd+bwd at the 64px trunk (pixel-unshuffle front)
    model = create_model(
        "realesrgan_x4", num_rrdb=23, scan_blocks=True, dtype=jnp.bfloat16
    )
    params = model.init(jax.random.PRNGKey(0), lr)["params"]
    fwd = lambda z: model.apply({"params": params}, z)[:, ::up, ::up, :] * 0.999 + z * 1e-6
    chain_time(fwd, lr, 8, "realesrgan G fwd (64px LR, b12)")

    def gstep(p):
        g = jax.grad(lambda pp: jnp.abs(model.apply({"params": pp}, lr)).mean())(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

    chain_time(gstep, params, 8, "realesrgan G f+b (param grads)")

    # phase: U-Net SN discriminator fwd / f+b at 256px
    dcfg = get_config("realesrgan")
    dnet = create_model(dcfg.d_arch, dtype=jnp.bfloat16)
    dvars = dnet.init(jax.random.PRNGKey(1), gt)
    dparams = dvars["params"]
    extra = {k: v for k, v in dvars.items() if k != "params"}

    def dfwd(z):
        out = dnet.apply({"params": dparams, **extra}, z)
        logit = out[0] if isinstance(out, tuple) else out
        return z * 0.999 + 1e-6 * jnp.mean(logit)

    chain_time(dfwd, gt, 8, "realesrgan D fwd (256px, b12)")

    def dstep(p):
        def loss(pp):
            out = dnet.apply({"params": pp, **extra}, gt)
            logit = out[0] if isinstance(out, tuple) else out
            return jnp.mean(jnp.square(logit))

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

    chain_time(dstep, dparams, 8, "realesrgan D f+b (param grads)")

    # phase: USM sharpening of the GT (runs inside the reference's step)
    from srganfd_tpu.ops.realesrgan_degrade import usm_sharp

    chain_time(lambda z: usm_sharp(z) * 0.999 + z * 1e-6, gt, 8, "USM sharp (256px, b12)")

    # full GAN step (trainer's own donated jitted step)
    for fuse in (False, True):
        cfg = get_config("realesrgan").replace(
            gt_image_size=gt_size,
            batch_size=batch,
            content_weight=(),
            compute_dtype="bfloat16",
            fuse_d_forwards=fuse,
            g_kwargs={"scan_blocks": True},
        )
        trainer = Trainer(cfg, steps_per_epoch=1000)
        state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)

        def step(st, tr=trainer):
            st2, _ = tr.train_step(st, gt, lr)
            return st2

        t = timed_loop(step, state, lambda st: np.asarray(st.step), iters=12)
        emit(
            {
                "metric": f"realesrgan GAN step (batch 12, 256px GT, fused_d={fuse})",
                "value": round(1 / t, 3),
                "unit": "steps/sec",
                "ms_per_step": round(t * 1e3, 2),
            }
        )


if __name__ == "__main__":
    main()
