"""Per-phase profile + optimization A/B for the thesis's own headline
shape: bsrgan_x2, gt 144 (BSRGAN/bsrgan_config.py:97-101), batch 16
(VERDICT r1 #4). Appends step results to BENCH_HW.jsonl.

Run alone: python tools/x2_profile.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from bench_suite import chain_time as donated_chain  # noqa: E402
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
    batch, gt_size, up = 16, 144, 2
    gt = jnp.asarray(rng.uniform(size=(batch, gt_size, gt_size, 3)).astype(np.float32))
    lr = jnp.asarray(
        rng.uniform(size=(batch, gt_size // up, gt_size // up, 3)).astype(np.float32)
    )

    # phase: G forward / fwd+bwd at the 72px trunk
    model = create_model("bsrgan_x2", num_rrdb=23, scan_blocks=True, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), lr)["params"]
    fwd = lambda z: model.apply({"params": params}, z)[:, ::up, ::up, :] * 0.999 + z * 1e-6
    chain_time(fwd, lr, 8, "x2 G fwd (72px LR)")

    def gstep(p):
        g = jax.grad(lambda pp: jnp.abs(model.apply({"params": pp}, lr)).mean())(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

    chain_time(gstep, params, 8, "x2 G f+b (param grads)")

    # full GAN step, fused-D off vs on
    for fuse in (False, True):
        cfg = get_config("bsrgan").replace(
            g_arch="bsrgan_x2",
            upscale_factor=2,
            g_kwargs={"scan_blocks": True},
            gt_image_size=gt_size,
            batch_size=batch,
            content_weight=(),
            compute_dtype="bfloat16",
            fuse_d_forwards=fuse,
        )
        trainer = Trainer(cfg, steps_per_epoch=1000)
        state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)

        def step(st, tr=trainer):
            st2, _ = tr.train_step(st, gt, lr)
            return st2

        t = timed_loop(step, state, lambda st: np.asarray(st.step), iters=12)
        emit(
            {
                "metric": f"bsrgan_x2 GAN step (batch 16, 144px GT, fused_d={fuse})",
                "value": round(1 / t, 3),
                "unit": "steps/sec",
                "ms_per_step": round(t * 1e3, 2),
            }
        )


if __name__ == "__main__":
    main()
