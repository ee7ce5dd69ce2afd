"""Batch adapter: host GT batches -> device (gt, lr[, gt_pixel]) pairs.

This is where the reference's per-sample CPU degradation work
(SURVEY.md §3.1 hot spot) becomes on-device fused XLA pipelines:

- ``bicubic``  : LR = MATLAB bicubic GT/sf (ESRGAN/dataset.py:57-84)
- ``bsrgan``   : fork chain on the 320-crop, then aligned on-device
                 random crop to gt_image_size (BSRGAN/train_bsrgan.py:399)
- ``realesrgan``: USM + second-order chain + paired crop/flip/rotate
                 (Real_ESRGAN/train_realesrgan.py:392-405)
- ``paired``   : LR comes from the dataset (PairedImageDataset)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.configs.base import ExperimentConfig
from srganfd_tpu.ops.degrade import apply_bsrgan_batch, plan_bsrgan_batch
from srganfd_tpu.ops.realesrgan_degrade import (
    apply_realesrgan_batch,
    plan_realesrgan_batch,
    usm_sharp,
)
from srganfd_tpu.ops.resize import imresize

__all__ = ["DegradationAdapter"]


class DegradationAdapter:
    def __init__(
        self,
        cfg: ExperimentConfig,
        seed: int = 0,
        train: bool = True,
        eval_codec: str = "diffjpeg",
    ) -> None:
        """``eval_codec="cv2"`` (eval paths, ``train=False`` only) runs the
        bsrgan chain's JPEG stages through the reference's entropy-coded
        cv2 round trip (``BSRGAN/imgproc.py:284-293``) — byte-exact
        "Valid"-mode LR generation; the train path keeps the jittable
        DiffJPEG (PARITY.md deviation 2, train-path-only)."""
        self.cfg = cfg
        self.seed = seed
        self.train = train
        self.eval_codec = eval_codec

        @jax.jit
        def _bicubic_pair(g_raw):
            # uint8 or float transport; gt + MATLAB-bicubic lr in ONE program
            g = g_raw.astype(jnp.float32)
            if np.issubdtype(np.dtype(g_raw.dtype), np.integer):
                g = g / 255.0
            return g, jnp.clip(imresize(g, 1.0 / cfg.upscale_factor), 0.0, 1.0)

        self._bicubic_pair = _bicubic_pair

    def step_rng(self, step: int) -> np.random.Generator:
        """Degradation randomness is keyed by (seed, tag, host, step) —
        the numpy analog of ``jax.random.fold_in``. Stateless: resuming a
        run at step N redraws exactly the plans the uninterrupted run
        would have drawn, with no host-side replay (a sequential generator
        would need its whole draw history re-executed). The constant tag
        makes the entropy tuple disjoint from BatchLoader's per-record
        (seed, batch_no, j) keying — without it, host 0's step-s plan
        stream would be bit-identical to batch 0's record-s augmentation
        stream (same SeedSequence entropy)."""
        return np.random.default_rng((self.seed, 0xDE64ADE, jax.process_index(), step))

    def __call__(self, host_batch: dict[str, np.ndarray], step: int) -> dict[str, Any]:
        cfg = self.cfg
        rng = self.step_rng(step)
        n = int(np.shape(host_batch["gt"])[0])
        if cfg.degradation == "paired":
            return {
                "gt": jnp.asarray(host_batch["gt"]),
                "lr": jnp.asarray(host_batch["lr"]),
            }

        if cfg.degradation == "bicubic":
            gt, lr = self._bicubic_pair(host_batch["gt"])
            return {"gt": gt, "lr": lr}

        if cfg.degradation == "bsrgan":
            from srganfd_tpu.ops.degrade import apply_bsrgan_batch_cropped, bsrgan_lr_size

            plan = plan_bsrgan_batch(
                rng,
                n,
                cfg.upscale_factor,
                jpeg_prob=cfg.degradation_params.get("jpeg_prob", 0.9),
                scale2_prob=cfg.degradation_params.get("scale2_prob", 0.25),
                per_sample_order=cfg.degradation_params.get("per_sample_order", True),
            )
            if not self.train:
                gt = jnp.asarray(host_batch["gt"])
                return {"gt": gt, "lr": apply_bsrgan_batch(gt, plan, codec=self.eval_codec)}
            # aligned random crop gt_image_size (BSRGAN/imgproc.py:846-886)
            # fused into the chain's program: one dispatch per step.
            # GT stays at full scale even when the chain's scale2 branch
            # pre-halved internally: the reference reassigns the chain's
            # local sf to 2 but crops gt/lr with the CONFIG's upscale
            # factor (train_bsrgan.py:399), so the trained pair is always
            # gt_image_size : gt_image_size/upscale_factor.
            sf = cfg.upscale_factor
            lr_edge = bsrgan_lr_size(int(np.shape(host_batch["gt"])[1]), plan)
            lr_limit = lr_edge - cfg.gt_image_size // sf
            tops = rng.integers(0, lr_limit + 1, n)
            lefts = rng.integers(0, lr_limit + 1, n)
            gt_c, lr_c = apply_bsrgan_batch_cropped(
                host_batch["gt"], plan, tops, lefts, cfg.gt_image_size, sf
            )
            return {"gt": gt_c, "lr": lr_c}

        if cfg.degradation == "realesrgan":
            from srganfd_tpu.ops.realesrgan_degrade import apply_realesrgan_train_batch

            p = cfg.degradation_params["process"]
            gt_shape = np.shape(host_batch["gt"])
            plan = plan_realesrgan_batch(
                rng, n, (gt_shape[1], gt_shape[2]), cfg.upscale_factor, p
            )
            key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
            if not self.train:
                gt = jnp.asarray(host_batch["gt"])
                gt_usm = usm_sharp(gt)
                lr = apply_realesrgan_batch(
                    gt_usm,
                    jnp.asarray(host_batch["kernel1"]),
                    jnp.asarray(host_batch["kernel2"]),
                    jnp.asarray(host_batch["sinc_kernel"]),
                    key,
                    plan,
                )
                return {"gt": gt, "gt_pixel": gt_usm, "lr": lr}
            # USM + chain + aligned crops + paired flips: one dispatch
            # (rng draw ORDER matches the unfused path: plan, key, tops,
            # lefts, hf, vf, rot — seed determinism preserved)
            sf = cfg.upscale_factor
            lr_limit_h = plan.final_size[0] - cfg.gt_image_size // sf
            lr_limit_w = plan.final_size[1] - cfg.gt_image_size // sf
            tops = rng.integers(0, max(lr_limit_h, 0) + 1, n)
            lefts = rng.integers(0, max(lr_limit_w, 0) + 1, n)
            hf = (rng.random(n) < 0.5).astype(np.float32)
            vf = (rng.random(n) < 0.5).astype(np.float32)
            rot = (rng.random(n) < 0.5).astype(np.float32)
            gt_c, usm_c, lr_c = apply_realesrgan_train_batch(
                host_batch["gt"],
                jnp.asarray(host_batch["kernel1"]),
                jnp.asarray(host_batch["kernel2"]),
                jnp.asarray(host_batch["sinc_kernel"]),
                key,
                plan,
                tops,
                lefts,
                hf,
                vf,
                rot,
                cfg.gt_image_size,
                sf,
            )
            return {"gt": gt_c, "gt_pixel": usm_c, "lr": lr_c}

        raise ValueError(f"unknown degradation {cfg.degradation!r}")
