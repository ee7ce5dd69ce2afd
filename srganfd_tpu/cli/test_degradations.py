"""Degradation-chain visual QA entry point.

Parity target: ``BSRGAN/test_degradations.py:36-93`` — run only the
degradation pipeline over a GT directory and log the LR outputs for
eyeballing (the reference file itself cannot run: mixed tabs/spaces,
SURVEY.md §2.10).

Usage:
    python -m srganfd_tpu.cli.test_degradations --config bsrgan \
        --gt-dir data/test --out-dir samples/degradations [--plus]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu import configs
from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
from srganfd_tpu.data.datasets import list_image_files, load_image_rgb
from srganfd_tpu.ops.degrade import bsrgan_degradation_plus
from srganfd_tpu.track.tracker import Tracker


def main() -> None:
    ap = argparse.ArgumentParser(description="run degradation chain only; save LR images")
    ap.add_argument("--config", default="bsrgan")
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--out-dir", default="samples/degradations")
    ap.add_argument("--plus", action="store_true", help="use degradation_process_plus")
    ap.add_argument("--max-images", type=int, default=16)
    ap.add_argument(
        "--codec", choices=["diffjpeg", "cv2"], default="diffjpeg",
        help="JPEG stages: jittable DiffJPEG (default) or the reference's "
        "entropy-coded cv2 round trip (byte-exact, host-side)",
    )
    args = ap.parse_args()

    cfg = configs.get_config(args.config, mode="test")
    tracker = Tracker("degradations", samples_dir=args.out_dir)
    adapter = DegradationAdapter(cfg, seed=cfg.seed, train=False, eval_codec=args.codec)
    rng = np.random.default_rng(cfg.seed)

    paths = list_image_files(args.gt_dir)[: args.max_images]
    os.makedirs(args.out_dir, exist_ok=True)
    for i, path in enumerate(paths):
        gt = load_image_rgb(path)
        h, w = gt.shape[:2]
        gt = gt[: h - h % 32, : w - w % 32]
        if args.plus:
            lr = bsrgan_degradation_plus(
                jnp.asarray(gt)[None],
                rng,
                jax.random.PRNGKey(i),
                cfg.upscale_factor,
                **{k: v for k, v in cfg.degradation_params.items() if k != "jpeg_prob" and k != "scale2_prob"},
            )
        else:
            lr = adapter({"gt": gt[None]}, i)["lr"]
        tracker.log_image(np.clip(np.asarray(lr)[0], 0, 1), f"lr_{i:03d}_{os.path.basename(path)}")
        print(f"[{i + 1}/{len(paths)}] {path} -> LR {lr.shape[1]}x{lr.shape[2]}")
    tracker.close()
    print(f"LR previews under {args.out_dir}")


if __name__ == "__main__":
    main()
