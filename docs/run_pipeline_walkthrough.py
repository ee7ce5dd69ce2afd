"""Runnable end-to-end pipeline walkthrough on synthetic data.

One-command CPU reproduction of the reference's ``ESRGANpipeline.ipynb``
flow (``/root/reference/ESRGAN/ESRGANpipeline.ipynb`` cells 3-10):
LR generation -> train/valid/test split -> training -> evaluation ->
inference, all through the real CLI surfaces, in a few minutes:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python docs/run_pipeline_walkthrough.py

Everything is written under ./walkthrough_out (override with --workdir).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def banner(msg: str) -> None:
    print(f"\n{'=' * 8} {msg} {'=' * 8}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="walkthrough_out")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()
    t0 = time.time()

    import cv2

    work = pathlib.Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    raw = work / "raw"
    raw.mkdir(parents=True)
    os.chdir(work)

    # -- synthetic "Bubbles"-like frames (smooth flow + bubbles) ----------
    banner("0. synthesize CFD-like frames")
    rng = np.random.default_rng(0)
    for i in range(args.frames):
        base = rng.uniform(0, 1, (12, 12, 3))
        img = cv2.resize(base, (192, 192), interpolation=cv2.INTER_CUBIC)
        yy, xx = np.mgrid[0:192, 0:192]
        for _ in range(6):  # bubbles
            cy, cx, r = rng.integers(20, 172, 2).tolist() + [int(rng.integers(5, 18))]
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[mask] = img[mask] * 0.3 + 0.7
        cv2.imwrite(f"raw/frame{i:03d}.png", (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.frames} frames to raw/")

    # -- cell 3: LR generation (cv2 1/4 resize) ---------------------------
    banner("1. create LR images (notebook cell 3)")
    os.makedirs("rawLR", exist_ok=True)
    for name in sorted(os.listdir("raw")):
        image = cv2.imread(f"raw/{name}", cv2.IMREAD_UNCHANGED)
        cv2.imwrite(f"rawLR/{name}", cv2.resize(image, None, fx=0.25, fy=0.25,
                                                interpolation=cv2.INTER_CUBIC))
    print(f"wrote {len(os.listdir('rawLR'))} LR images to rawLR/")

    # -- cell 5: split train/valid/test -----------------------------------
    banner("2. split dataset (notebook cell 5)")
    from srganfd_tpu.cli.split_dataset import split_dataset

    counts = split_dataset("raw", "data", train=0.6, valid=0.2, seed=0)
    print(f"split: {counts}")

    # -- cell 7: train (tiny RRDBNet L1 pretrain, then a short GAN leg) ---
    banner("3. train (notebook cell 7)")
    from srganfd_tpu.cli.train import run_train
    from srganfd_tpu.configs import get_config

    tiny_g = {"channels": 8, "growth_channels": 4}
    pre = run_train(
        get_config(
            "rrdbnet",
            train_gt_images_dir="data/train",
            valid_gt_images_dir="data/valid",
            epochs=2,
            batch_size=2,
            gt_image_size=64,
            compute_dtype="float32",
            g_kwargs={**tiny_g, "num_blocks": 1},
        ),
        steps_per_epoch=args.steps,
    )
    print(f"pretrain best PSNR {pre['best_psnr']:.2f} dB")

    gan = run_train(
        get_config(
            "bsrgan",  # thesis family: degradation chain + SN U-Net D
            train_gt_images_dir="data/train",
            valid_gt_images_dir="data/valid",
            epochs=1,
            batch_size=2,
            gt_image_size=64,
            crop_image_size=96,
            compute_dtype="float32",
            content_weight=(),  # no VGG19 npz in this image
            g_kwargs={**tiny_g, "num_rrdb": 1},
            d_kwargs={"channels": 8},
        ),
        steps_per_epoch=args.steps,
    )
    print(f"GAN leg best PSNR {gan['best_psnr']:.2f} dB")

    # -- cell 10: test -----------------------------------------------------
    banner("4. evaluate (notebook cell 10)")
    from argparse import Namespace

    from srganfd_tpu.cli.test import run_eval

    res = run_eval(Namespace(
        config="rrdbnet", gt_dir="data/test", lr_dir="",
        weights="results/train_RRDBNet_x4/ckpt_best",
        save_images=False, max_images=0, subdivision_lpips=False,
        save_discriminator_eval=False, save_attention_layers=False,
        niqe_model="", tiny=True, use_ema=False, exact_shapes=False,
    ))
    print(f"eval averages: {res['avg']}")

    # -- inference ---------------------------------------------------------
    banner("5. single-image inference")
    from srganfd_tpu.cli import infer as infer_cli

    sys.argv = ["infer", "--model-arch", "rrdbnet_x4", "--inputs-path",
                sorted(pathlib.Path("rawLR").glob("*.png"))[0].as_posix(),
                "--output-path", "sr.png"]
    infer_cli.main()

    banner("done")
    print(
        f"walkthrough complete in {time.time() - t0:.0f}s — outputs in "
        f"{work.resolve()} (checkpoints under results/, logs under samples/logs/, "
        "tracker events in samples/logs/*/events.jsonl — the mlflow-ui analog "
        "of notebook cell 8)"
    )


if __name__ == "__main__":
    main()
