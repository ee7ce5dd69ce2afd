"""Dataset-level evaluation entry point.

Parity target: the reference ``test_*.py`` evaluation programs
(``BSRGAN/test_bsrgan.py:60-309``): SR every image in a GT dir (LR via
the config's degradation or a paired LR dir), compute PSNR/SSIM (+LPIPS
when weights are available, NIQE when a pristine model is available),
log images and a metrics dict to the tracker, print clamped averages.

Usage:
    python -m srganfd_tpu.cli.test --config bsrgan --gt-dir data/test \
        [--weights results/exp/ckpt_best] [--save-images]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu import configs
from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
from srganfd_tpu.data.datasets import TestImageDataset, TrainValidImageDataset, load_image_rgb, list_image_files
from srganfd_tpu.losses.lpips import Lpips
from srganfd_tpu.metrics.psnr_ssim import psnr_tensor, ssim_tensor
from srganfd_tpu.models import create_model
from srganfd_tpu.track.tracker import Tracker
from srganfd_tpu.train import checkpoint as ckpt


def _pad_to_multiple(img: np.ndarray, mult: int) -> tuple[np.ndarray, int, int]:
    h, w = img.shape[:2]
    ph, pw = (-h) % mult, (-w) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    return img, h, w


def main() -> None:
    ap = argparse.ArgumentParser(description="srganfd_tpu evaluation")
    ap.add_argument("--config", required=True)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--lr-dir", default="", help="paired LR dir; default: degrade GT per config")
    ap.add_argument("--weights", default="")
    ap.add_argument("--save-images", action="store_true")
    ap.add_argument("--max-images", type=int, default=0)
    args = ap.parse_args()

    cfg = configs.get_config(args.config, mode="test")
    model = create_model(cfg.g_arch, **cfg.g_kwargs)
    tracker = Tracker(cfg.experience_name or cfg.name, cfg.run_name, cfg.run_id,
                      samples_dir=cfg.samples_dir)

    gt_paths = list_image_files(args.gt_dir)
    if args.max_images:
        gt_paths = gt_paths[: args.max_images]
    lr_paths = list_image_files(args.lr_dir) if args.lr_dir else [None] * len(gt_paths)

    adapter = DegradationAdapter(cfg, seed=cfg.seed, train=False)
    lpips = Lpips()
    if not lpips.pretrained:
        print("! LPIPS weights unavailable: reporting surrogate LPIPS (relative only)")

    params = None
    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))

    psnrs, ssims, lpipses = [], [], []
    for i, (gt_path, lr_path) in enumerate(zip(gt_paths, lr_paths)):
        gt = load_image_rgb(gt_path)
        gt, h0, w0 = _pad_to_multiple(gt, 16 * cfg.upscale_factor)
        if lr_path is None:
            batch = adapter({"gt": gt[None]}, i)
            lr_img = np.asarray(batch["lr"])[0]
        else:
            lr_img = load_image_rgb(lr_path)

        x = jnp.asarray(lr_img)[None]
        if params is None:
            if args.weights:
                payload = ckpt.load_checkpoint(args.weights)
                params = payload["state"]["ema_g_params"]
            else:
                print("! no --weights: randomly initialized generator")
                params = model.init(jax.random.PRNGKey(0), x)["params"]
        sr = apply_fn(params, x)

        gt_t = jnp.asarray(gt)[None]
        p = float(psnr_tensor(sr, gt_t, cfg.upscale_factor, cfg.only_test_y_channel)[0])
        s = float(ssim_tensor(sr, gt_t, cfg.upscale_factor, cfg.only_test_y_channel)[0])
        l = float(lpips(sr, gt_t)[0])
        psnrs.append(p)
        ssims.append(s)
        lpipses.append(l)
        print(f"[{i + 1}/{len(gt_paths)}] {gt_path}  PSNR {p:.2f}  SSIM {s:.4f}  LPIPS {l:.4f}")
        if args.save_images:
            tracker.log_image(np.asarray(sr)[0][:h0, :w0], f"sr_{i:04d}")

    # clamped averages, matching test_bsrgan.py:276-309
    avg = {
        "PSNR": float(np.clip(np.mean(psnrs), 0, 100)),
        "SSIM": float(np.clip(np.mean(ssims), 0, 1)),
        "LPIPS": float(np.clip(np.mean(lpipses), 0, 1)),
    }
    print(f"== PSNR: {avg['PSNR']:.2f} dB  SSIM: {avg['SSIM']:.4f}  LPIPS: {avg['LPIPS']:.4f}")
    tracker.log_dict(avg, "test_metrics")
    tracker.close()


if __name__ == "__main__":
    main()
