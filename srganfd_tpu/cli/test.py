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
import os

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu import configs
from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
from srganfd_tpu.data.datasets import load_image_rgb, list_image_files
from srganfd_tpu.losses.lpips import Lpips
from srganfd_tpu.metrics.psnr_ssim import psnr_tensor_padded, ssim_tensor_padded
from srganfd_tpu.models import create_model
from srganfd_tpu.track.tracker import Tracker
from srganfd_tpu.train import checkpoint as ckpt


# 'auto' NIQE-impl pixel budget: above this, the bit-exact torch twin
# (which twins the reference module's cost — minutes per megapixel-class
# frame on small hosts) yields to the numpy implementation (~seconds).
NIQE_AUTO_MODULE_MAX_PIXELS = 512 * 512


def select_niqe_impl(impl: str, module_available: bool, n_pixels: int) -> str:
    """Resolve ``--niqe-impl`` per frame. 'auto' keeps the bit-exact torch
    twin for crops/small frames but falls back to the numpy ``niqe()``
    above ``NIQE_AUTO_MODULE_MAX_PIXELS`` (scores differ by convention —
    PARITY.md); explicit choices are honored unconditionally."""
    if impl == "numpy" or not module_available:
        return "numpy"
    if impl == "module":
        return "module"
    return "module" if n_pixels <= NIQE_AUTO_MODULE_MAX_PIXELS else "numpy"


def _pad_to_multiple(img: np.ndarray, mult: int) -> tuple[np.ndarray, int, int]:
    h, w = img.shape[:2]
    ph, pw = (-h) % mult, (-w) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    return img, h, w


def _match_hw(x: jax.Array, height: int, width: int) -> jax.Array:
    """Crop / zero-pad an NHWC array to (height, width); padded regions are
    masked out of the metrics anyway."""
    x = x[:, :height, :width]
    ph, pw = height - x.shape[1], width - x.shape[2]
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x


def main() -> None:
    ap = argparse.ArgumentParser(description="srganfd_tpu evaluation")
    ap.add_argument("--config", required=True)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--lr-dir", default="", help="paired LR dir; default: degrade GT per config")
    ap.add_argument("--weights", default="")
    ap.add_argument("--save-images", action="store_true")
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument(
        "--subdivision-lpips",
        action="store_true",
        help="LPIPS on 2x2 quadrants, averaged (test_bsrgan.py:233-268)",
    )
    ap.add_argument(
        "--save-discriminator-eval",
        action="store_true",
        help="log sigmoid heat-maps of D(gt) and D(sr) (test_bsrgan.py:182-212)",
    )
    ap.add_argument(
        "--save-attention-layers",
        action="store_true",
        help="log discriminator attention maps (test_bsrgan.py:216-221 / A-ESRGAN getAttentionLayers)",
    )
    ap.add_argument(
        "--niqe-model",
        default=os.environ.get("SRGANFD_NIQE_MODEL", ""),
        help=".mat/.npz pristine model; enables NIQE (default $SRGANFD_NIQE_MODEL)",
    )
    ap.add_argument(
        "--niqe-impl",
        choices=("auto", "module", "numpy"),
        default="auto",
        help="which reference NIQE to match: 'module' = bit-exact twin of "
        "the torch NIQE the eval scripts call (test_bsrgan.py:125,227; "
        "needs torch), 'numpy' = the numpy niqe() implementation; "
        "'auto' picks module when torch is importable, falling back to "
        "numpy above 512x512 px/frame (the twin costs minutes per "
        "megapixel frame, as the reference module does)",
    )
    ap.add_argument(
        "--self-ensemble",
        action="store_true",
        help="x8 geometric self-ensemble (rotations x flip averaged after "
        "inverse mapping) before computing metrics — beyond the "
        "reference; typically +0.1-0.3 dB PSNR at 8x eval FLOPs",
    )
    ap.add_argument(
        "--tile", type=int, default=0,
        help="evaluate via overlapping-tile SR (feathered stitch) instead "
        "of whole-frame forwards — keeps transformer archs "
        "(bsrgantrans/aesrgan) at their TRAINING token count on large "
        "frames, where whole-frame attention is out-of-distribution; "
        "0 = whole frame",
    )
    ap.add_argument("--tile-overlap", type=int, default=16)
    ap.add_argument("--tiny", action="store_true", help="shrink models (matches train --tiny)")
    ap.add_argument(
        "--codec", choices=["diffjpeg", "cv2"], default="diffjpeg",
        help="degradation JPEG stages for config-degraded LR: jittable "
        "DiffJPEG (default) or the reference's entropy-coded cv2 round "
        "trip (byte-exact vs BSRGAN/imgproc.py:284-293, host-side)",
    )
    ap.add_argument("--use-ema", action="store_true", help="evaluate the EMA generator instead of the raw one")
    ap.add_argument(
        "--exact-shapes",
        action="store_true",
        help="disable shape bucketing: one compile per image size, but no "
        "reflect-pad seam inside the generator's receptive field "
        "(strictest reference parity; metrics are exact either way)",
    )
    args = ap.parse_args()
    run_eval(args)


def run_eval(args) -> dict:
    cfg = configs.get_config(args.config, mode="test")
    if args.tiny:
        shrink = {"channels": 8, "growth_channels": 4}
        count_key = "num_blocks" if cfg.g_arch.startswith("rrdbnet") else "num_rrdb"
        cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, **shrink, count_key: 1})
    # programmatic overrides (tools/parity_table.py evaluates sibling archs
    # — e.g. rrdbnet_x2 — under the family config, at ported sizes)
    if getattr(args, "g_arch", ""):
        import re

        m = re.search(r"_x(\d+)$", args.g_arch)
        # archs without an _x<n> suffix (gen_rpa2x, gen_rrdb2x) keep the
        # config's upscale factor
        sf_override = int(m.group(1)) if m else cfg.upscale_factor
        cfg = cfg.replace(g_arch=args.g_arch, upscale_factor=sf_override)
    if getattr(args, "g_kwargs", None):
        cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, **args.g_kwargs})
    model = create_model(cfg.g_arch, **cfg.g_kwargs)
    tracker = Tracker(cfg.experience_name or cfg.name, cfg.run_name, cfg.run_id,
                      samples_dir=cfg.samples_dir)

    gt_paths = list_image_files(args.gt_dir)
    if args.max_images:
        gt_paths = gt_paths[: args.max_images]
    lr_paths = list_image_files(args.lr_dir) if args.lr_dir else [None] * len(gt_paths)

    # getattr: run_eval is also driven programmatically with hand-built
    # Namespaces (tests, tools/parity_table.py) that predate --codec
    adapter = DegradationAdapter(
        cfg, seed=cfg.seed, train=False, eval_codec=getattr(args, "codec", "diffjpeg")
    )
    lpips = Lpips()
    if not lpips.pretrained:
        print("! LPIPS weights unavailable: reporting surrogate LPIPS (relative only)")

    niqe_model = None
    niqe_use_module = False
    niqe_auto_noted = False
    if args.niqe_model:
        from srganfd_tpu.metrics import niqe as niqe_mod

        niqe_model = niqe_mod.load_niqe_model(args.niqe_model)
        if args.niqe_impl in ("auto", "module"):
            from srganfd_tpu.metrics import niqe_torch

            niqe_use_module = niqe_torch.available()
            if args.niqe_impl == "module" and not niqe_use_module:
                raise SystemExit("--niqe-impl module requires torch")

    d_model = d_variables = None
    if (args.save_discriminator_eval or args.save_attention_layers) and cfg.d_arch:
        d_model = create_model(cfg.d_arch, **cfg.d_kwargs)

    params = None
    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))

    sf = cfg.upscale_factor
    mult = max(64, 16 * sf)
    psnrs, ssims, lpipses, niqes = [], [], [], []
    for i, (gt_path, lr_path) in enumerate(zip(gt_paths, lr_paths)):
        gt = load_image_rgb(gt_path)
        if getattr(args, "exact_shapes", False):
            h0, w0 = gt.shape[:2]
        else:
            # shape bucketing: reflect-pad to a coarse multiple so a
            # size-varied test set compiles <= #buckets programs; metrics
            # read only the valid region (masked kernels — exact)
            gt, h0, w0 = _pad_to_multiple(gt, mult)
        if lr_path is None:
            batch = adapter({"gt": gt[None]}, i)
            lr_img = np.asarray(batch["lr"])[0]
        else:
            lr_img = load_image_rgb(lr_path)
            if not getattr(args, "exact_shapes", False):
                lr_img, _, _ = _pad_to_multiple(lr_img, mult // sf)

        x = jnp.asarray(lr_img)[None]
        if params is None:
            if args.weights and args.weights.endswith(".npz"):
                # flat npz in the tools/port_torch_weights.py layout — a
                # ported reference .pth.tar evaluates directly. An npz
                # carries ONE param tree, so --use-ema cannot select an
                # EMA variant — say so instead of silently evaluating raw
                if args.use_ema:
                    print(
                        "! --use-ema ignored: .npz weights carry a single "
                        "param tree (no EMA variant to select)"
                    )
                params = ckpt.load_pretrained_params(args.weights)
            elif args.weights:
                payload = ckpt.load_checkpoint(args.weights)
                key = "ema_g_params" if args.use_ema else "g_params"
                if args.use_ema:
                    ckpt.warn_if_young_ema(
                        payload, cfg.model_ema_decay,
                        cfg.ema_reference_semantics,
                    )
                params = payload["state"][key]
            else:
                print("! no --weights: randomly initialized generator")
                params = model.init(jax.random.PRNGKey(0), x)["params"]
        if getattr(args, "self_ensemble", False) and getattr(args, "tile", 0):
            raise SystemExit(
                "--self-ensemble and --tile cannot combine (the ensemble "
                "runs whole-frame forwards, defeating --tile's "
                "in-distribution token count)"
            )
        if getattr(args, "self_ensemble", False):
            from srganfd_tpu.ops.self_ensemble import self_ensemble_batched

            sr_img = jnp.asarray(self_ensemble_batched(apply_fn, params, lr_img))[None]
        elif getattr(args, "tile", 0):
            from srganfd_tpu.parallel.tiled_inference import tiled_sr

            sr_img = jnp.asarray(
                tiled_sr(
                    apply_fn, params, np.asarray(lr_img), sf,
                    tile=args.tile, overlap=args.tile_overlap,
                )
            )[None]
        else:
            sr_img = apply_fn(params, x)
        sr = _match_hw(sr_img, gt.shape[0], gt.shape[1])

        gt_t = jnp.asarray(gt)[None]
        valid = jnp.asarray([[h0, w0]], jnp.int32)
        p = float(psnr_tensor_padded(sr, gt_t, valid, sf, cfg.only_test_y_channel)[0])
        s = float(ssim_tensor_padded(sr, gt_t, valid, sf, cfg.only_test_y_channel)[0])
        # perceptual metrics + outputs use the valid crop (Lpips here is
        # un-jitted: no compile per shape)
        sr_np = np.asarray(sr)[0][:h0, :w0]
        sr_v = jnp.asarray(sr_np)[None]
        gt_v = gt_t[:, :h0, :w0]
        if args.subdivision_lpips:
            # 2x2 quadrant LPIPS averaged (test_bsrgan.py:233-268)
            hh, ww = h0 // 2, w0 // 2
            vals = []
            for qy in (0, 1):
                for qx in (0, 1):
                    vals.append(
                        float(
                            lpips(
                                sr_v[:, qy * hh : (qy + 1) * hh, qx * ww : (qx + 1) * ww],
                                gt_v[:, qy * hh : (qy + 1) * hh, qx * ww : (qx + 1) * ww],
                            )[0]
                        )
                    )
            l = float(np.mean(vals))
        else:
            l = float(lpips(sr_v, gt_v)[0])
        psnrs.append(p)
        ssims.append(s)
        lpipses.append(l)
        extra = ""
        if niqe_model is not None:
            from srganfd_tpu.metrics import niqe as niqe_mod

            sel = select_niqe_impl(
                args.niqe_impl, niqe_use_module,
                sr_np.shape[0] * sr_np.shape[1],
            )
            if niqe_use_module and sel == "numpy" and not niqe_auto_noted:
                niqe_auto_noted = True
                print(
                    "! --niqe-impl auto: frame exceeds "
                    f"{NIQE_AUTO_MODULE_MAX_PIXELS} px, using the numpy "
                    "niqe() (pass --niqe-impl module to force the torch twin)"
                )
            try:
                if sel == "module":
                    from srganfd_tpu.metrics.niqe_torch import niqe_torch_exact

                    n_score = niqe_torch_exact(sr_np.astype(np.float32), niqe_model)
                else:
                    n_score = niqe_mod.niqe(sr_np[..., ::-1] * 255.0, niqe_model)
            except ValueError as e:
                # e.g. too few 96px blocks on small SR frames — the
                # reference NIQE divides by zero there; skip the frame's
                # NIQE instead of aborting the whole eval
                print(f"! NIQE skipped for this frame: {e}")
                n_score = float("nan")
            if np.isfinite(n_score):
                niqes.append(n_score)
            extra = f"  NIQE {n_score:.3f}"
        print(f"[{i + 1}/{len(gt_paths)}] {gt_path}  PSNR {p:.2f}  SSIM {s:.4f}  LPIPS {l:.4f}{extra}")
        if args.save_images:
            tracker.log_image(sr_np, f"sr_{i:04d}")
        if d_model is not None:
            if d_variables is None:
                d_variables = d_model.init(jax.random.PRNGKey(0), gt_t)
                if args.weights:
                    # the training checkpoint carries d_params + d_vars
                    payload_d = ckpt.load_checkpoint(args.weights)
                    state_d = payload_d["state"]
                    if state_d.get("d_params") is not None:
                        d_variables = {
                            "params": state_d["d_params"],
                            **(state_d.get("d_vars") or {}),
                        }
                    else:
                        print("! checkpoint has no discriminator: using random D for heat-maps")
            d_out = d_model.apply(d_variables, gt_t)
            sr_out = d_model.apply(d_variables, sr)
            logits_gt, logits_sr = (
                (d_out[0], sr_out[0]) if isinstance(d_out, tuple) else (d_out, sr_out)
            )
            if args.save_discriminator_eval and logits_gt.ndim == 4:
                tracker.log_image(
                    np.asarray(jax.nn.sigmoid(logits_gt))[0][:h0, :w0], f"d_gt_{i:04d}"
                )
                tracker.log_image(
                    np.asarray(jax.nn.sigmoid(logits_sr))[0][:h0, :w0], f"d_sr_{i:04d}"
                )
            if args.save_attention_layers and isinstance(sr_out, tuple):
                attn = sr_out[1]
                maps = attn if isinstance(attn, tuple) else (attn,)
                for j, m in enumerate(maps):
                    arr = np.asarray(m)[0]
                    if arr.ndim == 2:  # token attention: avg over queries
                        side = int(np.sqrt(arr.shape[-1]))
                        arr = arr.mean(axis=0).reshape(side, side)
                    arr = (arr - arr.min()) / (arr.max() - arr.min() + 1e-8)
                    tracker.log_image(np.squeeze(arr)[..., None].repeat(3, -1), f"attn{j}_{i:04d}")

    # clamped averages, matching test_bsrgan.py:276-309
    avg = {
        "PSNR": float(np.clip(np.mean(psnrs), 0, 100)),
        "SSIM": float(np.clip(np.mean(ssims), 0, 1)),
        "LPIPS": float(np.clip(np.mean(lpipses), 0, 1)),
    }
    if niqes:
        avg["NIQE"] = float(np.clip(np.mean(niqes), 0, 100))
    niqe_str = f"  NIQE: {avg['NIQE']:.3f}" if "NIQE" in avg else ""
    print(
        f"== PSNR: {avg['PSNR']:.2f} dB  SSIM: {avg['SSIM']:.4f}  "
        f"LPIPS: {avg['LPIPS']:.4f}{niqe_str}"
    )
    tracker.log_dict(avg, "test_metrics")
    tracker.close()
    return {
        "avg": avg,
        # distinct compiled generator programs this eval (== #buckets hit)
        "generator_compiles": apply_fn._cache_size() if hasattr(apply_fn, "_cache_size") else -1,
    }


if __name__ == "__main__":
    main()
