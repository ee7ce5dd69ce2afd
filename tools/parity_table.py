"""One-command real-data parity gate vs reference checkpoints.

Collapses the four-step manual workflow (port ``.pth`` ->
``check_weights --strict`` -> per-family ``cli.test`` -> compare vs
BASELINE.md) into a single command that produces the full parity table
with pass/fail on the 0.1 dB bar (BASELINE.json north star: "PSNR/SSIM
within 0.1 dB of the PyTorch reference"):

    python tools/parity_table.py --gt-dir DIR \
        --entry bsrgan_x4=BSRGAN_x4.pth.tar --entry rrdbnet_x4=... \
        [--lr-dir DIR] [--max-images N] [--out parity.json]

Per entry (ARCH=CHECKPOINT):

1. ``.pth``/``.pth.tar`` checkpoints port through
   ``tools/port_torch_weights.py`` (already-ported ``.npz`` pass through).
2. **Ours**: the production eval CLI (``cli.test``'s ``run_eval``) runs
   the ported weights on the GT/LR pairs -> PSNR/SSIM.
3. **Reference side**: by default the SAME raw state dict loads into the
   reference-topology torch twin (``tools/torch_twins.py``) and is
   evaluated on the SAME frames with the same (bit-faithful) metrics —
   so the delta isolates model-output differences, which is exactly what
   the 0.1 dB bar measures. ``--targets targets.json`` substitutes fixed
   numbers (e.g. BASELINE.md rows) instead: {"arch": {"PSNR": x, "SSIM": y}}.
4. The table prints, lands in ``--out`` as JSON, and the exit code is
   non-zero if any row fails |dPSNR| <= --tol-psnr (0.1 dB) or
   |dSSIM| <= --tol-ssim.

If no LR dir is given, deterministic LR frames are minted once (MATLAB
bicubic 1/sf, the ESRGAN eval convention — ``ESRGAN/dataset.py:57-84``)
and shared by BOTH sides, so the comparison never depends on degradation
randomness.

Proven NOW with suite-minted stand-in ``.pth`` files
(tests/test_parity_table.py), so the moment real reference checkpoints
appear the table is one command away with zero new code.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import port_torch_weights as port  # noqa: E402

ARCH_TO_CONFIG = {
    "rrdbnet_x1": "rrdbnet", "rrdbnet_x2": "rrdbnet", "rrdbnet_x4": "rrdbnet",
    "rrdbnet_x8": "rrdbnet", "bsrgan_x2": "bsrgan", "bsrgan_x4": "bsrgan",
    "realesrgan_x4": "realesrgan",
}


def _mint_lr_dir(gt_paths: list[str], out_dir: str, sf: int) -> None:
    import cv2
    import jax.numpy as jnp

    from srganfd_tpu.ops.resize import imresize

    os.makedirs(out_dir, exist_ok=True)
    for p in gt_paths:
        img = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
        lr = np.asarray(imresize(jnp.asarray(img), 1.0 / sf))
        lr8 = np.clip(np.round(lr * 255.0), 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, os.path.basename(p)), lr8[..., ::-1])


def _metrics_for_frames(
    sr_by_name: dict[str, np.ndarray], gt_dir: str, sf: int
) -> tuple[float, float]:
    """Reference eval conventions: Y-channel PSNR/SSIM, crop border = sf
    (the torch PSNR/SSIM modules' defaults — bit-faithful in metrics/)."""
    import cv2
    import jax.numpy as jnp

    from srganfd_tpu.metrics import PSNR, SSIM

    psnr = PSNR(sf, True)
    ssim = SSIM(sf, True)
    ps, ss = [], []
    for name, sr in sr_by_name.items():
        gt = cv2.imread(os.path.join(gt_dir, name))[..., ::-1].astype(np.float32) / 255.0
        h = min(gt.shape[0], sr.shape[0])
        w = min(gt.shape[1], sr.shape[1])
        a = jnp.asarray(sr[None, :h, :w])
        b = jnp.asarray(gt[None, :h, :w])
        ps.append(float(psnr(a, b)[0]))
        ss.append(float(ssim(a, b)[0]))
    return float(np.mean(ps)), float(np.mean(ss))


def _flax_kwargs(arch: str, g_kwargs: dict) -> dict:
    """The Flax RRDB models name their block count ``num_blocks``
    (rrdbnet) vs ``num_rrdb`` (bsrgan/realesrgan), mirroring the
    reference constructors; accept either spelling in --g-kwargs."""
    kw = dict(g_kwargs)
    nb = kw.pop("num_blocks", kw.pop("num_rrdb", None))
    if nb is not None:
        kw["num_blocks" if arch.startswith("rrdbnet") else "num_rrdb"] = nb
    return kw


def _eval_ours(arch: str, npz_path: str, gt_dir: str, lr_dir: str,
               max_images: int, g_kwargs: dict) -> tuple[float, float]:
    from srganfd_tpu.cli.test import run_eval

    args = types.SimpleNamespace(
        config=ARCH_TO_CONFIG[arch], gt_dir=gt_dir, lr_dir=lr_dir,
        weights=npz_path, save_images=False, max_images=max_images,
        subdivision_lpips=False, save_discriminator_eval=False,
        save_attention_layers=False, niqe_model="", niqe_impl="numpy",
        self_ensemble=False, tile=0, tile_overlap=16, tiny=False,
        use_ema=False, exact_shapes=True, g_kwargs=_flax_kwargs(arch, g_kwargs),
        g_arch=arch,
    )
    out = run_eval(args)
    return out["avg"]["PSNR"], out["avg"]["SSIM"]


def _eval_torch_twin(arch: str, sd: dict, gt_dir: str, lr_dir: str,
                     gt_paths: list[str], sf: int, g_kwargs: dict) -> tuple[float, float]:
    import cv2
    import torch

    from torch_twins import build_twin

    kw = {
        "channels": g_kwargs.get("channels", 64),
        "growth_channels": g_kwargs.get("growth_channels", 32),
        "num_blocks": g_kwargs.get("num_blocks", g_kwargs.get("num_rrdb", 23)),
    }
    twin = build_twin(arch, **kw).eval()
    missing, unexpected = twin.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    sr_by_name = {}
    with torch.no_grad():
        for p in gt_paths:
            name = os.path.basename(p)
            lr = cv2.imread(os.path.join(lr_dir, name))[..., ::-1].astype(np.float32) / 255.0
            x = torch.from_numpy(np.moveaxis(lr, -1, 0)[None])
            sr = twin(x).numpy()[0]
            sr_by_name[name] = np.moveaxis(sr, 0, -1)
    return _metrics_for_frames(sr_by_name, gt_dir, sf)


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--lr-dir", default="", help="paired LR dir; default: mint bicubic LR once, shared by both sides")
    ap.add_argument("--entry", action="append", required=True,
                    help="ARCH=CHECKPOINT (.pth/.pth.tar ports automatically; .npz passes through)")
    ap.add_argument("--targets", default="",
                    help="JSON {arch: {PSNR, SSIM}} to gate against instead of the torch twin")
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument("--tol-psnr", type=float, default=0.1)
    ap.add_argument("--tol-ssim", type=float, default=0.005)
    ap.add_argument("--out", default="parity_table.json")
    ap.add_argument("--g-kwargs", default="{}",
                    help='JSON model-size overrides, e.g. \'{"channels":8,"growth_channels":4,"num_blocks":1}\'')
    args = ap.parse_args(argv)

    from srganfd_tpu.data.datasets import list_image_files

    g_kwargs = json.loads(args.g_kwargs)
    targets = json.loads(open(args.targets).read()) if args.targets else None
    rows = []
    all_ok = True
    for entry in args.entry:
        arch, _, ckpt_path = entry.partition("=")
        if arch not in ARCH_TO_CONFIG:
            raise SystemExit(
                f"{arch}: no torch-twin/config mapping (supported: {sorted(ARCH_TO_CONFIG)}); "
                "use --targets mode via cli.test for other archs"
            )
        sf = int(arch.rpartition("_x")[2])
        gt_paths = list_image_files(args.gt_dir)
        if args.max_images:
            gt_paths = gt_paths[: args.max_images]

        with tempfile.TemporaryDirectory() as td:
            lr_dir = args.lr_dir
            if not lr_dir:
                lr_dir = os.path.join(td, "lr")
                _mint_lr_dir(gt_paths, lr_dir, sf)

            sd = None
            if ckpt_path.endswith(".npz"):
                npz_path = ckpt_path
                if targets is None:
                    raise SystemExit(
                        f"{arch}: torch-twin mode needs the raw .pth (got .npz); "
                        "pass --targets or the original checkpoint"
                    )
            else:
                sd = port.load_torch_state_dict(ckpt_path)
                nb = g_kwargs.get("num_blocks", g_kwargs.get("num_rrdb", 23))
                params = port.convert_rrdb_generator(sd, num_blocks=nb)
                npz_path = os.path.join(td, f"{arch}.npz")
                np.savez(npz_path, **port.flatten(params))

            ours_psnr, ours_ssim = _eval_ours(
                arch, npz_path, args.gt_dir, lr_dir, args.max_images, g_kwargs
            )
            if targets is not None:
                ref_psnr = float(targets[arch]["PSNR"])
                ref_ssim = float(targets[arch]["SSIM"])
                ref_src = "targets"
            else:
                ref_psnr, ref_ssim = _eval_torch_twin(
                    arch, sd, args.gt_dir, lr_dir, gt_paths, sf, g_kwargs
                )
                ref_src = "torch-twin"

        d_psnr = ours_psnr - ref_psnr
        d_ssim = ours_ssim - ref_ssim
        ok = abs(d_psnr) <= args.tol_psnr and abs(d_ssim) <= args.tol_ssim
        all_ok &= ok
        rows.append({
            "arch": arch, "frames": len(gt_paths), "ref_source": ref_src,
            "ours_psnr": round(ours_psnr, 4), "ref_psnr": round(ref_psnr, 4),
            "delta_psnr": round(d_psnr, 4),
            "ours_ssim": round(ours_ssim, 6), "ref_ssim": round(ref_ssim, 6),
            "delta_ssim": round(d_ssim, 6),
            "pass": bool(ok),
        })

    header = f"| arch | n | ours PSNR | ref PSNR | dPSNR | ours SSIM | ref SSIM | dSSIM | pass |"
    print(header)
    print("|" + "---|" * 9)
    for r in rows:
        print(
            f"| {r['arch']} | {r['frames']} | {r['ours_psnr']:.2f} | {r['ref_psnr']:.2f} "
            f"| {r['delta_psnr']:+.3f} | {r['ours_ssim']:.4f} | {r['ref_ssim']:.4f} "
            f"| {r['delta_ssim']:+.4f} | {'PASS' if r['pass'] else 'FAIL'} |"
        )
    result = {
        "rows": rows,
        "tol_psnr": args.tol_psnr,
        "tol_ssim": args.tol_ssim,
        "all_pass": bool(all_ok),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"-> {args.out}")
    return result


def main() -> None:
    result = run()
    raise SystemExit(0 if result["all_pass"] else 1)


if __name__ == "__main__":
    main()
