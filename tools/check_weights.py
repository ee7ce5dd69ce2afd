"""Pretrained-weight preflight: report availability + validate schemas.

The reference trains against torchvision IMAGENET1K_V1 VGG19 features
(``ESRGAN/model.py:254-259``), selects models by real LPIPS
(``BSRGAN/train_bsrgan.py:185-188``) and scores NIQE against a pristine
``.mat`` model (``ESRGAN/image_quality_assessment.py:1285-1333``). None
of those weight files ship in this zero-egress image; the framework
falls back to seeded surrogates and documents the gap (PARITY.md
"weights checklist"). This tool tells you, for each gate:

  * whether the file is present (env var or --flag),
  * whether its schema is exactly what the loaders expect,
  * the one command that produces it on any machine with the packages.

Usage:
    python tools/check_weights.py \
        [--vgg19 path.npz] [--lpips path.npz] [--niqe path.mat|.npz] \
        [--strict]

Exit code 0 when every *provided* file validates (missing files are
reported but only fail under --strict).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# (torchvision features index, out_ch, in_ch) of VGG19's 16 convs —
# mirrors losses/content.py::_VGG19_CONV_LAYOUT
VGG19_SCHEMA = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256), (16, 256, 256),
    (19, 512, 256), (21, 512, 512), (23, 512, 512), (25, 512, 512),
    (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512),
]

# (out_ch, in_ch, kh, kw) of torchvision AlexNet's five convs —
# mirrors losses/lpips.py::AlexNetFeatures
LPIPS_ALEX_SCHEMA = [
    (64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
    (256, 384, 3, 3), (256, 256, 3, 3),
]
LPIPS_LIN_CHANNELS = [64, 192, 384, 256, 256]


def check_vgg19(path: str) -> list[str]:
    """Expected: .npz with features.{i}.weight (O,I,3,3) float +
    features.{i}.bias (O,) for the 16 conv indices."""
    errors = []
    data = np.load(path)
    for idx, out_ch, in_ch in VGG19_SCHEMA:
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk not in data or bk not in data:
            errors.append(f"missing {wk} / {bk}")
            continue
        w, b = data[wk], data[bk]
        if w.shape != (out_ch, in_ch, 3, 3):
            errors.append(f"{wk}: shape {w.shape} != {(out_ch, in_ch, 3, 3)}")
        if b.shape != (out_ch,):
            errors.append(f"{bk}: shape {b.shape} != {(out_ch,)}")
    return errors


def check_lpips(path: str) -> list[str]:
    """Expected: .npz with alex.{i}.weight (OIHW) + alex.{i}.bias for the
    five convs and lin.{i}.weight reshapeable to (C,) for the heads."""
    errors = []
    data = np.load(path)
    for i, shape in enumerate(LPIPS_ALEX_SCHEMA):
        wk, bk = f"alex.{i}.weight", f"alex.{i}.bias"
        if wk not in data or bk not in data:
            errors.append(f"missing {wk} / {bk}")
            continue
        if data[wk].shape != shape:
            errors.append(f"{wk}: shape {data[wk].shape} != {shape}")
        if data[bk].shape != (shape[0],):
            errors.append(f"{bk}: shape {data[bk].shape} != {(shape[0],)}")
    for i, c in enumerate(LPIPS_LIN_CHANNELS):
        lk = f"lin.{i}.weight"
        if lk not in data:
            errors.append(f"missing {lk}")
        elif int(np.prod(data[lk].shape)) != c:
            errors.append(f"{lk}: {data[lk].shape} not reshapeable to ({c},)")
    return errors


def check_niqe(path: str) -> list[str]:
    """Expected: .mat with mu_prisparam (36,) + cov_prisparam (36,36), or
    .npz with mu_pris_param/cov_pris_param (the two reference layouts)."""
    errors = []
    try:
        from srganfd_tpu.metrics.niqe import load_niqe_model

        model = load_niqe_model(path)
    except Exception as e:  # noqa: BLE001 - report, don't crash preflight
        return [f"unreadable: {type(e).__name__}: {e}"]
    if model.mu.shape != (36,):
        errors.append(f"mu shape {model.mu.shape} != (36,)")
    if model.cov.shape != (36, 36):
        errors.append(f"cov shape {model.cov.shape} != (36, 36)")
    return errors


GATES = [
    {
        "name": "VGG19 content-loss weights",
        "env": "SRGANFD_VGG19_NPZ",
        "flag": "vgg19",
        "check": check_vgg19,
        "produce": (
            "python -c \"import sys; sys.path.insert(0, 'tools'); "
            "from port_torch_weights import vgg19_to_npz; "
            "vgg19_to_npz('vgg19.npz')\"  # needs torchvision"
        ),
        "effect": "exact perceptual (content) loss instead of seeded features",
    },
    {
        "name": "LPIPS alex weights",
        "env": "SRGANFD_LPIPS_NPZ",
        "flag": "lpips",
        "check": check_lpips,
        "produce": (
            "python -c \"import sys; sys.path.insert(0, 'tools'); "
            "from port_torch_weights import lpips_to_npz; "
            "lpips_to_npz('lpips_alex.npz')\"  # needs pip package lpips"
        ),
        "effect": "real LPIPS metric + LPIPS-driven model selection",
    },
    {
        "name": "NIQE pristine model",
        "env": "SRGANFD_NIQE_MODEL",
        "flag": "niqe",
        "check": check_niqe,
        "produce": (
            "python -c \"from srganfd_tpu.metrics.niqe import *; import cv2, glob; "
            "save_niqe_model(fit_niqe_model([cv2.imread(p).astype('float64') "
            "for p in glob.glob('pristine/*.png')]), 'niqe_model.npz')\""
        ),
        "effect": "NIQE scores comparable to the reference's niqe_model.mat",
    },
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    for gate in GATES:
        ap.add_argument(f"--{gate['flag']}", default=None, help=f"path for: {gate['name']}")
    ap.add_argument("--strict", action="store_true", help="missing files also fail")
    args = ap.parse_args()

    rc = 0
    print("pretrained-weight preflight")
    print("=" * 64)
    for gate in GATES:
        path = getattr(args, gate["flag"]) or os.environ.get(gate["env"], "")
        print(f"\n{gate['name']}")
        print(f"  env var : {gate['env']}")
        print(f"  unlocks : {gate['effect']}")
        if not path or not os.path.exists(path):
            print(f"  status  : ABSENT{' (path given but not found)' if path else ''}")
            print(f"  produce : {gate['produce']}")
            if args.strict:
                rc = 1
            continue
        errors = gate["check"](path)
        if errors:
            rc = 1
            print(f"  status  : INVALID ({path})")
            for e in errors:
                print(f"    - {e}")
        else:
            print(f"  status  : OK ({path})")
    print()
    return rc


if __name__ == "__main__":
    sys.exit(main())
