"""One-command pretrained-weight bootstrap (the egress-enabled companion
to ``tools/check_weights.py``).

This zero-egress image cannot download torchvision VGG19 / lpips-alex
weights, so the framework runs on seeded fallbacks and
``check_weights.py --strict`` is the preflight that reports the three
gates ABSENT. On any machine WITH the packages (and egress for the
torchvision/lpips downloads), this tool closes all three in one command:

    python tools/fetch_weights.py --out-dir weights/ \
        [--pristine-dir frames/] [--skip-tests]

Per gate it (1) produces the artifact via the existing porters
(``tools/port_torch_weights.py::vgg19_to_npz/lpips_to_npz``,
``srganfd_tpu.metrics.niqe.fit_niqe_model``), (2) validates the schema
with the same checkers the preflight uses, (3) prints the export lines,
and (4) re-runs the weight-sensitive test files with the env vars set.
Gates whose producer dependencies are missing are reported SKIPPED with
the reason — the command is rerunnable and idempotent (existing valid
artifacts are kept).

The NIQE gate needs a pristine-frame directory (the reference fits its
``niqe_model.mat`` offline the same way,
``ESRGAN/image_quality_assessment.py:1285-1333``); without
``--pristine-dir`` it stays gated. An existing ``niqe_model.mat`` can be
passed straight to ``$SRGANFD_NIQE_MODEL`` instead — the loader reads
both layouts.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import check_weights  # noqa: E402  (tools/check_weights.py)

ENV_VARS = {
    "vgg19": "SRGANFD_VGG19_NPZ",
    "lpips": "SRGANFD_LPIPS_NPZ",
    "niqe": "SRGANFD_NIQE_MODEL",
}

# test files that exercise the perceptual/NIQE surfaces; with the env vars
# set they run against the REAL weights instead of seeded fallbacks
GATED_TEST_FILES = [
    "tests/test_losses.py",
    "tests/test_feature_arch_parity.py",
    "tests/test_niqe.py",
]


def _produce_vgg19(path: str) -> str | None:
    try:
        from port_torch_weights import vgg19_to_npz

        vgg19_to_npz(path)
        return None
    except Exception as e:  # noqa: BLE001 — report, stay rerunnable
        return f"{type(e).__name__}: {e} (needs torchvision + egress)"


def _produce_lpips(path: str) -> str | None:
    try:
        from port_torch_weights import lpips_to_npz

        lpips_to_npz(path)
        return None
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {e} (needs the `lpips` pip package)"


def _produce_niqe(path: str, pristine_dir: str) -> str | None:
    if not pristine_dir:
        return "no --pristine-dir given (NIQE models are fit on pristine frames)"
    try:
        import glob

        import cv2

        from srganfd_tpu.metrics.niqe import fit_niqe_model, save_niqe_model

        frames = [
            cv2.imread(p).astype("float64")
            for p in sorted(glob.glob(os.path.join(pristine_dir, "*")))
            if cv2.imread(p) is not None
        ]
        if not frames:
            return f"no readable frames in {pristine_dir}"
        save_niqe_model(fit_niqe_model(frames), path)
        return None
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {e}"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out-dir", default="weights")
    ap.add_argument(
        "--pristine-dir", default="", help="pristine frames to fit the NIQE model on"
    )
    ap.add_argument("--skip-tests", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    plans = [
        ("vgg19", os.path.join(args.out_dir, "vgg19.npz"),
         lambda p: _produce_vgg19(p), check_weights.check_vgg19),
        ("lpips", os.path.join(args.out_dir, "lpips_alex.npz"),
         lambda p: _produce_lpips(p), check_weights.check_lpips),
        ("niqe", os.path.join(args.out_dir, "niqe_model.npz"),
         lambda p: _produce_niqe(p, args.pristine_dir), check_weights.check_niqe),
    ]

    produced: dict[str, str] = {}
    rc = 0
    for name, path, produce, validate in plans:
        env = ENV_VARS[name]
        if os.path.exists(path) and not validate(path):
            print(f"[{name}] OK (existing, valid): {path}")
            produced[env] = path
            continue
        err = produce(path)
        if err is not None:
            print(f"[{name}] SKIPPED: {err}")
            rc = 1
            continue
        errors = validate(path)
        if errors:
            print(f"[{name}] INVALID after produce ({path}):")
            for e in errors:
                print(f"    - {e}")
            rc = 1
            continue
        print(f"[{name}] OK (produced): {path}")
        produced[env] = path

    if produced:
        print("\nexport these (or pass the paths via the CLI flags):")
        for env, path in produced.items():
            print(f"  export {env}={os.path.abspath(path)}")

    if produced and not args.skip_tests:
        env = dict(os.environ, **{k: os.path.abspath(v) for k, v in produced.items()})
        env.setdefault("JAX_PLATFORMS", "cpu")
        env["PALLAS_AXON_POOL_IPS"] = ""
        print("\nre-running weight-sensitive tests with the artifacts active ...")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *GATED_TEST_FILES],
            cwd=str(pathlib.Path(__file__).resolve().parents[1]),
            env=env,
        )
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
