"""Real-CFD-frame IQA goldens from the reference's own published results.

The reference repo ships no checkpoints, but it does ship the thesis's
actual SR outputs: 45 real CFD "Bubbles" frames (640x480 JPEGs) under
``/root/reference/Results/{allResults/*,bsrgan}/`` — 5 scenes x 9 model
variants. That is the only *real* (non-synthetic) data in this image, so
we use it to extend the IQA bit-faithfulness goldens from synthetic
arrays to real imagery:

- PSNR/SSIM pairs: the SAME scene rendered by two different thesis
  models (e.g. ``bsrgan_lpips`` vs ``bsrgan_psnr``) — genuinely
  different real images of identical geometry, exactly the situation
  the eval CLI scores.
- NIQE: a CFD-domain pristine model fitted with OUR ``fit_niqe_model``
  on 25 bubble frames, scored by the REFERENCE's numpy ``niqe()``
  (``ESRGAN/image_quality_assessment.py:235-344``) and torch ``NIQE``
  module on held-out frames. The fitted model is additionally shipped at
  ``srganfd_tpu/assets/niqe_cfd_bubbles.npz`` so users evaluating CFD SR
  can point ``$SRGANFD_NIQE_MODEL`` at a domain-matched pristine model
  instead of the natural-image default the reference assumes.

Run manually (needs /root/reference + torch + cv2 + scipy):

    python tools/gen_realdata_goldens.py

Outputs ``tests/goldens/realdata_iqa.npz`` (uint8 crops + float64
scores; consumed by tests/test_realdata.py) and the asset above.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference")
RESULTS = REF / "Results"
OUT = REPO / "tests" / "goldens"
ASSETS = REPO / "srganfd_tpu" / "assets"

SCENES = [
    "020610_a7_0,3_0001.jpg",
    "020610_a7_2,1_0004.jpg",
    "310519_a6_3_0013.jpg",
]
# Held-out variant dirs for scoring; everything else feeds the NIQE fit.
SCORE_DIRS = ["allResults/bsrgan_lpips", "allResults/bsrgan_psnr"]


def load_bgr(path: pathlib.Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    assert img is not None, path
    return img  # HWC uint8 BGR, as every reference IQA entry point reads


def center_crop(img: np.ndarray, size: int = 240) -> np.ndarray:
    h, w = img.shape[:2]
    y, x = (h - size) // 2, (w - size) // 2
    return np.ascontiguousarray(img[y : y + size, x : x + size])


def main() -> None:
    sys.path.insert(0, str(REPO))
    from tools.gen_goldens import _install_scipy_shims

    _install_scipy_shims()
    import tempfile

    import torch

    sys.path.insert(0, str(REF / "ESRGAN"))
    import image_quality_assessment as ref_iqa  # noqa: E402

    from srganfd_tpu.metrics import niqe as our_niqe

    out: dict[str, np.ndarray] = {}

    # --- real-image PSNR/SSIM pairs (two thesis models, same scene) -------
    for i, scene in enumerate(SCENES):
        a = center_crop(load_bgr(RESULTS / SCORE_DIRS[0] / scene))
        b = center_crop(load_bgr(RESULTS / SCORE_DIRS[1] / scene))
        out[f"pair{i}_a"] = a
        out[f"pair{i}_b"] = b
        af, bf = a.astype(np.float64), b.astype(np.float64)
        out[f"pair{i}_psnr_c4_y1"] = np.float64(ref_iqa.psnr(af.copy(), bf.copy(), 4, True))
        out[f"pair{i}_ssim_c4_y1"] = np.float64(ref_iqa.ssim(af.copy(), bf.copy(), 4, True))
        out[f"pair{i}_psnr_c0_y0"] = np.float64(ref_iqa.psnr(af.copy(), bf.copy(), 0, False))
        out[f"pair{i}_ssim_c0_y0"] = np.float64(ref_iqa.ssim(af.copy(), bf.copy(), 0, False))
        # torch-module convention: RGB [0,1] NCHW
        ta = torch.from_numpy(a[..., ::-1].copy().transpose(2, 0, 1)[None]).float() / 255.0
        tb = torch.from_numpy(b[..., ::-1].copy().transpose(2, 0, 1)[None]).float() / 255.0
        psnr_m = ref_iqa.PSNR(crop_border=4, only_test_y_channel=True)
        ssim_m = ref_iqa.SSIM(crop_border=4, only_only_test_y_channel=True)
        out[f"pair{i}_psnr_torch"] = psnr_m(ta, tb).numpy().astype(np.float64)
        out[f"pair{i}_ssim_torch"] = ssim_m(ta, tb).numpy().astype(np.float64)

    # --- CFD-domain NIQE model fitted on real frames ----------------------
    fit_paths = sorted(
        p
        for p in RESULTS.glob("*/**/*.jpg")
        if not any(str(p).endswith(f"{d}/{s}") for d in SCORE_DIRS for s in SCENES)
    )
    assert len(fit_paths) >= 20, len(fit_paths)
    corpus64 = [load_bgr(p).astype(np.float64) for p in fit_paths]
    model_np = our_niqe.fit_niqe_model(corpus64, convention="numpy")
    model_th = our_niqe.fit_niqe_model(corpus64, convention="torch")
    ASSETS.mkdir(exist_ok=True)
    our_niqe.save_niqe_model(model_th, str(ASSETS / "niqe_cfd_bubbles.npz"))

    with tempfile.TemporaryDirectory() as td:
        mpath = f"{td}/niqe_cfd.npz"
        our_niqe.save_niqe_model(model_np, mpath)
        for i, scene in enumerate(SCENES):
            img = load_bgr(RESULTS / SCORE_DIRS[0] / scene).astype(np.float64)
            out[f"niqe{i}_img"] = img.astype(np.uint8)
            out[f"niqe{i}_c0"] = np.float64(ref_iqa.niqe(img.copy(), 0, mpath))
            out[f"niqe{i}_c4"] = np.float64(ref_iqa.niqe(img.copy(), 4, mpath))
        # torch NIQE module (the eval scripts' implementation,
        # test_bsrgan.py:125,227) with the torch-convention CFD model
        from scipy.io import savemat

        matpath = f"{td}/niqe_cfd.mat"
        savemat(
            matpath,
            {"mu_prisparam": model_th.mu[None], "cov_prisparam": model_th.cov},
        )
        for i, scene in enumerate(SCENES):
            rgb = load_bgr(RESULTS / SCORE_DIRS[0] / scene)[..., ::-1].copy()
            t = torch.from_numpy(rgb.transpose(2, 0, 1)[None]).float() / 255.0
            for crop in (0, 4):
                out[f"niqe_torchmod{i}_c{crop}"] = np.float64(
                    ref_iqa.NIQE(crop_border=crop, niqe_model_path=matpath)(t)
                )
    out["model_np_mu"] = model_np.mu
    out["model_np_cov"] = model_np.cov
    out["model_th_mu"] = model_th.mu
    out["model_th_cov"] = model_th.cov

    np.savez_compressed(OUT / "realdata_iqa.npz", **out)
    print("wrote", OUT / "realdata_iqa.npz", (OUT / "realdata_iqa.npz").stat().st_size, "bytes")
    print("wrote", ASSETS / "niqe_cfd_bubbles.npz")


if __name__ == "__main__":
    main()
