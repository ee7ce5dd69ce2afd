"""Generate golden test arrays by executing the PyTorch reference once.

Run manually (the reference checkout at /root/reference plus torch/cv2/scipy
are required); the resulting .npz files are committed under tests/goldens/
so the test suite never needs the reference itself.

    python tools/gen_goldens.py

Shims: the reference was written against old scipy (scipy.ndimage.filters,
scipy.interpolate.interp2d, scipy.finfo) — we alias those before import.
"""

from __future__ import annotations

import pathlib
import sys
import types

import numpy as np

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)


def _install_scipy_shims() -> None:
    import scipy
    import scipy.interpolate
    import scipy.ndimage

    if not hasattr(scipy, "finfo"):
        scipy.finfo = np.finfo
    if not hasattr(scipy.interpolate, "interp2d"):
        scipy.interpolate.interp2d = None  # imported but unused by our paths
    filters = types.ModuleType("scipy.ndimage.filters")
    filters.convolve = scipy.ndimage.convolve
    sys.modules.setdefault("scipy.ndimage.filters", filters)
    scipy.ndimage.filters = filters


def main() -> None:
    _install_scipy_shims()
    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(1234)

    sys.path.insert(0, str(REF / "ESRGAN"))
    import image_quality_assessment as ref_iqa  # noqa: E402
    import imgproc as ref_imgproc  # noqa: E402

    # --- MATLAB imresize goldens ------------------------------------------
    resize_cases = {}
    for name, shape, scale in [
        ("down_half", (13, 17, 3), 0.5),
        ("down_quarter", (16, 16, 3), 0.25),
        ("down_third", (21, 21, 3), 1.0 / 3.0),
        ("down_odd", (19, 23, 3), 0.37),
        ("up_double", (8, 11, 3), 2.0),
        ("gray_down", (20, 20), 0.5),
    ]:
        x = rng.uniform(0, 1, size=shape).astype(np.float32)
        y = ref_imgproc.image_resize(x.copy(), scale, True)
        resize_cases[f"{name}_in"] = x
        resize_cases[f"{name}_out"] = np.asarray(y, dtype=np.float32)
        if scale >= 1.0:  # reference no-antialias path crashes on some downscales
            y_noaa = ref_imgproc.image_resize(x.copy(), scale, False)
            resize_cases[f"{name}_out_noaa"] = np.asarray(y_noaa, dtype=np.float32)
        resize_cases[f"{name}_scale"] = np.float64(scale)
    np.savez(OUT / "matlab_resize.npz", **resize_cases)

    # --- color conversions -------------------------------------------------
    x = rng.uniform(0, 1, size=(7, 9, 3)).astype(np.float32)
    color = {
        "x": x,
        "rgb2ycbcr": ref_imgproc.rgb_to_ycbcr(x.copy(), False),
        "rgb2y": ref_imgproc.rgb_to_ycbcr(x.copy(), True),
        "bgr2ycbcr": ref_imgproc.bgr_to_ycbcr(x.copy(), False),
        "bgr2y": ref_imgproc.bgr_to_ycbcr(x.copy(), True),
    }
    ycc = ref_imgproc.rgb_to_ycbcr(x.copy(), False).astype(np.float32)
    color["ycc"] = ycc
    color["ycbcr2rgb"] = ref_imgproc.ycbcr_to_rgb(ycc.copy())
    color["ycbcr2bgr"] = ref_imgproc.ycbcr_to_bgr(ycc.copy())
    np.savez(OUT / "color.npz", **color)

    # --- torch PSNR / SSIM modules ------------------------------------------
    sr = rng.uniform(0, 1, size=(2, 3, 44, 52)).astype(np.float32)
    gt = np.clip(sr + rng.normal(0, 0.05, size=sr.shape), 0, 1).astype(np.float32)
    iqa = {"sr": sr, "gt": gt}
    for crop in (0, 4):
        for ych in (True, False):
            psnr_m = ref_iqa.PSNR(crop_border=crop, only_test_y_channel=ych)
            ssim_m = ref_iqa.SSIM(crop_border=crop, only_only_test_y_channel=ych)
            p = psnr_m(torch.from_numpy(sr), torch.from_numpy(gt))
            s = ssim_m(torch.from_numpy(sr), torch.from_numpy(gt))
            iqa[f"psnr_c{crop}_y{int(ych)}"] = p.numpy().astype(np.float64)
            iqa[f"ssim_c{crop}_y{int(ych)}"] = s.numpy().astype(np.float64)
    np.savez(OUT / "iqa_torch.npz", **iqa)

    # --- numpy psnr/ssim (BGR uint8-domain API) -----------------------------
    sr8 = rng.integers(0, 256, size=(40, 48, 3)).astype(np.float64)
    gt8 = np.clip(sr8 + rng.normal(0, 12, size=sr8.shape), 0, 255).astype(np.float64)
    np.savez(
        OUT / "iqa_numpy.npz",
        sr=sr8,
        gt=gt8,
        psnr_c4_y1=np.float64(ref_iqa.psnr(sr8.copy(), gt8.copy(), 4, True)),
        ssim_c4_y1=np.float64(ref_iqa.ssim(sr8.copy(), gt8.copy(), 4, True)),
        psnr_c0_y0=np.float64(ref_iqa.psnr(sr8.copy(), gt8.copy(), 0, False)),
        ssim_c0_y0=np.float64(ref_iqa.ssim(sr8.copy(), gt8.copy(), 0, False)),
    )

    # --- full NIQE score parity ---------------------------------------------
    # Fit a pristine model with OUR fit_niqe_model, hand it to the
    # REFERENCE's numpy niqe() (which re-extracts features itself), and
    # golden the resulting scores. Includes the single-image identity:
    # a model fitted on exactly one image must score ~0 on that image via
    # the reference — a reference-side validation of the fit.
    import tempfile

    import cv2

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from srganfd_tpu.metrics import niqe as our_niqe

    def textured(seed, size):
        r = np.random.default_rng(seed)
        base = r.uniform(0, 1, (size // 8, size // 8, 3))
        img = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
        img = img + 0.1 * r.normal(size=(size, size, 3))
        return (np.clip(img, 0, 1) * 255).astype(np.float64)

    corpus = [textured(100 + i, 384) for i in range(6)]
    model = our_niqe.fit_niqe_model(corpus, convention="numpy")
    with tempfile.TemporaryDirectory() as td:
        mpath = f"{td}/niqe_model.npz"
        our_niqe.save_niqe_model(model, mpath)
        test_img = textured(7, 224)
        blur_img = cv2.GaussianBlur(test_img, (21, 21), 5.0)
        score_clean = ref_iqa.niqe(test_img.copy(), 0, mpath)
        score_blur = ref_iqa.niqe(blur_img.copy(), 0, mpath)
        score_crop = ref_iqa.niqe(textured(8, 240).copy(), 4, mpath)
        # identity: model fitted on ONE image scores ~0 on that image
        solo = textured(9, 672)  # 49 blocks > 36 dims: full-rank covariance
        solo_model = our_niqe.fit_niqe_model([solo], convention="numpy")
        spath = f"{td}/niqe_solo.npz"
        our_niqe.save_niqe_model(solo_model, spath)
        score_solo = ref_iqa.niqe(solo.copy(), 0, spath)
        # torch NIQE module (loads .mat, rounds Y) with the same model
        from scipy.io import savemat

        matpath = f"{td}/niqe_model.mat"
        savemat(matpath, {"mu_prisparam": model.mu[None], "cov_prisparam": model.cov})
        rgb01 = np.ascontiguousarray(test_img[..., ::-1] / 255.0)
        t = torch.from_numpy(rgb01.transpose(2, 0, 1)[None]).float()
        score_torch = float(ref_iqa.NIQE(crop_border=0, niqe_model_path=matpath)(t))
    np.savez(
        OUT / "niqe_full.npz",
        test_img=test_img,
        blur_img=blur_img,
        crop_img=textured(8, 240),
        solo_img=solo,
        mu=model.mu,
        cov=model.cov,
        score_clean=np.float64(score_clean),
        score_blur=np.float64(score_blur),
        score_crop=np.float64(score_crop),
        score_solo=np.float64(score_solo),
        score_torch=np.float64(score_torch),
    )

    # --- BSRGAN blur kernels -------------------------------------------------
    sys.path.insert(0, str(REF / "BSRGAN"))
    for mod in ("imgproc",):
        sys.modules.pop(mod, None)
    import imgproc as bsr_imgproc  # noqa: E402  (BSRGAN flavor now first on path)

    assert hasattr(bsr_imgproc, "_fspecial_gaussian")
    kern = {
        "iso_15_2p3": bsr_imgproc._fspecial_gaussian(15, 2.3),
        "iso_7_0p5": bsr_imgproc._fspecial_gaussian(7, 0.5),
        "aniso_15": bsr_imgproc._anisotropic_gaussian(15, 0.7, 4.0, 2.0),
        "aniso_21": bsr_imgproc._anisotropic_gaussian(21, 2.4, 8.0, 1.5),
    }
    np.savez(OUT / "blur_kernels.npz", **kern)

    print("goldens written to", OUT)
    for f in sorted(OUT.glob("*.npz")):
        print(" ", f.name, f.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
