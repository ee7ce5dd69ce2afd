"""Forced-decision chain-level goldens: execute the reference's COMPOSED
degradation chains with scripted random decisions, recording everything
needed to replay the identical chain through our fused XLA programs.

Unlike tools/gen_goldens.py (which goldens the primitives), this drives the
reference's actual ``degradation_process`` / ``degradation_process_plus``
(``BSRGAN/imgproc.py:492-623``) and the Real-ESRGAN second-order chain so
the chain COMPOSITION (op order, clip placement, size arithmetic, state
threading) is verified, not just each stage.

Scripting mechanism: the reference modules draw from the global ``random``
module and ``np.random``. We rebind the module-level names inside the
imported reference module to proxies that return SCRIPTED values for the
chain-level decisions (identified by the calling function's name) and real
seeded randomness for everything else (e.g. blur-kernel synthesis inside
``_add_blur`` — those kernels are captured at the ``ndimage.convolve``
boundary instead, so their sampling path does not matter).

Run manually; outputs land in tests/goldens/chain_*.npz and are committed.
"""

from __future__ import annotations

import pathlib
import random as real_random
import zlib
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
        scipy.interpolate.interp2d = None
    filters = types.ModuleType("scipy.ndimage.filters")
    filters.convolve = scipy.ndimage.convolve
    sys.modules.setdefault("scipy.ndimage.filters", filters)
    scipy.ndimage.filters = filters


def _caller() -> str:
    return sys._getframe(2).f_code.co_name


class _ScriptedRandom:
    """``random``-module stand-in: scripted draws for calls made directly
    by the chain functions, real seeded randomness for everything else."""

    CHAIN_FNS = {"degradation_process", "degradation_process_plus"}

    def __init__(self, script: dict, seed: int):
        self.script = script
        self._real = real_random.Random(seed)

    def random(self):
        if _caller() in self.CHAIN_FNS:
            return self.script["random"].pop(0)
        return self._real.random()

    def sample(self, population, k):
        if _caller() in self.CHAIN_FNS:
            return list(self.script["order"].pop(0))
        return self._real.sample(population, k)

    def choice(self, seq):
        if _caller() in self.CHAIN_FNS or _caller() == "_add_resize":
            return self.script["choice"].pop(0)
        return self._real.choice(seq)

    def randint(self, a, b):
        if _caller() == "_add_jpeg_compression":
            return self.script["jpeg_q"].pop(0)
        return self._real.randint(a, b)

    def uniform(self, a, b):
        if _caller() in self.CHAIN_FNS or _caller() == "_add_resize":
            return self.script["uniform"].pop(0)
        return self._real.uniform(a, b)

    def choices(self, population, weights=None, k=1):
        if _caller() in self.CHAIN_FNS:
            return [self.script["choices"].pop(0)]
        return self._real.choices(population, weights=weights, k=k)


class _NpRandomProxy:
    def __init__(self, rand_queue: list):
        self._q = rand_queue

    def rand(self, *shape):
        if not shape and (
            _caller() in _ScriptedRandom.CHAIN_FNS or _caller() == "_add_resize"
        ):
            return self._q.pop(0)
        return np.random.rand(*shape)

    def uniform(self, *args, **kw):
        if _caller() in _ScriptedRandom.CHAIN_FNS:
            # no-arg draws are the chain's probability gates; (a, b) draws
            # are the resize scales — separate queues
            return self._uq.pop(0) if (args or kw) else self._q.pop(0)
        return np.random.uniform(*args, **kw)

    def __getattr__(self, n):
        return getattr(np.random, n)


class _NpProxy:
    def __init__(self, rand_queue: list, uniform_queue: list | None = None):
        self.random = _NpRandomProxy(rand_queue)
        self.random._uq = uniform_queue if uniform_queue is not None else []

    def __getattr__(self, n):
        return getattr(np, n)


class _ConvolveRecorder:
    """Capture the blur kernels the reference feeds scipy's convolve."""

    def __init__(self, real):
        self.real = real
        self.kernels: list[np.ndarray] = []

    def __call__(self, image, weights, mode=None, **kw):
        if weights.ndim == 3 and weights.shape[2] == 1:
            self.kernels.append(np.asarray(weights[:, :, 0], np.float64).copy())
        return self.real(image, weights, mode=mode, **kw)


def _load_test_image(size: int = 64) -> np.ndarray:
    import cv2

    img = cv2.imread(str(REF / "Results" / "bsrgan" / "310519_a6_3_0030.jpg"))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.float32(img[40 : 40 + size, 60 : 60 + size] / 255.0)


def gen_bsrgan_process(ref_imgproc) -> None:
    """Scenarios over ``degradation_process`` (``BSRGAN/imgproc.py:492``):
    the fork leaves ops {blur, blur, maybe-JPEG} + final JPEG + 1/sf
    MATLAB resize, with an optional scale-2 pre-downscale at sf=4.

    Each scenario scripts: the scale2 draw, the cv2-vs-MATLAB branch and
    interp choice, the 6-slot shuffle order (mapping to the mid-JPEG
    position), the mid-JPEG probability draw, and every JPEG quality.
    ``jpeg='off'`` scenarios additionally bypass the reference's
    unconditional final JPEG (identity patch) so the surviving chain —
    pre-downscale, two mirror-convolve blurs, final MATLAB bicubic — must
    match our program EXACTLY (<=1e-5); 'on' scenarios compare the full
    chain within the documented DiffJPEG-vs-cv2 envelope."""
    image = _load_test_image()
    scenarios = {
        # name: (sf, scale2 draw, np.rand branch, interp, order, jpeg draw)
        "x4_plain_jpeg2": dict(sf=4, r_scale2=0.9, order=[0, 1, 5, 2, 3, 4], r_jpeg=0.1, jpeg="on"),
        "x4_scale2_matlab_jpeg0": dict(sf=4, r_scale2=0.1, np_rand=0.7, order=[5, 0, 1, 2, 3, 4], r_jpeg=0.1, jpeg="on"),
        "x4_scale2_cv2lin_jpeg1": dict(sf=4, r_scale2=0.1, np_rand=0.2, interp=1, order=[0, 5, 1, 2, 3, 4], r_jpeg=0.5, jpeg="on"),
        "x2_plain_midoff": dict(sf=2, order=[0, 1, 2, 3, 4, 5], r_jpeg=0.95, jpeg="on"),
        "x2_exact_nojpeg": dict(sf=2, order=[1, 0, 5, 2, 3, 4], r_jpeg=0.95, jpeg="off"),
        "x4_scale2_exact_nojpeg": dict(sf=4, r_scale2=0.1, np_rand=0.7, order=[5, 1, 0, 2, 3, 4], r_jpeg=0.95, jpeg="off"),
        "x4_cv2area_exact_nojpeg": dict(sf=4, r_scale2=0.1, np_rand=0.2, interp=3, order=[0, 1, 5, 2, 3, 4], r_jpeg=0.95, jpeg="off"),
    }
    out: dict[str, np.ndarray] = {"input": image}
    for name, sc in scenarios.items():
        sf = sc["sf"]
        jpeg_on = sc["jpeg"] == "on"
        mid_fires = sc["r_jpeg"] < 0.9 and jpeg_on
        script = {
            "random": ([sc["r_scale2"]] if sf == 4 else []) + [sc["r_jpeg"]],
            "order": [sc["order"]],
            "choice": [sc["interp"]] if "interp" in sc else [],
            "jpeg_q": ([77] if mid_fires else []) + ([88] if jpeg_on else []),
            "uniform": [],
        }
        np_rand_q = [sc["np_rand"]] if "np_rand" in sc else []

        fake_rand = _ScriptedRandom(dict(script), seed=zlib.crc32(name.encode()))
        rec = _ConvolveRecorder(ref_imgproc.ndimage.filters.convolve)
        saved = (ref_imgproc.random, ref_imgproc.np, ref_imgproc.ndimage.filters.convolve)
        ref_imgproc.random = fake_rand
        ref_imgproc.np = _NpProxy(np_rand_q)
        ref_imgproc.ndimage.filters.convolve = rec
        if not jpeg_on:
            saved_jpeg = ref_imgproc._add_jpeg_compression
            ref_imgproc._add_jpeg_compression = lambda im: im
        try:
            lr = ref_imgproc.degradation_process(image.copy(), sf)
        finally:
            ref_imgproc.random, ref_imgproc.np, ref_imgproc.ndimage.filters.convolve = saved
            if not jpeg_on:
                ref_imgproc._add_jpeg_compression = saved_jpeg
        assert not fake_rand.script["random"], f"{name}: unconsumed scripted draws"
        assert not fake_rand.script["jpeg_q"], f"{name}: unconsumed jpeg qualities"
        assert len(rec.kernels) == 2, f"{name}: expected 2 blur kernels, got {len(rec.kernels)}"

        # mid-JPEG slot = number of blur ops before op 5 in the shuffle
        order = sc["order"]
        jpeg_pos = sum(1 for i in order[: order.index(5)] if i in (0, 1))
        scale2 = sf == 4 and sc["r_scale2"] < 0.25
        out[f"{name}/lr"] = np.asarray(lr, np.float32)
        out[f"{name}/kernel_a"] = rec.kernels[0]
        out[f"{name}/kernel_b"] = rec.kernels[1]
        out[f"{name}/meta"] = np.array(
            [
                sf,
                int(scale2),
                sc.get("interp", 0) if (scale2 and sc.get("np_rand", 1.0) < 0.5) else 0,
                jpeg_pos,
                int(mid_fires),
                77 if mid_fires else 0,  # mid quality
                88 if jpeg_on else 0,  # final quality (0 = bypassed)
            ],
            np.int64,
        )
    np.savez(OUT / "chain_bsrgan_process.npz", **out)
    print(f"wrote chain_bsrgan_process.npz ({len(scenarios)} scenarios)")


def gen_bsrgan_plus(ref_imgproc) -> None:
    """Scenarios over ``degradation_process_plus`` (``BSRGAN/imgproc.py:
    565-623``): USM sharpen + 11-op chain (blur/resize/gauss/poisson/
    speckle/JPEG over two rounds) + final resize + JPEG.

    Stochastic NOISE stages cannot match across RNGs, so the exact tier
    runs them at their zero-noise limit: Gaussian ops patched to
    ``np.clip(im, 0, 1)`` (the reference clips after adding noise, so the
    zero-noise limit IS a clip) and poisson/speckle skipped via their
    scripted probability draws; our replay scripts sigma=0 for the same
    limit. Resize scales are scripted to values whose reference
    ``int(s*edge)`` equals our /8-snapped size, making the snapping
    deviation vacuous for these decisions; the final resize interp is
    linear so the reference's unclipped output stays in [0,1] (ours
    clips). What remains — USM, two captured-kernel mirror blurs, two
    cv2 resizes, the final resize, the full op-order composition and
    size arithmetic — must match to <=5e-5 (USM itself carries the 2e-5
    separable-blur golden envelope). 'on' scenarios add the three JPEG
    stages back (scripted qualities) within the DiffJPEG envelope."""
    image = _load_test_image()
    scenarios = {
        "plus_local_exact": dict(
            sf=2, r_shuffle=0.9,
            orders=[[2, 3, 4], [7, 8, 9, 10]],
            exec_order=list(range(11)),
            resizes=[(0.5, 0.5, 2), (0.5, 0.75, 3)],  # (np_rand, scale, interp)
            final_interp=1, jpeg="off",
        ),
        "plus_full_shuffle_exact": dict(
            sf=2, r_shuffle=0.1,
            orders=[[1, 0, 2, 5, 3, 4, 8, 6, 7, 10, 9]],
            exec_order=[1, 0, 2, 5, 3, 4, 8, 6, 7, 10, 9],
            resizes=[(0.5, 0.75, 1), (0.5, 0.5, 2)],
            final_interp=1, jpeg="off",
        ),
        "plus_local_jpeg": dict(
            sf=4, r_shuffle=0.9,
            orders=[[2, 3, 4], [7, 8, 9, 10]],
            exec_order=list(range(11)),
            resizes=[(0.5, 0.5, 1), (0.5, 0.75, 2)],
            final_interp=2, jpeg="on",
        ),
    }
    out: dict[str, np.ndarray] = {"input": image}
    for name, sc in scenarios.items():
        jpeg_on = sc["jpeg"] == "on"
        # chain-level random draws in execution order: shuffle draw, then
        # the poisson/speckle probability draws as ops 3/4/9/10 execute
        rand_q = [sc["r_shuffle"]] + [0.9] * 4  # all four skip
        script = {
            "random": rand_q,
            "order": [list(o) for o in sc["orders"]],
            "choice": [sc["resizes"][0][2], sc["resizes"][1][2], sc["final_interp"]],
            "uniform": [sc["resizes"][0][1], sc["resizes"][1][1]],
            "jpeg_q": [66, 88] if jpeg_on else [],
        }
        np_rand_q = [sc["resizes"][0][0], sc["resizes"][1][0]]

        fake_rand = _ScriptedRandom(script, seed=zlib.crc32(name.encode()))
        rec = _ConvolveRecorder(ref_imgproc.ndimage.filters.convolve)
        saved = (ref_imgproc.random, ref_imgproc.np, ref_imgproc.ndimage.filters.convolve)
        saved_noise = (
            ref_imgproc._add_gaussian_noise,
            ref_imgproc._add_jpeg_compression,
        )
        ref_imgproc.random = fake_rand
        ref_imgproc.np = _NpProxy(np_rand_q)
        ref_imgproc.ndimage.filters.convolve = rec
        # zero-noise limit of the Gaussian stage (the reference clips)
        ref_imgproc._add_gaussian_noise = lambda im, *a: np.clip(im, 0.0, 1.0)
        if not jpeg_on:
            ref_imgproc._add_jpeg_compression = lambda im: im
        try:
            lr = ref_imgproc.degradation_process_plus(
                image.copy(), sc["sf"], use_sharp=True,
                shuffle_prob=0.5, poisson_prob=0.5, speckle_prob=0.5,
            )
        finally:
            ref_imgproc.random, ref_imgproc.np, ref_imgproc.ndimage.filters.convolve = saved
            ref_imgproc._add_gaussian_noise, ref_imgproc._add_jpeg_compression = saved_noise
        for qname in ("random", "order", "choice", "uniform", "jpeg_q"):
            assert not script[qname], f"{name}: unconsumed {qname} queue"
        assert not np_rand_q, f"{name}: unconsumed np.rand queue"
        assert len(rec.kernels) == 2, f"{name}: expected 2 blur kernels"

        out[f"{name}/lr"] = np.asarray(lr, np.float32)
        out[f"{name}/kernel_a"] = rec.kernels[0]
        out[f"{name}/kernel_b"] = rec.kernels[1]
        out[f"{name}/exec_order"] = np.asarray(sc["exec_order"], np.int64)
        out[f"{name}/meta"] = np.array(
            [
                sc["sf"],
                int(sc["r_shuffle"] < 0.5),
                int(jpeg_on),
                sc["resizes"][0][2], sc["resizes"][1][2], sc["final_interp"],
            ],
            np.int64,
        )
        out[f"{name}/resize_scales"] = np.asarray(
            [sc["resizes"][0][1], sc["resizes"][1][1]], np.float64
        )
    np.savez(OUT / "chain_bsrgan_plus.npz", **out)
    print(f"wrote chain_bsrgan_plus.npz ({len(scenarios)} scenarios)")


def _load_realesrgan_imgproc():
    """Import Real_ESRGAN/imgproc.py under a distinct module name (BSRGAN's
    imgproc is already loaded) with the torchvision shims it needs."""
    import importlib.util

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvft = types.ModuleType("torchvision.transforms.functional_tensor")

    def rgb_to_grayscale(img, num_output_channels=1):
        import torch

        w = torch.tensor([0.299, 0.587, 0.114], dtype=img.dtype, device=img.device)
        gray = (img * w.view(1, 3, 1, 1)).sum(1, keepdim=True)
        return gray.repeat(1, num_output_channels, 1, 1) if num_output_channels > 1 else gray

    tvft.rgb_to_grayscale = rgb_to_grayscale
    tvf.rgb_to_grayscale = rgb_to_grayscale
    for name, mod in [
        ("torchvision", tv), ("torchvision.transforms", tvt),
        ("torchvision.transforms.functional", tvf),
        ("torchvision.transforms.functional_tensor", tvft),
    ]:
        sys.modules.setdefault(name, mod)
    tv.transforms = tvt
    tvt.functional = tvf
    tvt.functional_tensor = tvft

    spec = importlib.util.spec_from_file_location(
        "re_imgproc", REF / "Real_ESRGAN" / "imgproc.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_MODE_TO_FLAG = {"bilinear": 1, "bicubic": 2, "area": 3}


def gen_realesrgan_chain(re_imgproc) -> None:
    """Scenarios over the Real-ESRGAN second-order ``degradation_process``
    (``Real_ESRGAN/imgproc.py:2323-2462``). Kernels are chain INPUTS here,
    so both sides receive identical k1/k2/sinc (generated by the
    reference's own kernel synthesizers). Noise stages run at their
    zero-noise limit by PARAMETER (noise_range=(0,0), gaussian prob 1) —
    no patching. Exact scenarios pass an identity JPEG module (recorded
    qualities unused; ours uses the quality<=0 skip sentinel); the jpeg
    scenario records the qualities the reference's own DiffJPEG module
    consumed so our replay quantizes at the same factors."""
    import torch

    image = _load_test_image()
    gt_t = torch.from_numpy(np.moveaxis(image, -1, 0)[None]).float()
    k1 = np.asarray(
        re_imgproc._generate_bivariate_gaussian_kernel(21, 1.7, 1.7, 0.0, isotropic=True),
        np.float32,
    )
    k2 = np.pad(
        np.asarray(
            re_imgproc._generate_bivariate_gaussian_kernel(15, 0.8, 0.5, 0.4, isotropic=False),
            np.float32,
        ),
        ((3, 3), (3, 3)),
    )
    sinc = np.asarray(re_imgproc.generate_sinc_kernel(np.pi / 3, 17, padding=21), np.float32)

    class _JpegRecorder(torch.nn.Module):
        def __init__(self, real):
            super().__init__()
            self.real = real
            self.qualities: list[np.ndarray] = []

        def forward(self, x, quality):
            self.qualities.append(np.asarray(quality.detach()).copy())
            return self.real(x, quality) if self.real is not None else x

    base_params = {
        "first_blur_probability": 1.0,
        "resize_range1": (0.15, 1.5),
        "gaussian_noise_probability1": 1.0,
        "gray_noise_probability1": 0.0,
        "noise_range1": (0, 0),
        "poisson_scale_range1": (0.05, 3.0),
        "jpeg_range1": (30, 95),
        "resize_range2": (0.3, 1.2),
        "gaussian_noise_probability2": 1.0,
        "gray_noise_probability2": 0.0,
        "noise_range2": (0, 0),
        "poisson_scale_range2": (0.05, 2.5),
        "jpeg_range2": (30, 95),
        # resize_probability* unused by the scripted random.choices
        "resize_probability1": (0.2, 0.7, 0.1),
        "resize_probability2": (0.3, 0.4, 0.3),
    }
    scenarios = {
        "reA_exact": dict(
            sf=2, updown=("down", "up"), scales=[0.5, 1.25],
            modes=("bilinear", "bicubic", "bilinear"),
            second_blur=True, order_draw=0.3, jpeg="off",
        ),
        "reB_exact": dict(
            sf=2, updown=("up", "down"), scales=[1.25, 0.75],
            modes=("bicubic", "bilinear", "bicubic"),
            second_blur=False, order_draw=0.7, jpeg="off",
        ),
        "reArea_exact": dict(
            sf=2, updown=("down", "keep"), scales=[0.5],
            modes=("area", "bilinear", "area"),
            second_blur=True, order_draw=0.3, jpeg="off",
        ),
        "reA_jpeg": dict(
            sf=2, updown=("down", "up"), scales=[0.5, 1.25],
            modes=("bilinear", "bicubic", "bilinear"),
            second_blur=True, order_draw=0.3, jpeg="on",
        ),
    }
    out: dict[str, np.ndarray] = {
        "input": image, "k1": k1, "k2": k2, "sinc": sinc,
    }
    for name, sc in scenarios.items():
        torch.manual_seed(zlib.crc32(name.encode()) % 2**31)
        jpeg_on = sc["jpeg"] == "on"
        params = dict(base_params)
        params["second_blur_probability"] = 1.0 if sc["second_blur"] else 0.0
        script = {
            "random": [], "order": [], "uniform": [], "jpeg_q": [],
            "choices": [sc["updown"][0], sc["updown"][1]],
            "choice": [_m for _m in sc["modes"]],
        }
        # torch-side modes are strings; map back when saving meta
        script["choice"] = list(sc["modes"])
        # np.random.uniform queues: probability gates in execution order
        # (first blur, noise1 select, second blur, noise2 select, stage-2
        # order) and the sampled scales
        np_prob_q = [0.5, 0.5, 0.5, 0.5, sc["order_draw"]]
        np_scale_q = list(sc["scales"])

        jpeg_mod = _JpegRecorder(re_imgproc.DiffJPEG() if jpeg_on else None)
        fake_rand = _ScriptedRandom(script, seed=zlib.crc32(name.encode()))
        saved = (re_imgproc.random, re_imgproc.np)
        re_imgproc.random = fake_rand
        re_imgproc.np = _NpProxy(np_prob_q, np_scale_q)
        try:
            _, _, lr = re_imgproc.degradation_process(
                gt_t,
                torch.from_numpy(k1)[None],
                torch.from_numpy(k2)[None],
                torch.from_numpy(sinc)[None],
                sc["sf"],
                params,
                jpeg_operation=jpeg_mod,
                usm_sharpener=None,
            )
        finally:
            re_imgproc.random, re_imgproc.np = saved
        assert not np_prob_q and not np_scale_q, f"{name}: unconsumed np queues"
        assert not script["choices"] and not script["choice"], f"{name}: unconsumed choices"
        assert len(jpeg_mod.qualities) == 2, f"{name}: expected 2 JPEG stages"

        out[f"{name}/lr"] = np.moveaxis(np.asarray(lr.detach(), np.float32)[0], 0, -1)
        out[f"{name}/jpeg_q"] = np.asarray(
            [float(jpeg_mod.qualities[0][0]), float(jpeg_mod.qualities[1][0])], np.float64
        )
        h = image.shape[0]
        # reproduce the reference's size arithmetic for the plan
        s = sc["scales"]
        size1 = int(h * s[0]) if sc["updown"][0] != "keep" else h
        if sc["updown"][1] == "keep":
            size2 = int(h / sc["sf"])
        else:
            size2 = int(h / sc["sf"] * s[1 if sc["updown"][0] != "keep" else 0])
        out[f"{name}/meta"] = np.array(
            [
                sc["sf"],
                size1,
                _MODE_TO_FLAG[sc["modes"][0]],
                size2,
                _MODE_TO_FLAG[sc["modes"][1]],
                _MODE_TO_FLAG[sc["modes"][2]],
                int(sc["second_blur"]),
                int(sc["order_draw"] >= 0.5),  # ours: jpeg_first_in_stage2
                int(jpeg_on),
            ],
            np.int64,
        )
    np.savez(OUT / "chain_realesrgan.npz", **out)
    print(f"wrote chain_realesrgan.npz ({len(scenarios)} scenarios)")


def main() -> None:
    _install_scipy_shims()
    sys.path.insert(0, str(REF / "BSRGAN"))
    import imgproc as bsrgan_imgproc  # noqa: E402

    gen_bsrgan_process(bsrgan_imgproc)
    gen_bsrgan_plus(bsrgan_imgproc)
    gen_realesrgan_chain(_load_realesrgan_imgproc())


if __name__ == "__main__":
    main()
