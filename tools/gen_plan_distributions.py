"""Record the reference's random degradation-plan decisions, en masse.

The host-side plan samplers (``ops/degrade.plan_bsrgan_batch``,
``ops/kernels.sample_*``, ``ops/realesrgan_degrade.plan_realesrgan_batch``
and ``sample_kernel_triple_params``) re-derive the reference's random
decision *distributions* — shuffle orders, branch probabilities, kernel
families, sigma/beta/quality ranges. Forced-decision chain goldens verify
the transforms; nothing verified the sampling distributions themselves.

This tool closes that gap: it imports the reference modules from
``/root/reference`` and EXECUTES their samplers —

- ``BSRGAN/imgproc.py:492-562``  (``degradation_process`` incl. ``_add_blur``)
- ``Real_ESRGAN/dataset.py:60-133`` (per-sample kernel-triple synthesis)
- ``Real_ESRGAN/imgproc.py:2323-2462`` (the per-batch GPU chain decisions)

with only the expensive *deterministic* math stubbed out (convolutions,
resizes, the cv2 JPEG codec, kernel grid evaluation), so every random
draw runs through the reference's own code. Tens of thousands of seeded
draws per chain land in ``tests/goldens/plan_distributions_ref.npz``;
``tests/test_plan_distributions.py`` draws the same counts from this
repo's planners and compares every decision dimension with two-sample
chi-square (discrete) / KS (continuous) tests.

Run manually (needs /root/reference): ``python tools/gen_plan_distributions.py``.
"""

from __future__ import annotations

import pathlib
import random
import sys
import types

import numpy as np

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"

N_BSR4 = 20000
N_BSR2 = 10000
N_PLUS = 8000
PLUS_PROBS = dict(shuffle_prob=0.5, poisson_prob=0.5, speckle_prob=0.5)
N_TRIPLE = 40000  # cheap pure-RNG draws; extra n powers the conditional
# omega-per-size KS tests (the size-13 threshold lives on a 1/80 slice)
N_CHAIN_DRAWS = 4000
CHAIN_BATCH = 8
CHAIN_GT = 256  # big enough that int(H/sf*scale) resolves scale to ~1/64


def _install_scipy_shims() -> None:
    """Same legacy-scipy surface gen_chain_goldens installs."""
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


def _install_torchvision_shims() -> None:
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvft = types.ModuleType("torchvision.transforms.functional_tensor")

    def rgb_to_grayscale(img, num_output_channels=1):
        import torch

        w = torch.tensor([0.299, 0.587, 0.114], dtype=img.dtype, device=img.device)
        gray = (img * w.view(1, 3, 1, 1)).sum(1, keepdim=True)
        return gray.repeat(1, num_output_channels, 1, 1) if num_output_channels > 1 else gray

    def to_tensor(img):
        import torch

        arr = np.asarray(img)
        t = torch.from_numpy(np.moveaxis(arr, -1, 0).copy()).contiguous()
        return t.float().div(255) if arr.dtype == np.uint8 else t.float()

    tvft.rgb_to_grayscale = rgb_to_grayscale
    tvf.rgb_to_grayscale = rgb_to_grayscale
    tvf.to_tensor = to_tensor
    for name, mod in [
        ("torchvision", tv), ("torchvision.transforms", tvt),
        ("torchvision.transforms.functional", tvf),
        ("torchvision.transforms.functional_tensor", tvft),
    ]:
        sys.modules.setdefault(name, mod)
    tv.transforms = tvt
    tvt.functional = tvf
    tvt.functional_tensor = tvft


def _import_by_path(name: str, path: pathlib.Path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # so internal relative imports resolve
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Part A: BSRGAN degradation_process decision stream
# ---------------------------------------------------------------------------


class _Cv2Stub:
    """Minimal cv2 stand-in for ``degradation_process``: identity codec
    that records JPEG qualities and resize interps, zero image math."""

    def __init__(self, events: list):
        import cv2 as real

        self.IMWRITE_JPEG_QUALITY = real.IMWRITE_JPEG_QUALITY
        self.COLOR_RGB2BGR = real.COLOR_RGB2BGR
        self.COLOR_BGR2RGB = real.COLOR_BGR2RGB
        self._events = events

    def cvtColor(self, image, flag):  # noqa: N802 (cv2 API)
        return image

    def imencode(self, ext, image, params):
        self._events.append(("jpeg", int(params[1])))
        return True, image

    def imdecode(self, buf, flags):
        return buf

    def resize(self, image, size, interpolation=None):
        self._events.append(("cv2resize", int(interpolation)))
        return image


def record_bsrgan(bi, n_draws: int, sf: int, jpeg_prob: float, scale2_prob: float) -> dict:
    events: list = []
    orig = {
        "cv2": bi.cv2,
        "ndimage": bi.ndimage,
        "image_resize": bi.image_resize,
        "_fspecial_gaussian": bi._fspecial_gaussian,
        "_anisotropic_gaussian": bi._anisotropic_gaussian,
    }
    bi.cv2 = _Cv2Stub(events)
    nd = types.SimpleNamespace(
        filters=types.SimpleNamespace(convolve=lambda img, w, mode=None: img)
    )
    bi.ndimage = nd
    bi.image_resize = lambda img, scale, antialiasing=True: (
        events.append(("mresize", float(scale))) or img
    )
    def rec_iso(ksize, sigma):
        events.append(("iso", int(ksize), float(sigma)))
        return np.full((3, 3), 1 / 9)

    def rec_aniso(ksize, theta, l1, l2):
        events.append(("aniso", int(ksize), float(theta), float(l1), float(l2)))
        return np.full((3, 3), 1 / 9)

    bi._fspecial_gaussian = rec_iso
    bi._anisotropic_gaussian = rec_aniso

    img = np.full((8, 8, 3), 0.5, np.float32)
    rec = {
        "scale2": [], "scale2_cv2": [], "scale2_interp": [],
        "jpeg_mid": [], "jpeg_slot": [], "jpeg_mid_q": [], "jpeg_final_q": [],
        "blur_iso": [], "blur_ksize": [], "blur_sigma": [],
        "blur_theta": [], "blur_l1": [], "blur_l2": [],
    }
    try:
        for _ in range(n_draws):
            events.clear()
            bi.degradation_process(img, sf, jpeg_prob=jpeg_prob, scale2_prob=scale2_prob)
            ev = list(events)
            # trailing pair is always: final JPEG then final 1/sf resize
            assert ev[-1][0] == "mresize" and ev[-2][0] == "jpeg", ev
            rec["jpeg_final_q"].append(ev[-2][1])
            ev = ev[:-2]
            # optional scale2 prefix (sf==4): cv2resize or an mresize(0.5)
            if ev and ev[0][0] in ("cv2resize", "mresize"):
                rec["scale2"].append(1)
                rec["scale2_cv2"].append(1 if ev[0][0] == "cv2resize" else 0)
                if ev[0][0] == "cv2resize":
                    rec["scale2_interp"].append(ev[0][1])
                ev = ev[1:]
            else:
                rec["scale2"].append(0)
            # remaining: the shuffled {blur(iso|aniso), blur, maybe-jpeg};
            # each blur leaves a param event (iso/aniso); jpeg one event
            slot = 0
            mid = 0
            for e in ev:
                if e[0] == "jpeg":
                    mid = 1
                    rec["jpeg_slot"].append(slot)
                    rec["jpeg_mid_q"].append(e[1])
                else:
                    slot += 1
                    if e[0] == "iso":
                        rec["blur_iso"].append(1)
                        rec["blur_ksize"].append(e[1])
                        rec["blur_sigma"].append(e[2])
                    else:
                        rec["blur_iso"].append(0)
                        rec["blur_ksize"].append(e[1])
                        rec["blur_theta"].append(e[2])
                        rec["blur_l1"].append(e[3])
                        rec["blur_l2"].append(e[4])
            rec["jpeg_mid"].append(mid)
    finally:
        for k, v in orig.items():
            setattr(bi, k, v)
    return {k: np.asarray(v) for k, v in rec.items()}


# ---------------------------------------------------------------------------
# Part A2: BSRGAN degradation_process_plus decision stream
# ---------------------------------------------------------------------------


def _caller() -> str:
    return sys._getframe(2).f_code.co_name


class _RecordingRandom:
    """``random``-module stand-in: delegates to real seeded randomness and
    logs every draw with the reference function that made it."""

    def __init__(self, events: list, seed: int):
        import random as _random

        self._e = events
        self._r = _random.Random(seed)

    def random(self):
        v = self._r.random()
        self._e.append(("pr", _caller(), "random", v))
        return v

    def randint(self, a, b):
        v = self._r.randint(a, b)
        self._e.append(("pr", _caller(), "randint", v))
        return v

    def uniform(self, a, b):
        v = self._r.uniform(a, b)
        self._e.append(("pr", _caller(), "uniform", v))
        return v

    def choice(self, seq):
        v = self._r.choice(seq)
        self._e.append(("pr", _caller(), "choice", v))
        return v

    def sample(self, population, k):
        v = self._r.sample(list(population), k)
        self._e.append(("pr", _caller(), "sample", list(v)))
        return v


class _RecordingNpRandom:
    def __init__(self, events: list):
        self._e = events

    def rand(self, *shape):
        v = np.random.rand(*shape)
        if not shape:
            self._e.append(("npr", _caller(), "rand", float(v)))
        return v

    def __getattr__(self, n):
        return getattr(np.random, n)


class _NpRecProxy:
    def __init__(self, events: list):
        self.random = _RecordingNpRandom(events)

    def __getattr__(self, n):
        return getattr(np, n)


def record_bsrgan_plus(
    bi, n_draws: int, sf: int,
    shuffle_prob: float, poisson_prob: float, speckle_prob: float,
) -> dict:
    """Instrument ``degradation_process_plus`` (``BSRGAN/imgproc.py:
    565-623``): math stubs as in :func:`record_bsrgan` plus recording
    RNG proxies, so every random decision of the 11-op chain — shuffle
    structure, per-op branches/levels/scales, Poisson shot exponents,
    JPEG qualities — is captured from the executed reference."""
    events: list = []
    orig = {
        "cv2": bi.cv2, "ndimage": bi.ndimage,
        "_fspecial_gaussian": bi._fspecial_gaussian,
        "_anisotropic_gaussian": bi._anisotropic_gaussian,
        "random": bi.random, "np": bi.np,
    }
    bi.cv2 = _Cv2Stub(events)
    bi.ndimage = types.SimpleNamespace(
        filters=types.SimpleNamespace(convolve=lambda img, w, mode=None: img)
    )

    def rec_iso(ksize, sigma):
        events.append(("iso", int(ksize), float(sigma)))
        return np.full((3, 3), 1 / 9)

    def rec_aniso(ksize, theta, l1, l2):
        events.append(("aniso", int(ksize), float(theta), float(l1), float(l2)))
        return np.full((3, 3), 1 / 9)

    bi._fspecial_gaussian = rec_iso
    bi._anisotropic_gaussian = rec_aniso
    bi.random = _RecordingRandom(events, seed=1234)
    bi.np = _NpRecProxy(events)

    img = np.full((8, 8, 3), 0.5, np.float32)
    rec: dict[str, list] = {k: [] for k in (
        "full_shuffle", "full_pos5", "local_first_23", "local_first_7",
        "resize_branch", "resize_scale_up", "resize_scale_down", "resize_interp",
        "gauss_level", "gauss_branch",
        "poisson_taken", "poisson_u", "poisson_gray",
        "speckle_taken", "speckle_level", "speckle_branch",
        "jpeg_mid_q", "jpeg_final_q", "final_interp",
    )}
    try:
        for _ in range(n_draws):
            events.clear()
            bi.degradation_process_plus(
                img, sf, use_sharp=False, shuffle_prob=shuffle_prob,
                poisson_prob=poisson_prob, speckle_prob=speckle_prob,
            )
            samples = [e for e in events if e[0] == "pr" and e[2] == "sample"]
            if len(samples) == 1:
                rec["full_shuffle"].append(1)
                rec["full_pos5"].append(samples[0][3].index(5))
            else:
                rec["full_shuffle"].append(0)
                rec["local_first_23"].append(samples[0][3][0])
                rec["local_first_7"].append(samples[1][3][0])
            # walk for contextual draws
            i = 0
            jpeg_qs = []
            while i < len(events):
                e = events[i]
                if e[0] == "npr" and e[1] == "_add_resize":
                    r = e[3]
                    if r > 0.8:
                        rec["resize_branch"].append(0)
                        rec["resize_scale_up"].append(events[i + 1][3])
                        rec["resize_interp"].append(events[i + 2][3])
                    elif r < 0.7:
                        rec["resize_branch"].append(1)
                        rec["resize_scale_down"].append(events[i + 1][3])
                        rec["resize_interp"].append(events[i + 2][3])
                    else:
                        rec["resize_branch"].append(2)
                elif e[0] == "pr" and e[1] == "_add_gaussian_noise":
                    if e[2] == "randint":
                        rec["gauss_level"].append(e[3])
                elif e[0] == "npr" and e[1] == "_add_gaussian_noise":
                    r = e[3]
                    rec["gauss_branch"].append(0 if r > 0.6 else (1 if r < 0.4 else 2))
                elif e[0] == "pr" and e[1] == "_add_poisson_noise":
                    # first random() is the 10**(2u+2) exponent draw, the
                    # second the gray branch (BSRGAN/imgproc.py:249-250)
                    rec["poisson_u"].append(e[3])
                    rec["poisson_gray"].append(int(events[i + 1][3] >= 0.5))
                    i += 1
                elif e[0] == "pr" and e[1] == "_add_speckle_noise":
                    if e[2] == "randint":
                        rec["speckle_level"].append(e[3])
                    else:
                        r = e[3]
                        rec["speckle_branch"].append(
                            0 if r > 0.6 else (1 if r < 0.4 else 2)
                        )
                elif e[0] == "jpeg":
                    jpeg_qs.append(e[1])
                elif e[0] == "pr" and e[1] == "degradation_process_plus" and e[2] == "choice":
                    rec["final_interp"].append(e[3])
                i += 1
            # last JPEG is the unconditional final one; at most one mid
            rec["jpeg_final_q"].append(jpeg_qs[-1])
            rec["jpeg_mid_q"].extend(jpeg_qs[:-1])
            # two random() draws per taken poisson call; one randint per
            # taken speckle call; two slots of each per draw
            rec["poisson_taken"].append(
                sum(1 for e in events if e[:3] == ("pr", "_add_poisson_noise", "random")) // 2
            )
            rec["speckle_taken"].append(
                sum(1 for e in events if e[:3] == ("pr", "_add_speckle_noise", "randint"))
            )
    finally:
        for k, v in orig.items():
            setattr(bi, k, v)
    return {k: np.asarray(v) for k, v in rec.items() if len(v)}


# ---------------------------------------------------------------------------
# Part B: Real-ESRGAN per-sample kernel triple (dataset.__getitem__)
# ---------------------------------------------------------------------------


def record_kernel_triple(re_imgproc, re_dataset, params: dict, n_draws: int, tmpdir) -> dict:
    events: list = []
    orig = {
        "_generate_bivariate_gaussian_kernel": re_imgproc._generate_bivariate_gaussian_kernel,
        "_generate_bivariate_generalized_gaussian_kernel":
            re_imgproc._generate_bivariate_generalized_gaussian_kernel,
        "_generate_bivariate_plateau_gaussian_kernel":
            re_imgproc._generate_bivariate_plateau_gaussian_kernel,
        "generate_sinc_kernel": re_imgproc.generate_sinc_kernel,
    }

    def pulse(size: int) -> np.ndarray:
        k = np.zeros((size, size))
        k[size // 2, size // 2] = 1.0
        return k

    def rec_gauss(ksize, sx, sy, theta, grid=None, isotropic=True):
        events.append(("gauss", int(ksize), float(sx), float(sy), float(theta), bool(isotropic)))
        return pulse(int(ksize))

    def rec_gen(ksize, sx, sy, theta, beta, grid=None, isotropic=True):
        events.append(
            ("gen", int(ksize), float(sx), float(sy), float(theta), bool(isotropic), float(beta))
        )
        return pulse(int(ksize))

    def rec_plateau(ksize, sx, sy, theta, beta, grid=None, isotropic=True):
        events.append(
            ("plateau", int(ksize), float(sx), float(sy), float(theta), bool(isotropic), float(beta))
        )
        return pulse(int(ksize))

    def rec_sinc(cutoff, kernel_size, padding=0):
        events.append(("sinc", int(kernel_size), float(cutoff)))
        k = pulse(int(kernel_size))
        if padding and padding > kernel_size:
            p = (padding - kernel_size) // 2
            k = np.pad(k, ((p, p), (p, p)))
        return k

    re_imgproc._generate_bivariate_gaussian_kernel = rec_gauss
    re_imgproc._generate_bivariate_generalized_gaussian_kernel = rec_gen
    re_imgproc._generate_bivariate_plateau_gaussian_kernel = rec_plateau
    re_imgproc.generate_sinc_kernel = rec_sinc

    # one dummy frame so __getitem__'s trailing imread path runs for real
    import cv2

    frame = tmpdir / "f.png"
    cv2.imwrite(str(frame), np.zeros((4, 4, 3), np.uint8))
    ds = re_dataset.DegeneratedImageDataset(str(tmpdir), params)

    rec: dict[str, list] = {
        # per stage (1, 2): size, is_sinc, omega | sinc, family/iso and
        # params | mixed
        **{f"k{s}_{d}": [] for s in (1, 2) for d in (
            "size", "is_sinc", "omega", "omega_size", "family",
            "sigma_x", "sigma_y", "rotation", "beta_gen", "beta_plateau",
        )},
        "sinc3": [], "sinc3_size": [], "sinc3_omega": [],
    }
    fam_code = {
        ("gauss", True): 0, ("gauss", False): 1,
        ("gen", True): 2, ("gen", False): 3,
        ("plateau", True): 4, ("plateau", False): 5,
    }
    try:
        for _ in range(n_draws):
            events.clear()
            ds[0]
            ev = list(events)
            # events: k1, k2, then optionally sinc3 (a 'sinc' with
            # padding=sinc_kernel_size — always last when present)
            assert len(ev) in (2, 3), ev
            for s, e in zip((1, 2), ev[:2]):
                rec[f"k{s}_size"].append(int(e[1]))
                if e[0] == "sinc":
                    rec[f"k{s}_is_sinc"].append(1)
                    rec[f"k{s}_omega"].append(e[2])
                    rec[f"k{s}_omega_size"].append(int(e[1]))
                else:
                    rec[f"k{s}_is_sinc"].append(0)
                    rec[f"k{s}_family"].append(fam_code[(e[0], e[5])])
                    rec[f"k{s}_sigma_x"].append(e[2])
                    if not e[5]:  # anisotropic: sigma_y/rotation consumed
                        rec[f"k{s}_sigma_y"].append(e[3])
                        rec[f"k{s}_rotation"].append(e[4])
                    if e[0] == "gen":
                        rec[f"k{s}_beta_gen"].append(e[6])
                    elif e[0] == "plateau":
                        rec[f"k{s}_beta_plateau"].append(e[6])
            if len(ev) == 3:
                rec["sinc3"].append(1)
                rec["sinc3_size"].append(int(ev[2][1]))
                rec["sinc3_omega"].append(ev[2][2])
            else:
                rec["sinc3"].append(0)
    finally:
        for k, v in orig.items():
            setattr(re_imgproc, k, v)
    return {k: np.asarray(v) for k, v in rec.items() if len(v)}


# ---------------------------------------------------------------------------
# Part C: Real-ESRGAN per-batch GPU-chain decisions
# ---------------------------------------------------------------------------


def record_realesrgan_chain(re_imgproc, params: dict, n_draws: int) -> dict:
    import torch

    events: list = []
    orig = {
        "filter2d_torch": re_imgproc.filter2d_torch,
        "F_torch": re_imgproc.F_torch,
        "_generate_gaussian_noise_torch": re_imgproc._generate_gaussian_noise_torch,
        "_generate_poisson_noise_torch": re_imgproc._generate_poisson_noise_torch,
    }

    def rec_filter(image, kernel):
        events.append(("blur", int(kernel.flatten()[0].item())))
        return image

    def rec_interpolate(image, scale_factor=None, size=None, mode=None):
        events.append((
            "resize", mode,
            None if scale_factor is None else float(scale_factor),
            None if size is None else tuple(int(v) for v in size),
        ))
        return image

    def rec_gnoise(image, sigma, gray_noise):
        events.append((
            "gnoise",
            np.asarray(sigma).reshape(-1).astype(np.float64),
            np.asarray(gray_noise).reshape(-1).astype(np.float64),
        ))
        return torch.zeros_like(image)

    def rec_pnoise(image, scale, gray_noise):
        events.append((
            "pnoise",
            np.asarray(scale).reshape(-1).astype(np.float64),
            np.asarray(gray_noise).reshape(-1).astype(np.float64),
        ))
        return torch.zeros_like(image)

    class _JpegStub(torch.nn.Module):
        def forward(self, image, quality):
            events.append(("jpegq", np.asarray(quality).reshape(-1).astype(np.float64)))
            return image

    re_imgproc.filter2d_torch = rec_filter
    re_imgproc.F_torch = types.SimpleNamespace(interpolate=rec_interpolate)
    re_imgproc._generate_gaussian_noise_torch = rec_gnoise
    re_imgproc._generate_poisson_noise_torch = rec_pnoise

    gt = torch.full((CHAIN_BATCH, 3, CHAIN_GT, CHAIN_GT), 0.5)
    k1 = torch.full((21, 21), 1.0)
    k2 = torch.full((21, 21), 2.0)
    sinc = torch.full((21, 21), 3.0)
    sf = 4
    mode_code = {"area": 3, "bilinear": 1, "bicubic": 2}

    rec: dict[str, list] = {k: [] for k in (
        "blur1", "scale1", "mode1", "is_poisson1", "sigma1", "gray_g1",
        "pscale1", "gray_p1", "jpeg_q1", "blur2", "scale2", "mode2",
        "is_poisson2", "sigma2", "gray_g2", "pscale2", "gray_p2",
        "jpeg_first", "final_mode", "jpeg_q2",
    )}
    try:
        for _ in range(n_draws):
            events.clear()
            re_imgproc.degradation_process(
                gt, k1, k2, sinc, sf, params, jpeg_operation=_JpegStub(), usm_sharpener=None
            )
            ev = list(events)
            i = 0
            # stage 1: blur(k1) [p<=first_blur_probability], resize,
            # noise, jpeg
            if ev[i][0] == "blur":
                assert ev[i][1] == 1
                rec["blur1"].append(1)
                i += 1
            else:
                rec["blur1"].append(0)
            assert ev[i][0] == "resize" and ev[i][2] is not None
            rec["scale1"].append(ev[i][2])
            rec["mode1"].append(mode_code[ev[i][1]])
            i += 1
            if ev[i][0] == "gnoise":
                rec["is_poisson1"].append(0)
                rec["sigma1"].extend(ev[i][1])
                rec["gray_g1"].extend(ev[i][2])
            else:
                rec["is_poisson1"].append(1)
                rec["pscale1"].extend(ev[i][1])
                rec["gray_p1"].extend(ev[i][2])
            i += 1
            assert ev[i][0] == "jpegq"
            rec["jpeg_q1"].extend(ev[i][1])
            i += 1
            # stage 2: [blur(k2)], resize(size=), noise, then either
            # resize+sinc+jpeg or jpeg+resize+sinc
            if ev[i][0] == "blur" and ev[i][1] == 2:
                rec["blur2"].append(1)
                i += 1
            else:
                rec["blur2"].append(0)
            assert ev[i][0] == "resize" and ev[i][3] is not None
            rec["scale2"].append(ev[i][3][0] * sf / CHAIN_GT)
            rec["mode2"].append(mode_code[ev[i][1]])
            i += 1
            if ev[i][0] == "gnoise":
                rec["is_poisson2"].append(0)
                rec["sigma2"].extend(ev[i][1])
                rec["gray_g2"].extend(ev[i][2])
            else:
                rec["is_poisson2"].append(1)
                rec["pscale2"].extend(ev[i][1])
                rec["gray_p2"].extend(ev[i][2])
            i += 1
            tail = ev[i:]
            kinds = [e[0] for e in tail]
            if kinds == ["resize", "blur", "jpegq"]:
                rec["jpeg_first"].append(0)
                rec["final_mode"].append(mode_code[tail[0][1]])
                rec["jpeg_q2"].extend(tail[2][1])
                assert tail[1][1] == 3
            elif kinds == ["jpegq", "resize", "blur"]:
                rec["jpeg_first"].append(1)
                rec["final_mode"].append(mode_code[tail[1][1]])
                rec["jpeg_q2"].extend(tail[0][1])
                assert tail[2][1] == 3
            else:
                raise AssertionError(kinds)
    finally:
        for k, v in orig.items():
            setattr(re_imgproc, k, v)
    return {k: np.asarray(v) for k, v in rec.items()}


def main() -> None:
    import tempfile

    _install_scipy_shims()
    _install_torchvision_shims()
    random.seed(20260820)
    np.random.seed(20260820)
    import torch

    torch.manual_seed(20260820)

    sys.path.insert(0, str(REF / "Real_ESRGAN"))
    bi = _import_by_path("bsr_plan_imgproc", REF / "BSRGAN" / "imgproc.py")
    import dataset as re_dataset  # noqa: E402 — Real_ESRGAN/dataset.py
    import imgproc as re_imgproc  # noqa: E402 — Real_ESRGAN/imgproc.py

    assert re_dataset.imgproc is re_imgproc

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from srganfd_tpu.configs import get_config

    re_cfg = get_config("realesrgan")

    def listify(d: dict) -> dict:
        # the reference's dicts use lists; values were verified equal when
        # the configs were built (configs/realesrgan.py)
        return {k: list(v) if isinstance(v, tuple) else v for k, v in d.items()}

    model_params = listify(re_cfg.degradation_params["model"])
    process_params = listify(re_cfg.degradation_params["process"])

    out: dict[str, np.ndarray] = {}
    for prefix, data in [
        ("bsr4", record_bsrgan(bi, N_BSR4, 4, jpeg_prob=0.9, scale2_prob=0.25)),
        ("bsr2", record_bsrgan(bi, N_BSR2, 2, jpeg_prob=0.9, scale2_prob=0.25)),
        ("plus", record_bsrgan_plus(bi, N_PLUS, 4, **PLUS_PROBS)),
    ]:
        for k, v in data.items():
            out[f"{prefix}/{k}"] = v
    with tempfile.TemporaryDirectory() as td:
        for k, v in record_kernel_triple(
            re_imgproc, re_dataset, model_params, N_TRIPLE, pathlib.Path(td)
        ).items():
            out[f"triple/{k}"] = v
    for k, v in record_realesrgan_chain(re_imgproc, process_params, N_CHAIN_DRAWS).items():
        out[f"chain/{k}"] = v

    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "plan_distributions_ref.npz", **out)
    sizes = {k: v.shape for k, v in sorted(out.items())}
    for k, s in sizes.items():
        print(f"{k}: {s}")
    print(f"wrote plan_distributions_ref.npz ({len(out)} arrays)")


if __name__ == "__main__":
    main()
