"""Distributional equivalence of the host-side degradation plan samplers.

The last unverified fidelity class (VERDICT r3 missing #3): the planners
re-derive the reference's random decision DISTRIBUTIONS — shuffle orders,
branch probabilities, kernel families, sigma/beta/quality ranges — and a
biased sampler would silently shift the training distribution while
passing every forced-decision golden and lockstep test.

Oracle: ``tests/goldens/plan_distributions_ref.npz``, written by
``tools/gen_plan_distributions.py`` from ~10^4-10^5 seeded draws through
the EXECUTED reference samplers

- ``BSRGAN/imgproc.py:492-562`` + ``:211-225`` (``degradation_process``,
  ``_add_blur``)
- ``Real_ESRGAN/dataset.py:60-133`` (kernel-triple synthesis)
- ``Real_ESRGAN/imgproc.py:2323-2462`` (per-batch chain decisions)

Here the same counts are drawn from this repo's planners and every
decision dimension is compared two-sample: chi-square for discrete
dimensions (op slots, branch rates, kernel families, integer qualities —
where an off-by-one support error produces an unbounded statistic) and
Kolmogorov-Smirnov for continuous ones (sigmas, betas, angles, scales).
Seeds are fixed on both sides, so each assertion is deterministic.

These tests caught three real sampler biases when introduced (all fixed):
beta drawn flat-uniform instead of the reference's 50/50 mixture around
1, the sinc omega size threshold at 13 instead of the kernel range's
median (14), and the final sinc kernel synthesized at full 21 px instead
of a random size padded to 21.
"""

import pathlib

import numpy as np
import pytest
from scipy import stats

from srganfd_tpu.configs import get_config
from srganfd_tpu.ops.degrade import plan_bsrgan_batch
from srganfd_tpu.ops.realesrgan_degrade import (
    plan_realesrgan_batch,
    sample_kernel_triple_params,
)

REF = np.load(pathlib.Path(__file__).parent / "goldens" / "plan_distributions_ref.npz")

P_MIN = 1e-3  # two-sample agreement threshold (deterministic: seeds fixed)


def _chi2(ref: np.ndarray, ours: np.ndarray, label: str) -> None:
    """Two-sample chi-square over the union of observed categories."""
    ref = np.asarray(ref).astype(np.int64)
    ours = np.asarray(ours).astype(np.int64)
    cats = np.union1d(np.unique(ref), np.unique(ours))
    table = np.stack(
        [
            np.array([(ref == c).sum() for c in cats]),
            np.array([(ours == c).sum() for c in cats]),
        ]
    )
    # a category one side never produces is itself the finding — report it
    # as such rather than letting chi2 divide by a zero expectation
    both_zero = table.sum(0) == 0
    table = table[:, ~both_zero]
    if table.shape[1] == 1:
        assert (table > 0).all(), f"{label}: disjoint category support"
        return
    p = stats.chi2_contingency(table).pvalue
    assert p > P_MIN, f"{label}: chi2 p={p:.2e}\ncats={cats}\n{table}"


def _ks(ref: np.ndarray, ours: np.ndarray, label: str) -> None:
    p = stats.ks_2samp(np.asarray(ref, float), np.asarray(ours, float)).pvalue
    assert p > P_MIN, (
        f"{label}: KS p={p:.2e} (ref n={len(ref)} mean={np.mean(ref):.4f}, "
        f"ours n={len(ours)} mean={np.mean(ours):.4f})"
    )


# ---------------------------------------------------------------------------
# BSRGAN degradation_process plan
# ---------------------------------------------------------------------------


def _draw_bsrgan_plans(n: int, sf: int, seed: int):
    """n single-sample plans: scale2 and the JPEG slot are per-plan draws,
    so batch_size=1 yields one independent decision set per plan, exactly
    like one reference ``degradation_process`` call."""
    rng = np.random.default_rng(seed)
    rec = {
        "scale2": [], "scale2_cv2": [], "scale2_interp": [],
        "jpeg_mid": [], "jpeg_slot": [], "jpeg_mid_q": [], "jpeg_final_q": [],
        "blur": [],
    }
    for _ in range(n):
        plan = plan_bsrgan_batch(rng, 1, sf)
        rec["blur"].extend([plan.blur_params[0][0], plan.blur_params[1][0]])
        rec["scale2"].append(int(plan.scale2))
        if plan.scale2:
            rec["scale2_cv2"].append(int(plan.scale2_interp != 0))
            if plan.scale2_interp:
                rec["scale2_interp"].append(plan.scale2_interp)
        applied = bool(plan.jpeg_apply[0] > 0)
        rec["jpeg_mid"].append(int(applied))
        if applied:
            # the reference's slot is only observable when the mid JPEG
            # fires; ours is sampled independently of the apply mask, so
            # the conditional equals the marginal
            rec["jpeg_slot"].append(int(np.asarray(plan.jpeg_pos)[0]))
            rec["jpeg_mid_q"].append(int(plan.jpeg_quality[0]))
        rec["jpeg_final_q"].append(int(plan.final_jpeg_quality[0]))
    return {k: (v if k == "blur" else np.asarray(v)) for k, v in rec.items()}


@pytest.fixture(scope="module")
def bsr4():
    return _draw_bsrgan_plans(len(REF["bsr4/scale2"]), 4, seed=101)


@pytest.fixture(scope="module")
def bsr2():
    return _draw_bsrgan_plans(len(REF["bsr2/scale2"]), 2, seed=102)


def test_bsrgan_plan_discrete_decisions(bsr4, bsr2):
    _chi2(REF["bsr4/scale2"], bsr4["scale2"], "bsr4 scale2 rate")
    _chi2(REF["bsr4/scale2_cv2"], bsr4["scale2_cv2"], "bsr4 scale2 cv2-vs-matlab")
    _chi2(REF["bsr4/scale2_interp"], bsr4["scale2_interp"], "bsr4 scale2 interp")
    for tag, ours in (("bsr4", bsr4), ("bsr2", bsr2)):
        _chi2(REF[f"{tag}/jpeg_mid"], ours["jpeg_mid"], f"{tag} mid-JPEG rate")
        _chi2(REF[f"{tag}/jpeg_slot"], ours["jpeg_slot"], f"{tag} JPEG slot in shuffle")
        _chi2(REF[f"{tag}/jpeg_mid_q"], ours["jpeg_mid_q"], f"{tag} mid-JPEG quality")
        _chi2(REF[f"{tag}/jpeg_final_q"], ours["jpeg_final_q"], f"{tag} final-JPEG quality")
    # sf=2 never pre-downscales (reference gates on upscale_factor == 4)
    assert REF["bsr2/scale2"].sum() == 0 and bsr2["scale2"].sum() == 0


def test_bsrgan_blur_param_distributions(bsr4, bsr2):
    """Blur widths come from the PLAN draws, because the reference's wd/wd2
    scale with the effective factor after the scale2 pre-downscale
    (``BSRGAN/imgproc.py:511`` rebinds upscale_factor before the shuffle) —
    sampling at a fixed sf=4 would miss the 25% pre-halved mixture (the
    bug this test caught in plan_bsrgan_batch)."""
    for tag, plans in (("bsr4", bsr4), ("bsr2", bsr2)):
        draws = plans["blur"]
        iso = np.array([int(d["kind"] == "iso") for d in draws])
        _chi2(REF[f"{tag}/blur_iso"], iso, f"{tag} blur iso-vs-aniso rate")
        _chi2(
            REF[f"{tag}/blur_ksize"],
            np.array([d["ksize"] for d in draws]),
            f"{tag} blur ksize",
        )
        _ks(
            REF[f"{tag}/blur_sigma"],
            np.array([d["sigma"] for d in draws if d["kind"] == "iso"]),
            f"{tag} iso sigma",
        )
        for p in ("theta", "l1", "l2"):
            _ks(
                REF[f"{tag}/blur_{p}"],
                np.array([d[p] for d in draws if d["kind"] == "aniso"]),
                f"{tag} aniso {p}",
            )


# ---------------------------------------------------------------------------
# BSRGAN degradation_process_plus plan
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def plus():
    from srganfd_tpu.ops.degrade import plan_bsrgan_plus

    rng = np.random.default_rng(505)
    n = len(REF["plus/full_shuffle"])
    return [
        plan_bsrgan_plus(
            rng, 1, (64, 64), 4,
            shuffle_prob=0.5, poisson_prob=0.5, speckle_prob=0.5,
        )
        for _ in range(n)
    ]


def test_plus_shuffle_structure(plus):
    _chi2(
        REF["plus/full_shuffle"],
        np.array([int(p["full_shuffle"]) for p in plus]),
        "plus full-vs-local shuffle rate",
    )
    _chi2(
        REF["plus/full_pos5"],
        np.array([p["order"].index(5) for p in plus if p["full_shuffle"]]),
        "plus JPEG slot position (full shuffle)",
    )
    _chi2(
        REF["plus/local_first_23"],
        np.array([p["order"][2] for p in plus if not p["full_shuffle"]]),
        "plus local shuffle of slots 2-4",
    )
    _chi2(
        REF["plus/local_first_7"],
        np.array([p["order"][7] for p in plus if not p["full_shuffle"]]),
        "plus local shuffle of slots 7-10",
    )


def _plus_ops(plans, slots):
    for p in plans:
        for j, i in enumerate(p["order"]):
            if i in slots:
                yield p["ops"][j]


def test_plus_resize_and_jpeg_decisions(plus):
    branch, s_up, s_down, interp = [], [], [], []
    for op in _plus_ops(plus, (1, 7)):
        if op[0] == "noop":
            branch.append(2)
        elif op[4] >= 1.0:
            branch.append(0)
            s_up.append(op[4])
            interp.append(op[3])
        else:
            branch.append(1)
            s_down.append(op[4])
            interp.append(op[3])
    _chi2(REF["plus/resize_branch"], np.array(branch), "plus resize up/down/keep")
    _ks(REF["plus/resize_scale_up"], np.array(s_up), "plus resize scale (up)")
    _ks(REF["plus/resize_scale_down"], np.array(s_down), "plus resize scale (down)")
    _chi2(REF["plus/resize_interp"], np.array(interp), "plus resize interp")
    mid_q = [int(op[1][0]) for op in _plus_ops(plus, (5,))]
    _chi2(REF["plus/jpeg_mid_q"], np.array(mid_q), "plus mid-JPEG quality")
    _chi2(
        REF["plus/jpeg_final_q"],
        np.array([int(p["final_jpeg_quality"][0]) for p in plus]),
        "plus final-JPEG quality",
    )
    _chi2(
        REF["plus/final_interp"],
        np.array([p["final_interp"] for p in plus]),
        "plus final resize interp",
    )


def _branch_code(op):
    # reference coding: 0 color (r>0.6) / 1 gray (r<0.4) / 2 correlated
    if op[2][0] > 0.5:
        return 1
    if op[3][0] > 0.5:
        return 2
    return 0


def test_plus_noise_decisions(plus):
    gauss = list(_plus_ops(plus, (2, 8)))
    _chi2(
        REF["plus/gauss_level"],
        np.array([int(round(float(op[1][0]) * 255)) for op in gauss]),
        "plus gaussian noise level",
    )
    _chi2(
        REF["plus/gauss_branch"],
        np.array([_branch_code(op) for op in gauss]),
        "plus gaussian branch (color/gray/correlated)",
    )
    # poisson: taken count per draw, shot exponent u of vals=10**(2u+2),
    # gray rate (the reference's gray-on-r>=0.5 vs our r<0.5 are both
    # Bernoulli(1/2) — labels differ, the marginal must match)
    pois = [op for op in _plus_ops(plus, (3, 9)) if op[0] != "noop"]
    _chi2(
        REF["plus/poisson_taken"],
        np.array([
            sum(1 for j, i in enumerate(p["order"])
                if i in (3, 9) and p["ops"][j][0] != "noop")
            for p in plus
        ]),
        "plus poisson taken-per-draw",
    )
    _ks(
        REF["plus/poisson_u"],
        (np.log10(np.array([float(op[1][0]) for op in pois])) - 2.0) / 2.0,
        "plus poisson shot exponent",
    )
    _chi2(
        REF["plus/poisson_gray"],
        np.array([int(op[2][0]) for op in pois]),
        "plus poisson gray rate",
    )
    speck = [op for op in _plus_ops(plus, (4, 10)) if op[0] != "noop"]
    _chi2(
        REF["plus/speckle_taken"],
        np.array([
            sum(1 for j, i in enumerate(p["order"])
                if i in (4, 10) and p["ops"][j][0] != "noop")
            for p in plus
        ]),
        "plus speckle taken-per-draw",
    )
    _chi2(
        REF["plus/speckle_level"],
        np.array([int(round(float(op[1][0]) * 255)) for op in speck]),
        "plus speckle noise level",
    )
    _chi2(
        REF["plus/speckle_branch"],
        np.array([_branch_code(op) for op in speck]),
        "plus speckle branch (color/gray/correlated)",
    )


# ---------------------------------------------------------------------------
# Real-ESRGAN kernel-triple sampler
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def triple():
    params = get_config("realesrgan").degradation_params["model"]
    rng = np.random.default_rng(303)
    n = len(REF["triple/sinc3"])
    return params, [sample_kernel_triple_params(rng, params) for _ in range(n)]


def test_kernel_triple_discrete_decisions(triple):
    _, draws = triple
    fam_code = {
        "isotropic": 0, "anisotropic": 1,
        "generalized_isotropic": 2, "generalized_anisotropic": 3,
        "plateau_isotropic": 4, "plateau_anisotropic": 5,
    }
    for s in ("k1", "k2"):
        ours = [d[s] for d in draws]
        _chi2(REF[f"triple/{s}_size"], np.array([o["size"] for o in ours]), f"{s} size")
        _chi2(
            REF[f"triple/{s}_is_sinc"],
            np.array([int(o["sinc"]) for o in ours]),
            f"{s} sinc rate",
        )
        _chi2(
            REF[f"triple/{s}_family"],
            np.array([fam_code[o["mixed"]["kind"]] for o in ours if not o["sinc"]]),
            f"{s} mixed-kernel family",
        )
    _chi2(
        REF["triple/sinc3"],
        np.array([int(d["sinc3"] is not None) for d in draws]),
        "final sinc rate",
    )
    _chi2(
        REF["triple/sinc3_size"],
        np.array([d["sinc3"]["size"] for d in draws if d["sinc3"] is not None]),
        "final sinc size",
    )


def test_kernel_triple_omega_conditioned_on_size(triple):
    """The sinc cutoff's lower bound flips at the kernel range's MEDIAN
    size (pi/3 below, pi/5 at/above — ``Real_ESRGAN/dataset.py:68``);
    comparing omega per size group pins the threshold placement (a 13-
    vs-14 off-by-one concentrates entirely in the size-13 slice)."""
    _, draws = triple
    for s in ("k1", "k2"):
        ref_size = REF[f"triple/{s}_omega_size"]
        ref_omega = REF[f"triple/{s}_omega"]
        ours = [(d[s]["size"], d[s]["omega"]) for d in draws if d[s]["sinc"]]
        for group, pick in (("below-median", lambda z: z < 14), ("at/above", lambda z: z >= 14)):
            ref_g = ref_omega[pick(ref_size)]
            ours_g = np.array([o for z, o in ours if pick(z)])
            _ks(ref_g, ours_g, f"{s} omega ({group})")
        # the size-13 slice alone (the off-by-one's entire signal)
        ours_13 = np.array([o for z, o in ours if z == 13])
        _ks(ref_omega[ref_size == 13], ours_13, f"{s} omega (size=13)")
    ours3 = np.array([d["sinc3"]["omega"] for d in draws if d["sinc3"] is not None])
    _ks(REF["triple/sinc3_omega"], ours3, "final sinc omega")


def test_kernel_triple_continuous_params(triple):
    """sigma_x pooled; sigma_y/rotation only exist on anisotropic draws;
    beta per family must reproduce the reference's 50/50 MIXTURE of
    U(beta_min, 1) and U(1, beta_max) — including the plateau range's
    (1, 2) lower piece degenerating to a point mass at exactly 1."""
    _, draws = triple
    for s in ("k1", "k2"):
        mixed = [d[s]["mixed"] for d in draws if not d[s]["sinc"]]
        _ks(
            REF[f"triple/{s}_sigma_x"],
            np.array([m["sigma_x"] for m in mixed]),
            f"{s} sigma_x",
        )
        aniso = [m for m in mixed if m["kind"].endswith("anisotropic")]
        _ks(
            REF[f"triple/{s}_sigma_y"],
            np.array([m["sigma_y"] for m in aniso]),
            f"{s} sigma_y (aniso)",
        )
        _ks(
            REF[f"triple/{s}_rotation"],
            np.array([m["theta"] for m in aniso]),
            f"{s} rotation (aniso)",
        )
        beta_gen = np.array(
            [m["beta"] for m in mixed if m["kind"].startswith("generalized")]
        )
        _ks(REF[f"triple/{s}_beta_gen"], beta_gen, f"{s} generalized beta")
        beta_pl = np.array([m["beta"] for m in mixed if m["kind"].startswith("plateau")])
        _ks(REF[f"triple/{s}_beta_plateau"], beta_pl, f"{s} plateau beta")
        # the mixture's signature: ~half of generalized betas below 1,
        # ~half of plateau betas exactly 1.0 (flat-uniform sampling would
        # put 1/7 and 0 there respectively)
        _chi2(
            (REF[f"triple/{s}_beta_gen"] < 1.0).astype(int),
            (beta_gen < 1.0).astype(int),
            f"{s} generalized beta below-1 mass",
        )
        _chi2(
            (REF[f"triple/{s}_beta_plateau"] == 1.0).astype(int),
            (beta_pl == 1.0).astype(int),
            f"{s} plateau beta point mass at 1",
        )


# ---------------------------------------------------------------------------
# Real-ESRGAN per-batch chain plan
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chain():
    params = get_config("realesrgan").degradation_params["process"]
    rng = np.random.default_rng(404)
    n = len(REF["chain/blur1"])
    return [
        plan_realesrgan_batch(rng, 8, (256, 256), 4, params) for _ in range(n)
    ]


def test_chain_discrete_decisions(chain):
    _chi2(
        REF["chain/blur2"],
        np.array([int(p.second_blur) for p in chain]),
        "second-blur rate",
    )
    _chi2(
        REF["chain/jpeg_first"],
        np.array([int(p.jpeg_first_in_stage2) for p in chain]),
        "stage-2 branch order",
    )
    for ref_key, attr in (
        ("mode1", "interp1"), ("mode2", "interp2"), ("final_mode", "final_interp"),
    ):
        _chi2(
            REF[f"chain/{ref_key}"],
            np.array([getattr(p, attr) for p in chain]),
            f"resize mode {ref_key}",
        )
    # noise-type rate: per batch in the reference, per sample in our plan
    # (documented granularity deviation — the marginal must match)
    ours_poisson = np.concatenate([p.noise1_is_poisson for p in chain]).astype(int)
    _chi2(REF["chain/is_poisson1"], ours_poisson, "stage-1 noise type marginal")
    ours_poisson2 = np.concatenate([p.noise2_is_poisson for p in chain]).astype(int)
    _chi2(REF["chain/is_poisson2"], ours_poisson2, "stage-2 noise type marginal")
    for stage in (1, 2):
        ref_gray = np.concatenate(
            [REF[f"chain/gray_g{stage}"], REF[f"chain/gray_p{stage}"]]
        ).astype(int)
        ours_gray = np.concatenate(
            [getattr(p, f"noise{stage}_gray") for p in chain]
        ).astype(int)
        _chi2(ref_gray, ours_gray, f"stage-{stage} gray-noise rate")
    assert (REF["chain/blur1"] == 1).all()  # first blur fires at p=1.0


def test_chain_continuous_decisions(chain):
    # stage-1 resize scale: exact scale_factor on both sides (the point
    # mass at 1.0 is the 'keep' branch)
    _ks(
        REF["chain/scale1"],
        np.array([p.scale1 for p in chain]),
        "stage-1 resize scale",
    )
    # stage-2 scale is only observable through int(H/sf * scale) on the
    # reference side; discretize ours identically before comparing
    ours_s2 = np.array([np.floor(64 * p.scale2) / 64.0 for p in chain])
    ref_s2 = np.floor(np.asarray(REF["chain/scale2"]) * 64.0 + 1e-9) / 64.0
    _ks(ref_s2, ours_s2, "stage-2 resize scale (discretized)")
    for stage in (1, 2):
        _ks(
            REF[f"chain/sigma{stage}"],
            np.concatenate([getattr(p, f"noise{stage}_sigma") for p in chain]) * 255.0,
            f"stage-{stage} gaussian sigma",
        )
        _ks(
            REF[f"chain/pscale{stage}"],
            np.concatenate([getattr(p, f"noise{stage}_poisson_scale") for p in chain]),
            f"stage-{stage} poisson scale",
        )
        _ks(
            REF[f"chain/jpeg_q{stage}"],
            np.concatenate([getattr(p, f"jpeg{stage}_quality") for p in chain]),
            f"stage-{stage} JPEG quality",
        )


def test_harness_detects_an_injected_bias():
    """Meta-check: the statistics actually have teeth — a flat-uniform
    beta (the exact bug this harness caught in random_mixed_kernel) must
    FAIL the generalized-beta KS against the reference draws."""
    rng = np.random.default_rng(7)
    biased = rng.uniform(0.5, 4.0, size=len(REF["triple/k1_beta_gen"]))
    p = stats.ks_2samp(np.asarray(REF["triple/k1_beta_gen"], float), biased).pvalue
    assert p < P_MIN
