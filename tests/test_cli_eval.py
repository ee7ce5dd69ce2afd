"""Shape-bucketed evaluation: a mixed-size test directory must compile at
most one generator program per bucket, not one per image size
(SURVEY §7.3; VERDICT r1 weak #5)."""

import argparse

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from srganfd_tpu.cli.test import run_eval


def _make_args(**kw):
    base = dict(
        config="rrdbnet",
        gt_dir="",
        lr_dir="",
        weights="",
        save_images=False,
        max_images=0,
        subdivision_lpips=False,
        save_discriminator_eval=False,
        save_attention_layers=False,
        niqe_model="",
        tiny=True,
        use_ema=False,
        exact_shapes=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def mixed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mixed_eval")
    rng = np.random.default_rng(0)
    # 5 images, 5 distinct sizes -> 2 distinct 64-multiple buckets:
    # (128, 128) and (64, 128)
    for i, (h, w) in enumerate([(70, 90), (100, 120), (128, 128), (60, 100), (50, 70)]):
        img = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"im{i}.png"), img)
    return str(d)


def test_bucketed_eval_bounds_compiles(mixed_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = run_eval(_make_args(gt_dir=mixed_dir))
    assert np.isfinite(out["avg"]["PSNR"])
    # 5 distinct image sizes but only 2 bucket shapes
    assert out["generator_compiles"] == 2, out


def test_exact_shapes_compiles_per_size(mixed_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = run_eval(_make_args(gt_dir=mixed_dir, exact_shapes=True))
    assert out["generator_compiles"] == 5  # one per distinct size


def test_bucketed_metrics_match_exact_for_aligned_sizes(tmp_path, monkeypatch):
    """For images already on the bucket grid, bucketing is a no-op: both
    modes must produce identical metrics."""
    rng = np.random.default_rng(1)
    d = tmp_path / "aligned"
    d.mkdir()
    for i in range(2):
        img = (rng.uniform(0, 1, (128, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"im{i}.png"), img)
    monkeypatch.chdir(tmp_path)
    a = run_eval(_make_args(gt_dir=str(d)))
    b = run_eval(_make_args(gt_dir=str(d), exact_shapes=True))
    assert a["avg"] == b["avg"]


def test_paired_lr_bucketed_eval(tmp_path, monkeypatch):
    """Paired GT/LR directories with mixed sizes: both sides bucket, SR is
    shape-matched to the GT bucket, metrics stay exact on the valid
    region and compiles stay bounded."""
    rng = np.random.default_rng(2)
    gt_d, lr_d = tmp_path / "gt", tmp_path / "lr"
    gt_d.mkdir()
    lr_d.mkdir()
    for i, (h, w) in enumerate([(72, 88), (100, 120), (128, 128)]):
        gt = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_d / f"im{i}.png"), gt)
        lr = cv2.resize(gt, (w // 4, h // 4), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(lr_d / f"im{i}.png"), lr)
    monkeypatch.chdir(tmp_path)
    out = run_eval(_make_args(gt_dir=str(gt_d), lr_dir=str(lr_d)))
    assert np.isfinite(out["avg"]["PSNR"]) and out["avg"]["PSNR"] > 5
    # 3 distinct LR sizes -> at most 2 bucketed LR shapes ((32,32),(32,64)->..)
    assert out["generator_compiles"] <= 2, out


def test_self_ensemble_eval(mixed_dir, tmp_path, monkeypatch):
    """--self-ensemble: metrics stay finite; the transposed orientation of
    the non-square bucket adds at most one extra compiled program."""
    monkeypatch.chdir(tmp_path)
    out = run_eval(_make_args(gt_dir=mixed_dir, self_ensemble=True))
    assert np.isfinite(out["avg"]["PSNR"]) and out["avg"]["PSNR"] > 5
    # buckets (128,128) + (64,128): square reuses one batch-4 program for
    # both orientations, non-square adds its transpose -> <= 3
    assert out["generator_compiles"] <= 3, out


def test_niqe_impl_auto_selection_rule():
    """--niqe-impl 'auto' keeps the bit-exact torch twin for crops but
    falls back to the numpy niqe() above the pixel budget, so a
    megapixel-class frame completes in seconds by default; explicit
    choices are honored unconditionally."""
    from srganfd_tpu.cli.test import NIQE_AUTO_MODULE_MAX_PIXELS, select_niqe_impl

    small, big = 128 * 128, 1280 * 960
    assert big > NIQE_AUTO_MODULE_MAX_PIXELS >= small
    assert select_niqe_impl("auto", True, small) == "module"
    assert select_niqe_impl("auto", True, NIQE_AUTO_MODULE_MAX_PIXELS) == "module"
    assert select_niqe_impl("auto", True, big) == "numpy"
    assert select_niqe_impl("auto", False, small) == "numpy"
    assert select_niqe_impl("module", True, big) == "module"
    assert select_niqe_impl("numpy", True, small) == "numpy"


def test_tiled_eval_close_to_whole_frame(tmp_path, monkeypatch):
    """--tile on the eval CLI: overlapping-tile SR with feathered stitch
    must track whole-frame metrics for a conv model (receptive radius <=
    overlap). Rationale: transformer archs evaluated on frames much
    larger than their training crops run attention out-of-distribution —
    tiling keeps the token count at training scale (cli/test.py --tile
    help)."""
    import cv2

    from srganfd_tpu.cli.test import run_eval

    rng = np.random.default_rng(0)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    for i in range(2):
        img = cv2.resize(
            rng.uniform(0, 1, (16, 16, 3)), (96, 96), interpolation=cv2.INTER_CUBIC
        )
        cv2.imwrite(str(gt_dir / f"g{i}.png"), (np.clip(img, 0, 1) * 255).astype(np.uint8))

    def go(**kw):
        return run_eval(_make_args(gt_dir=str(gt_dir), **kw))

    monkeypatch.chdir(tmp_path)
    whole = go()["avg"]
    tiled = go(tile=48, tile_overlap=8)["avg"]
    assert abs(whole["PSNR"] - tiled["PSNR"]) < 0.3, (whole, tiled)
    assert abs(whole["SSIM"] - tiled["SSIM"]) < 0.02, (whole, tiled)
