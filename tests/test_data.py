"""Dataset/loader tests over a synthetic image directory."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from srganfd_tpu.data.datasets import (
    BatchLoader,
    DegeneratedImageDataset,
    TrainValidImageDataset,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = (rng.uniform(0, 255, (96 + i, 128, 3))).astype(np.uint8)
        cv2.imwrite(str(d / f"img_{i}.png"), img)
    return str(d)


def test_train_dataset_crops(image_dir):
    ds = TrainValidImageDataset(image_dir, gt_image_size=64, mode="Train")
    rec = ds.__getitem__(0, np.random.default_rng(0))
    assert rec["gt"].shape == (64, 64, 3)
    assert rec["gt"].dtype == np.float32
    assert 0.0 <= rec["gt"].min() and rec["gt"].max() <= 1.0


def test_valid_dataset_center_crop_deterministic(image_dir):
    ds = TrainValidImageDataset(image_dir, gt_image_size=64, mode="Valid")
    a = ds.__getitem__(1, np.random.default_rng(1))["gt"]
    b = ds.__getitem__(1, np.random.default_rng(2))["gt"]
    np.testing.assert_array_equal(a, b)


def test_batch_loader_shapes_and_determinism(image_dir):
    ds = TrainValidImageDataset(image_dir, gt_image_size=32, mode="Train")
    loader = BatchLoader(ds, batch_size=4, seed=7, num_workers=2)
    it = iter(loader)
    b1 = next(it)
    assert b1["gt"].shape == (4, 32, 32, 3)
    loader2 = BatchLoader(ds, batch_size=4, seed=7, num_workers=2)
    b1b = next(iter(loader2))
    np.testing.assert_array_equal(b1["gt"], b1b["gt"])  # same seed => same batch


def test_batch_loader_single_pass(image_dir):
    ds = TrainValidImageDataset(image_dir, gt_image_size=32, mode="Valid")
    loader = BatchLoader(ds, batch_size=2, shuffle=False, loop=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3


def test_batch_loader_start_batch_seeks(image_dir):
    """start_batch=k yields byte-identical batches to consuming k first —
    the O(1) data-order resume contract (index order and per-record RNG
    are pure functions of (seed, batch id))."""
    ds = TrainValidImageDataset(image_dir, gt_image_size=32, mode="Train")
    # 6 images / batch 4 => seek crosses an epoch-permutation boundary
    full_it = iter(BatchLoader(ds, batch_size=4, seed=3, num_workers=2))
    full = [next(full_it)["gt"] for _ in range(5)]
    sought_it = iter(BatchLoader(ds, batch_size=4, seed=3, num_workers=2, start_batch=3))
    for want in full[3:]:
        np.testing.assert_array_equal(want, next(sought_it)["gt"])


def test_degradation_adapter_step_keyed_rng():
    """Adapter randomness is keyed by (seed, host, step): two adapters (a
    crashed run and its resume) produce identical plans at the same step,
    and different plans at different steps."""
    from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
    from srganfd_tpu.configs import get_config

    cfg = get_config("bsrgan").replace(crop_image_size=96, gt_image_size=48)
    a = DegradationAdapter(cfg, seed=11)
    b = DegradationAdapter(cfg, seed=11)
    assert a.step_rng(5).integers(0, 1 << 30, 8).tolist() == b.step_rng(
        5
    ).integers(0, 1 << 30, 8).tolist()
    assert a.step_rng(5).integers(0, 1 << 30, 8).tolist() != a.step_rng(
        6
    ).integers(0, 1 << 30, 8).tolist()
    gt = np.random.default_rng(0).uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    out1 = a(dict(gt=gt), 7)
    out2 = b(dict(gt=gt), 7)
    np.testing.assert_array_equal(np.asarray(out1["lr"]), np.asarray(out2["lr"]))
    np.testing.assert_array_equal(np.asarray(out1["gt"]), np.asarray(out2["gt"]))


def test_degenerated_dataset_kernels(image_dir):
    from srganfd_tpu.configs.realesrgan import degradation_model_parameters_dict as dm

    ds = DegeneratedImageDataset(image_dir, 64, dm, mode="Train")
    rec = ds.__getitem__(0, np.random.default_rng(0))
    assert rec["kernel1"].shape == (21, 21)
    assert rec["kernel2"].shape == (21, 21)
    assert rec["sinc_kernel"].shape == (21, 21)
    for k in ("kernel1", "kernel2", "sinc_kernel"):
        assert abs(rec[k].sum() - 1.0) < 1e-4


def test_adapter_rng_disjoint_from_loader_rng():
    """The adapter's (seed, tag, host, step) entropy tuple must not collide
    with BatchLoader's per-record (seed, batch_no, j) keying: with a shared
    cfg.seed, host 0's step-s degradation stream would otherwise be
    bit-identical to batch 0's record-s augmentation stream."""
    from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
    from srganfd_tpu.configs import get_config

    cfg = get_config("bsrgan")
    a = DegradationAdapter(cfg, seed=7)
    for s in range(4):
        adapter_draw = a.step_rng(s).integers(0, 1 << 30, 8).tolist()
        loader_draw = np.random.default_rng((7, 0, s)).integers(0, 1 << 30, 8).tolist()
        assert adapter_draw != loader_draw
