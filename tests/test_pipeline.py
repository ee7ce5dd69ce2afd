"""End-to-end data-pipeline tests: dataset -> adapter -> (gt, lr) device
batches for each degradation mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
from srganfd_tpu.configs import get_config


def _gt_batch(n, size, seed=0):
    return {"gt": np.random.default_rng(seed).uniform(size=(n, size, size, 3)).astype(np.float32)}


def test_bicubic_adapter():
    cfg = get_config("rrdbnet").replace(gt_image_size=64)
    ad = DegradationAdapter(cfg, seed=0)
    out = ad(_gt_batch(2, 64), 0)
    assert out["gt"].shape == (2, 64, 64, 3)
    assert out["lr"].shape == (2, 16, 16, 3)
    assert 0.0 <= float(out["lr"].min()) and float(out["lr"].max()) <= 1.0


def test_bsrgan_adapter_crops_aligned():
    cfg = get_config("bsrgan").replace(crop_image_size=192, gt_image_size=96)
    ad = DegradationAdapter(cfg, seed=0)
    out = ad(_gt_batch(2, 192), 0)
    assert out["gt"].shape == (2, 96, 96, 3)
    assert out["lr"].shape == (2, 48, 48, 3)


def test_bsrgan_adapter_eval_mode_full_size():
    cfg = get_config("bsrgan")
    ad = DegradationAdapter(cfg, seed=0, train=False)
    out = ad(_gt_batch(1, 128), 0)
    assert out["gt"].shape == (1, 128, 128, 3)
    assert out["lr"].shape == (1, 64, 64, 3)


def test_realesrgan_adapter():
    from srganfd_tpu.ops.realesrgan_degrade import sample_kernel_triple

    cfg = get_config("realesrgan").replace(gt_image_size=64)
    rng = np.random.default_rng(0)
    batch = _gt_batch(2, 128)
    ks = [sample_kernel_triple(rng, cfg.degradation_params["model"]) for _ in range(2)]
    batch["kernel1"] = np.stack([k[0] for k in ks])
    batch["kernel2"] = np.stack([k[1] for k in ks])
    batch["sinc_kernel"] = np.stack([k[2] for k in ks])
    ad = DegradationAdapter(cfg, seed=0)
    out = ad(batch, 0)
    assert out["gt"].shape == (2, 64, 64, 3)
    assert out["gt_pixel"].shape == (2, 64, 64, 3)
    assert out["lr"].shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out["lr"])).all()


def test_bsrgan_scale2_branch():
    # force the x4 pre-downscale branch (scale2_prob=1): the chain halves
    # internally then downsamples by the reassigned sf=2 (net /4), but the
    # trained pair keeps the CONFIG's x4 ratio (train_bsrgan.py:399)
    cfg = get_config("bsrgan").replace(
        upscale_factor=4,
        g_arch="bsrgan_x4",
        crop_image_size=192,
        gt_image_size=96,
        degradation_params={"jpeg_prob": 0.9, "scale2_prob": 1.0},
    )
    ad = DegradationAdapter(cfg, seed=0)
    out = ad(_gt_batch(2, 192, seed=1), 0)
    assert out["gt"].shape == (2, 96, 96, 3)
    assert out["lr"].shape == (2, 24, 24, 3)


def test_degradation_adapter_deterministic_by_seed():
    # reproducibility: same seed => identical degraded batches
    cfg = get_config("bsrgan").replace(crop_image_size=96, gt_image_size=48)
    batch = _gt_batch(2, 96, seed=3)
    out_a = DegradationAdapter(cfg, seed=5)(dict(batch), 0)
    out_b = DegradationAdapter(cfg, seed=5)(dict(batch), 0)
    np.testing.assert_array_equal(np.asarray(out_a["lr"]), np.asarray(out_b["lr"]))
    np.testing.assert_array_equal(np.asarray(out_a["gt"]), np.asarray(out_b["gt"]))
    out_c = DegradationAdapter(cfg, seed=6)(dict(batch), 0)
    assert not np.array_equal(np.asarray(out_a["lr"]), np.asarray(out_c["lr"]))


def test_bsrgan_lr_size_matches_chain_output():
    """The host-side LR-edge prediction (used for fused crop limits) must
    match the chain's actual output for every scale2 variant."""
    import numpy as np

    from srganfd_tpu.ops.degrade import (
        BsrganPlan,
        apply_bsrgan_batch,
        bsrgan_lr_size,
        plan_bsrgan_batch,
    )

    rng = np.random.default_rng(9)
    # Odd GT edges exercise the ceil (MATLAB) vs floor (cv2 int(0.5*h))
    # pre-halve divergence (ADVICE r1); even edges cover the common path.
    for edge in (64, 65):
        gt = np.random.default_rng(0).uniform(size=(1, edge, edge, 3)).astype(np.float32)
        seen = set()
        for _ in range(24):
            plan = plan_bsrgan_batch(rng, 1, 4)
            key = (plan.scale2, plan.scale2_interp)
            if key in seen:
                continue
            seen.add(key)
            lr = apply_bsrgan_batch(gt, plan)
            assert lr.shape[1] == bsrgan_lr_size(edge, plan), (edge, key)
