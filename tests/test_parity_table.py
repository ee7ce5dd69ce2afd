"""tools/parity_table.py proven with suite-minted stand-in checkpoints.

The real-artifact workflow (port reference ``.pth`` -> evaluate through
the production eval CLI -> gate on the 0.1 dB bar) must work the moment
real checkpoints appear — so it is exercised NOW with ``.pth`` files
minted from the reference-topology torch twin at tiny size: the same
weights evaluated through our jitted Flax path and through the torch
twin must land within the bar (generator output parity is 3e-5,
tests/test_generator_arch_parity.py), and a deliberately-wrong targets
file must fail the gate.
"""

import json
import pathlib
import sys
import zlib

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")

import parity_table  # noqa: E402
from torch_twins import build_twin  # noqa: E402

TINY = {"channels": 8, "growth_channels": 4, "num_blocks": 2}


@pytest.fixture(scope="module")
def gt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gt")
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 1.5)  # structure, not pure noise
        cv2.imwrite(str(d / f"f{i}.png"), img)
    return d


def _mint_pth(arch: str, path: pathlib.Path, seed: int) -> None:
    torch.manual_seed(seed)
    twin = build_twin(arch, **TINY)
    torch.save({"state_dict": twin.state_dict()}, str(path))


@pytest.mark.parametrize("arch", ["rrdbnet_x4", "bsrgan_x2"])
def test_parity_gate_passes_for_identical_weights(arch, gt_dir, tmp_path):
    pth = tmp_path / f"{arch}.pth.tar"
    _mint_pth(arch, pth, seed=zlib.crc32(arch.encode()))  # stable across runs
    out = tmp_path / "parity.json"
    result = parity_table.run([
        "--gt-dir", str(gt_dir),
        "--entry", f"{arch}={pth}",
        "--g-kwargs", json.dumps(TINY),
        "--out", str(out),
    ])
    assert result["all_pass"], result
    row = result["rows"][0]
    assert row["ref_source"] == "torch-twin"
    # same weights through both stacks: the delta must be far inside the
    # 0.1 dB bar (it measures float roundoff, not model differences)
    assert abs(row["delta_psnr"]) < 0.02, row
    assert abs(row["delta_ssim"]) < 1e-3, row
    saved = json.loads(out.read_text())
    assert saved["rows"][0]["arch"] == arch


def test_parity_gate_fails_on_wrong_targets(gt_dir, tmp_path):
    pth = tmp_path / "rrdbnet_x4.pth.tar"
    _mint_pth("rrdbnet_x4", pth, seed=7)
    targets = tmp_path / "targets.json"
    targets.write_text(json.dumps({"rrdbnet_x4": {"PSNR": 99.0, "SSIM": 0.999}}))
    result = parity_table.run([
        "--gt-dir", str(gt_dir),
        "--entry", f"rrdbnet_x4={pth}",
        "--g-kwargs", json.dumps(TINY),
        "--targets", str(targets),
        "--out", "",
    ])
    assert not result["all_pass"]
    assert result["rows"][0]["ref_source"] == "targets"


def test_unsupported_arch_is_rejected_with_guidance(gt_dir):
    with pytest.raises(SystemExit, match="no torch-twin"):
        parity_table.run([
            "--gt-dir", str(gt_dir),
            "--entry", "bsrgantrans_x2=whatever.pth",
        ])
