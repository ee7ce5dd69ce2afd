"""Weight-preflight tool: schema validation catches malformed npz/mat
files and accepts exactly what the loss/metric loaders consume."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
import check_weights  # noqa: E402


def _valid_vgg19(path):
    arrays = {}
    for idx, out_ch, in_ch in check_weights.VGG19_SCHEMA:
        arrays[f"features.{idx}.weight"] = np.zeros((out_ch, in_ch, 3, 3), np.float32)
        arrays[f"features.{idx}.bias"] = np.zeros((out_ch,), np.float32)
    np.savez(path, **arrays)


def _valid_lpips(path):
    arrays = {}
    for i, shape in enumerate(check_weights.LPIPS_ALEX_SCHEMA):
        arrays[f"alex.{i}.weight"] = np.zeros(shape, np.float32)
        arrays[f"alex.{i}.bias"] = np.zeros((shape[0],), np.float32)
    for i, c in enumerate(check_weights.LPIPS_LIN_CHANNELS):
        arrays[f"lin.{i}.weight"] = np.zeros((1, c, 1, 1), np.float32)
    np.savez(path, **arrays)


def test_vgg19_schema_roundtrip(tmp_path):
    p = str(tmp_path / "vgg19.npz")
    _valid_vgg19(p)
    assert check_weights.check_vgg19(p) == []
    # wrong shape flagged
    bad = dict(np.load(p))
    bad["features.0.weight"] = np.zeros((64, 3, 5, 5), np.float32)
    np.savez(p, **bad)
    errs = check_weights.check_vgg19(p)
    assert errs and "features.0.weight" in errs[0]


def test_vgg19_valid_npz_activates_content_loss(tmp_path):
    """A schema-valid npz is exactly what load_vgg19_params consumes."""
    from srganfd_tpu.losses.content import load_vgg19_params

    p = str(tmp_path / "vgg19.npz")
    _valid_vgg19(p)
    variables, pretrained = load_vgg19_params(["features.34"], npz_path=p)
    assert pretrained


def test_lpips_schema_roundtrip(tmp_path):
    p = str(tmp_path / "lpips.npz")
    _valid_lpips(p)
    assert check_weights.check_lpips(p) == []
    bad = dict(np.load(p))
    del bad["lin.3.weight"]
    np.savez(p, **bad)
    errs = check_weights.check_lpips(p)
    assert any("lin.3.weight" in e for e in errs)


def test_lpips_valid_npz_activates(tmp_path):
    from srganfd_tpu.losses.lpips import load_lpips_params

    p = str(tmp_path / "lpips.npz")
    _valid_lpips(p)
    _, lins, pretrained = load_lpips_params(npz_path=p)
    assert pretrained and len(lins) == 5


def test_niqe_model_check(tmp_path):
    from srganfd_tpu.metrics.niqe import NiqeModel, save_niqe_model

    p = str(tmp_path / "niqe.npz")
    save_niqe_model(NiqeModel(np.zeros(36), np.eye(36)), p)
    assert check_weights.check_niqe(p) == []
    np.savez(p, mu_pris_param=np.zeros(20), cov_pris_param=np.eye(20))
    assert check_weights.check_niqe(p)


def test_cli_reports_and_exit_codes(tmp_path):
    tool = str(pathlib.Path(check_weights.__file__))
    env_ok = subprocess.run(
        [sys.executable, tool], capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert env_ok.returncode == 0 and "ABSENT" in env_ok.stdout
    strict = subprocess.run(
        [sys.executable, tool, "--strict"], capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert strict.returncode == 1
    p = str(tmp_path / "vgg19.npz")
    _valid_vgg19(p)
    ok = subprocess.run(
        [sys.executable, tool, "--vgg19", p], capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert ok.returncode == 0 and f"OK ({p})" in ok.stdout


def test_fetch_weights_produces_and_validates(tmp_path, monkeypatch, capsys):
    """tools/fetch_weights.py: one command that produces + validates the
    gated artifacts (VERDICT r4 #6). Producers with missing deps report
    SKIPPED (rc=1); valid artifacts short-circuit on rerun."""
    import importlib
    import sys

    sys.path.insert(0, "tools")
    fetch = importlib.import_module("fetch_weights")

    # a fake producer that writes a schema-valid vgg npz
    def fake_vgg(path):
        arrays = {}
        for idx, out_ch, in_ch in fetch.check_weights.VGG19_SCHEMA:
            arrays[f"features.{idx}.weight"] = np.zeros((out_ch, in_ch, 3, 3), np.float32)
            arrays[f"features.{idx}.bias"] = np.zeros((out_ch,), np.float32)
        np.savez(path, **arrays)
        return None

    monkeypatch.setattr(fetch, "_produce_vgg19", fake_vgg)
    monkeypatch.setattr(fetch, "_produce_lpips", lambda p: "no lpips package")
    monkeypatch.setattr(
        fetch, "_produce_niqe", lambda p, d: "no --pristine-dir given"
    )
    monkeypatch.setattr(
        sys, "argv", ["fetch_weights", "--out-dir", str(tmp_path), "--skip-tests"]
    )
    assert fetch.main() == 1  # two gates skipped
    out = capsys.readouterr().out
    assert "[vgg19] OK (produced)" in out
    assert "[lpips] SKIPPED" in out
    assert "export SRGANFD_VGG19_NPZ=" in out
    # rerun: the existing valid artifact short-circuits
    monkeypatch.setattr(
        fetch, "_produce_vgg19", lambda p: (_ for _ in ()).throw(AssertionError)
    )
    assert fetch.main() == 1
    assert "[vgg19] OK (existing, valid)" in capsys.readouterr().out
