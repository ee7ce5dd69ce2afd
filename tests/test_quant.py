"""int8 post-training quantization (ops/quant.py): symmetric quantizer
bounds, exact-int32 conv accumulation, RDB/generator quality deltas, and
the --quant-int8 CLI wiring. Serving-only path, beyond the reference
(the reference serves fp32 torch modules, ``ESRGAN/inference.py:39-74``)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.models import create_model
from srganfd_tpu.models.blocks import ResidualDenseBlock
from srganfd_tpu.ops.quant import dequantize, qconv2d, quantize_symmetric


def test_quantize_symmetric_roundtrip_bounds():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 6, 8)).astype(np.float32))
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8 and s.shape == ()
    # round-to-nearest: reconstruction error is at most half a step
    assert float(jnp.max(jnp.abs(dequantize(q, s) - x))) <= float(s) / 2 + 1e-7

    qc, sc = quantize_symmetric(x, channel_axis=3)
    assert sc.shape == (1, 1, 1, 8)
    err = jnp.abs(dequantize(qc, sc) - x)
    assert bool(jnp.all(err <= sc / 2 + 1e-7))
    # per-channel scales hit each channel's absmax exactly
    np.testing.assert_allclose(
        np.asarray(sc).ravel() * 127.0,
        np.abs(np.asarray(x)).max(axis=(0, 1, 2)),
        rtol=1e-6,
    )


def test_qconv2d_matches_f32_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.1)
    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y_q = qconv2d(x, k)
    assert y_q.dtype == jnp.float32
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_qconv2d_exact_when_inputs_are_quantized_grid():
    """With inputs already on the int8 grid the only arithmetic is the
    exact int32 accumulation — outputs must be bit-exact."""
    rng = np.random.default_rng(2)
    xs, ks = 2.0**-8, 2.0**-9  # power-of-two scales: absmax/127 is exact
    xq = rng.integers(-127, 128, (1, 5, 5, 4)).astype(np.float32)
    kq = rng.integers(-127, 128, (3, 3, 4, 4)).astype(np.float32)
    # the quantizer recovers the grid only when the absmax element sits
    # exactly at +/-127: pin it per-tensor for x, per-output-channel for k
    xq[0, 0, 0, 0] = 127.0
    kq[0, 0, 0, :] = 127.0
    x = jnp.asarray(xq * xs)
    k = jnp.asarray(kq * ks)
    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(qconv2d(x, k)), np.asarray(y_ref), rtol=2e-6)


@pytest.mark.parametrize("fused", [True, False])
def test_rdb_quant_close_to_f32(fused):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 16)).astype(np.float32))
    ref = ResidualDenseBlock(16, 8, fused=fused)
    qnt = ResidualDenseBlock(16, 8, fused=fused, quant=True)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = ref.apply({"params": params}, x)
    y_q = qnt.apply({"params": params}, x)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.01, rel


def test_generator_quant_psnr_and_scan():
    """End-to-end: int8-trunk BSRGAN output stays close to the f32 output
    (quantizing only the trunk confines the error), and the scanned-trunk
    variant takes the same path."""
    rng = np.random.default_rng(4)
    lr = jnp.asarray(rng.uniform(size=(1, 12, 12, 3)).astype(np.float32))
    kw = dict(channels=16, growth_channels=8, num_rrdb=2)
    ref = create_model("bsrgan_x4", **kw)
    params = ref.init(jax.random.PRNGKey(0), lr)["params"]
    y_ref = np.asarray(ref.apply({"params": params}, lr))

    y_q = np.asarray(create_model("bsrgan_x4", quant=True, **kw).apply({"params": params}, lr))
    mse = float(np.mean((y_q - y_ref) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40.0, psnr

    from srganfd_tpu.models.blocks import stack_trunk_params

    scan_params = stack_trunk_params(params, 2)
    y_qs = np.asarray(
        create_model("bsrgan_x4", quant=True, scan_blocks=True, **kw).apply(
            {"params": scan_params}, lr
        )
    )
    np.testing.assert_allclose(y_qs, y_q, atol=1e-6)


def test_infer_cli_quant_flag(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    img = (np.random.default_rng(5).uniform(0, 1, (10, 8, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "in.png"), img)
    out = tmp_path / "sr.png"
    monkeypatch.setattr(
        sys, "argv",
        ["infer", "--model-arch", "rrdbnet_x4", "--quant-int8",
         "--inputs-path", str(tmp_path / "in.png"), "--output-path", str(out)],
    )
    from srganfd_tpu.cli import infer as infer_cli

    infer_cli.main()
    assert cv2.imread(str(out)).shape == (40, 32, 3)


def test_infer_cli_quant_flag_ignored_without_trunk(tmp_path, monkeypatch, capsys):
    cv2 = pytest.importorskip("cv2")
    img = (np.random.default_rng(6).uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "in.png"), img)
    out = tmp_path / "sr.png"
    monkeypatch.setattr(
        sys, "argv",
        ["infer", "--model-arch", "gen_rpa2x", "--quant-int8",
         "--inputs-path", str(tmp_path / "in.png"), "--output-path", str(out)],
    )
    from srganfd_tpu.cli import infer as infer_cli

    infer_cli.main()
    assert "--quant-int8 ignored" in capsys.readouterr().out
    assert cv2.imread(str(out)).shape == (16, 16, 3)
