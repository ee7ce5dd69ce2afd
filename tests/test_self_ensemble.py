"""x8 geometric self-ensemble: group math, exactness on an equivariant
SR function, batched==loop equality on a real generator, CLI wiring."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.models import create_model
from srganfd_tpu.ops.self_ensemble import (
    DIHEDRAL,
    inverse_transform,
    self_ensemble,
    self_ensemble_batched,
    transform,
)


def test_dihedral_is_the_full_group_and_inverts():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(6, 4, 3)).astype(np.float32)
    seen = set()
    assert len(DIHEDRAL) == 8
    for k, f in DIHEDRAL:
        t = transform(img, k, f)
        np.testing.assert_array_equal(inverse_transform(t, k, f), img)
        seen.add(t.tobytes() + bytes([t.shape[0]]))
    # all 8 elements act distinctly on a generic image
    assert len(seen) == 8


def _nearest_x2(batch):
    """D4-equivariant SR: nearest-neighbor x2 upsample."""
    x = jnp.asarray(batch)
    return jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)


def test_ensemble_is_exact_for_equivariant_sr():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(5, 7, 3)).astype(np.float32)
    direct = np.asarray(_nearest_x2(img))
    out = self_ensemble(lambda im: _nearest_x2(im), img)
    np.testing.assert_allclose(out, direct, atol=1e-6)
    out_b = self_ensemble_batched(lambda p, z: _nearest_x2(z), None, img)
    np.testing.assert_allclose(out_b, direct, atol=1e-6)


def test_batched_matches_loop_on_generator():
    model = create_model("rrdbnet_x4", channels=8, growth_channels=4, num_blocks=1)
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(6, 9, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img)[None])["params"]
    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))

    loop = self_ensemble(
        lambda im: np.asarray(apply_fn(params, jnp.asarray(im)[None]))[0], img
    )
    batched = self_ensemble_batched(apply_fn, params, img)
    np.testing.assert_allclose(batched, loop, rtol=0, atol=1e-5)
    assert batched.shape == (24, 36, 3)
    # a conv net is not D4-equivariant: the ensemble must differ from the
    # single forward (otherwise the flag silently did nothing)
    direct = np.asarray(apply_fn(params, jnp.asarray(img)[None]))[0]
    assert np.abs(batched - direct).max() > 1e-6


def test_infer_cli_self_ensemble(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    from srganfd_tpu.cli import infer as infer_cli

    img = (np.random.default_rng(3).uniform(0, 1, (10, 8, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "in.png"), img)
    out = tmp_path / "sr.png"
    monkeypatch.setattr(
        sys, "argv",
        ["infer", "--model-arch", "rrdbnet_x4", "--self-ensemble",
         "--inputs-path", str(tmp_path / "in.png"), "--output-path", str(out)],
    )
    infer_cli.main()
    assert cv2.imread(str(out)).shape == (40, 32, 3)


def test_ensemble_composes_with_tiling_exactly():
    """self_ensemble around a tiled pipeline == direct output for a local
    (equivariant) model: both wrappers are exact."""
    from srganfd_tpu.ops.resize import upsample_nearest
    from srganfd_tpu.parallel.tiled_inference import tiled_sr

    rng = np.random.default_rng(4)
    img = rng.uniform(size=(20, 28, 3)).astype(np.float32)
    direct = np.asarray(upsample_nearest(jnp.asarray(img)[None], 2))[0]

    def run_one(im):
        return tiled_sr(
            lambda p, z: upsample_nearest(z, 2), None, im,
            upscale_factor=2, tile=16, overlap=4,
        )

    out = self_ensemble(run_one, img)
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_infer_cli_self_ensemble_tiled_runs(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    from srganfd_tpu.cli import infer as infer_cli

    img = (np.random.default_rng(5).uniform(0, 1, (12, 12, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "in.png"), img)
    out = tmp_path / "t.png"
    monkeypatch.setattr(
        sys, "argv",
        ["infer", "--model-arch", "rrdbnet_x4", "--self-ensemble",
         "--inputs-path", str(tmp_path / "in.png"), "--output-path", str(out),
         "--tile", "8", "--tile-overlap", "2"],
    )
    infer_cli.main()
    assert cv2.imread(str(out)).shape == (48, 48, 3)
