"""Inference CLI: single-image parity path and the sequence (directory)
serving mode — shape bucketing, tail padding, batched-equals-single
outputs."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from srganfd_tpu.cli import infer as infer_cli
from srganfd_tpu.models import create_model


def _write(path, h, w, seed):
    img = (np.random.default_rng(seed).uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(path), img)


def test_infer_cli_single_image(tmp_path, monkeypatch):
    _write(tmp_path / "in.png", 12, 10, 0)
    out = tmp_path / "sr.png"
    monkeypatch.setattr(
        sys, "argv",
        ["infer", "--model-arch", "rrdbnet_x4",
         "--inputs-path", str(tmp_path / "in.png"), "--output-path", str(out)],
    )
    infer_cli.main()
    sr = cv2.imread(str(out))
    assert sr.shape == (48, 40, 3)


def test_infer_sequence_mode_buckets_and_matches_single(tmp_path):
    frames = tmp_path / "frames"
    frames.mkdir()
    # two shape buckets; 3 frames of one size forces a padded tail at batch 2
    for i in range(3):
        _write(frames / f"a{i}.png", 12, 10, i)
    for i in range(2):
        _write(frames / f"b{i}.png", 8, 8, 10 + i)
    out_dir = tmp_path / "sr"

    model = create_model("rrdbnet_x4", channels=8, growth_channels=4, num_blocks=1)
    x0 = jnp.zeros((1, 12, 10, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))

    paths = sorted(str(p) for p in frames.iterdir())
    stats = infer_cli.run_sequence(apply_fn, params, paths, str(out_dir), batch=2)
    assert stats == {"frames": 5, "buckets": 2}
    assert sorted(os.listdir(out_dir)) == ["a0.png", "a1.png", "a2.png", "b0.png", "b1.png"]

    # batched output == single-image output (incl. a padded-tail frame)
    for name in ("a2.png", "b1.png"):
        from srganfd_tpu.data.datasets import load_image_rgb

        single = np.asarray(apply_fn(params, jnp.asarray(load_image_rgb(str(frames / name)))[None]))[0]
        single8 = np.clip(single * 255.0, 0, 255).astype(np.uint8)
        got = cv2.imread(str(out_dir / name))[..., ::-1]
        np.testing.assert_array_equal(got, single8)


def test_infer_sequence_data_shard_matches_unsharded(tmp_path):
    """--data-shard: frame batches sharded over the data mesh axis produce
    byte-identical PNGs to the unsharded sequence path (multi-chip
    sequence serving is a pure layout change)."""
    from srganfd_tpu.parallel import make_mesh

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(5):  # ragged tail at batch 4
        _write(frames / f"f{i}.png", 12, 10, i)

    model = create_model("rrdbnet_x4", channels=8, growth_channels=4, num_blocks=1)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 12, 10, 3)))["params"]
    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))
    paths = sorted(str(p) for p in frames.iterdir())

    plain_dir, shard_dir = tmp_path / "plain", tmp_path / "shard"
    infer_cli.run_sequence(apply_fn, params, paths, str(plain_dir), batch=4)
    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    stats = infer_cli.run_sequence(
        apply_fn, params, paths, str(shard_dir), batch=4, mesh=mesh
    )
    assert stats["frames"] == 5
    for name in sorted(os.listdir(plain_dir)):
        a = cv2.imread(str(plain_dir / name))
        b = cv2.imread(str(shard_dir / name))
        np.testing.assert_array_equal(a, b)

    # indivisible batch is a clear error, not silent misbehavior
    with pytest.raises(SystemExit, match="not divisible"):
        infer_cli.run_sequence(
            apply_fn, params, paths, str(tmp_path / "x"), batch=3, mesh=mesh
        )
