"""Checkpoint save/restore round-trip, including the shape-filtered merge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srganfd_tpu.configs import get_config
from srganfd_tpu.train import checkpoint as ckpt
from srganfd_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained_state():
    cfg = get_config("rrdbnet").replace(
        compute_dtype="float32", g_kwargs={"channels": 8, "growth_channels": 4, "num_blocks": 1}
    )
    tr = Trainer(cfg, steps_per_epoch=4)
    gt = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 16, 16, 3)).astype(np.float32))
    lr = gt[:, ::4, ::4, :]
    state = tr.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    state, _ = tr.train_step(state, gt, lr)
    return tr, state


def test_roundtrip(trained_state, tmp_path):
    tr, state = trained_state
    ckpt.save_checkpoint(str(tmp_path), state, epoch=3, best_metrics={"psnr": 31.5}, is_best=True)
    payload = ckpt.load_checkpoint(str(tmp_path / "ckpt_best"), template=state)
    assert payload["epoch"] == 3
    assert abs(payload["best_metrics"]["psnr"] - 31.5) < 1e-9
    got = jax.tree_util.tree_leaves(payload["state"].g_params)
    want = jax.tree_util.tree_leaves(state.g_params)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # last also exists
    assert (tmp_path / "ckpt_last").exists()
    assert (tmp_path / "ckpt_last.meta.json").exists()


def test_restore_into_shape_filter():
    cur = {"a": np.zeros((2, 2)), "b": np.zeros(3)}
    loaded = {"a": np.ones((2, 2)), "b": np.ones(4)}  # b mismatched
    merged = ckpt.restore_into(cur, loaded)
    np.testing.assert_array_equal(merged["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"], np.zeros(3))


def test_interrupted_save_preserves_previous_snapshot(trained_state, tmp_path, monkeypatch):
    """A kill/failure mid-save must never destroy the previous best/last
    (observed on hardware: SIGTERM during an epoch-end best save deleted
    ckpt_best and left a stale orbax tmp). Saves stage to <target>.new and
    swap only when complete."""
    import orbax.checkpoint as ocp

    tr, state = trained_state
    ckpt.save_checkpoint(str(tmp_path), state, epoch=1, best_metrics={"psnr": 30.0}, is_best=True)

    def boom(self, path, *a, **kw):
        # model orbax's force=True: the destination is cleared before the
        # write, then the process dies mid-write. Under the staged-swap
        # scheme `path` is <target>.new, so real targets must survive.
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        raise RuntimeError("simulated kill mid-write")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        ckpt.save_checkpoint(
            str(tmp_path), state, epoch=2, best_metrics={"psnr": 31.0}, is_best=True
        )
    monkeypatch.undo()

    # both snapshots still load, with the epoch-1 meta (state+meta consistent)
    for name in ("ckpt_best", "ckpt_last"):
        payload = ckpt.load_checkpoint(str(tmp_path / name), template=state)
        assert payload["epoch"] == 1
        assert abs(payload["best_metrics"]["psnr"] - 30.0) < 1e-9

    # a later good save sweeps any staging leftovers and swaps cleanly
    ckpt.save_checkpoint(str(tmp_path), state, epoch=2, best_metrics={"psnr": 31.0}, is_best=True)
    assert ckpt.load_checkpoint(str(tmp_path / "ckpt_best"), template=state)["epoch"] == 2
    leftovers = [p for p in tmp_path.iterdir() if p.name.endswith((".new", ".orbax-checkpoint-tmp"))]
    assert not leftovers
