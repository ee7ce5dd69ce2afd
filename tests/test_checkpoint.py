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


def test_sweep_recovers_mid_swap_states(trained_state, tmp_path):
    """Every crash window of the rename-swap is recoverable by the next
    save's sweep: a complete ``.new`` (with meta) is promoted when the
    target is missing; a ``.old`` is restored when no staging superseded
    it; an orphan ``.new.meta.json`` is adopted by its promoted snapshot;
    a meta-less ``.new`` is discarded."""
    import os
    import shutil

    tr, state = trained_state
    d = str(tmp_path)
    ckpt.save_checkpoint(d, state, epoch=1, best_metrics={"psnr": 30.0}, is_best=False)

    # crash between "rename target aside" and "promote staging":
    # base missing, complete .new (with meta) + .old both present -> the
    # NEWER .new must win
    last = os.path.join(d, "ckpt_last")
    shutil.copytree(last, last + ".new")
    shutil.copy(last + ".meta.json", last + ".new.meta.json")
    with open(last + ".new.meta.json", "w") as f:
        f.write('{"epoch": 7, "best_metrics": {}}')
    os.rename(last, last + ".old")
    os.replace(last + ".meta.json", last + ".old.meta.json")
    ckpt._sweep_incomplete(d)
    assert ckpt.load_checkpoint(last, template=state)["epoch"] == 7
    assert not os.path.exists(last + ".new") and not os.path.exists(last + ".old")

    # crash just after "rename target aside" with no complete staging:
    # the .old must be restored
    os.rename(last, last + ".old")
    os.replace(last + ".meta.json", last + ".old.meta.json")
    os.makedirs(last + ".new")  # meta-less staging: incomplete, must be dropped
    ckpt._sweep_incomplete(d)
    assert ckpt.load_checkpoint(last, template=state)["epoch"] == 7
    assert not os.path.exists(last + ".new")

    # crash between promoting the state dir and its meta sidecar:
    # the orphan .new.meta.json belongs to the promoted snapshot
    os.remove(last + ".meta.json")
    with open(last + ".new.meta.json", "w") as f:
        f.write('{"epoch": 9, "best_metrics": {}}')
    ckpt._sweep_incomplete(d)
    assert ckpt.load_checkpoint(last, template=state)["epoch"] == 9
    assert not os.path.exists(last + ".new.meta.json")


def test_async_writer_matches_sync(trained_state, tmp_path):
    """AsyncCheckpointWriter writes bit-identical snapshots through the
    same staging/swap protocol, and save() captures the state at call
    time (later mutation of the live state must not leak into a queued
    write)."""
    tr, state = trained_state
    sync_dir, async_dir = tmp_path / "sync", tmp_path / "async"
    ckpt.save_checkpoint(str(sync_dir), state, epoch=2, best_metrics={"psnr": 30.0}, is_best=True)
    with ckpt.AsyncCheckpointWriter() as w:
        w.save(str(async_dir), state, epoch=2, best_metrics={"psnr": 30.0}, is_best=True)
        w.wait()
        for name in ("ckpt_best", "ckpt_last"):
            a = ckpt.load_checkpoint(str(sync_dir / name), template=state)
            b = ckpt.load_checkpoint(str(async_dir / name), template=state)
            assert a["epoch"] == b["epoch"] == 2
            for x, y in zip(
                jax.tree_util.tree_leaves(a["state"]), jax.tree_util.tree_leaves(b["state"])
            ):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        # snapshot-at-call-time: queue a save, then train the live state on
        g1 = jax.tree_util.tree_leaves(state.g_params)
        w.save(str(async_dir), state, epoch=3, best_metrics={}, is_best=False)
        gt = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 16, 16, 3)).astype(np.float32))
        tr.train_step(state, gt, gt[:, ::4, ::4, :])
        w.wait()
        b = ckpt.load_checkpoint(str(async_dir / "ckpt_last"), template=state)
        assert b["epoch"] == 3
        for x, y in zip(jax.tree_util.tree_leaves(b["state"].g_params), g1):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_writer_last_save_wins_and_errors_surface(trained_state, tmp_path):
    """Queued saves to the same target land in order (the final on-disk
    snapshot is the last queued), and a failed write re-raises on wait()
    instead of vanishing on the worker thread."""
    tr, state = trained_state
    d = tmp_path / "ordered"
    with ckpt.AsyncCheckpointWriter() as w:
        for e in range(3):
            w.save(str(d), state, epoch=e, best_metrics={}, is_best=False, step=e * 10)
        w.wait()
        meta = ckpt.load_checkpoint(str(d / "ckpt_last"), template=state)
        assert meta["epoch"] == 2 and meta["step"] == 20

    w = ckpt.AsyncCheckpointWriter()
    blocker = tmp_path / "blocked"
    blocker.write_text("not a directory")  # makedirs will fail
    w.save(str(blocker / "sub"), state, epoch=0, best_metrics={}, is_best=False)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    w.close()  # error already consumed; close is clean


def test_mesh_elastic_restore(eight_devices, tmp_path):
    """Checkpoints are mesh-elastic: a snapshot taken from state living on
    an 8-device mesh (replicated params, sharded batches) restores
    bit-identically into runs on a DIFFERENT device count (4-device mesh
    and single device) and training continues there — preemptible jobs
    may come back on a different slice shape."""
    from srganfd_tpu.parallel import make_mesh, replicated_sharding, shard_batch

    cfg = get_config("bsrgan").replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=16,
    )
    tr = Trainer(cfg, steps_per_epoch=4)
    gt = np.random.default_rng(0).uniform(size=(8, 16, 16, 3)).astype(np.float32)
    lr = gt[:, ::2, ::2, :]

    mesh8 = make_mesh(devices=eight_devices)
    state = tr.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated_sharding(mesh8)), state
    )
    b8 = shard_batch({"gt": gt, "lr": lr}, mesh8)
    state, _ = tr.train_step(state, b8["gt"], b8["lr"])
    assert len(jax.tree_util.tree_leaves(state.g_params)[0].sharding.device_set) == 8
    ckpt.save_checkpoint(str(tmp_path), state, epoch=0, best_metrics={}, is_best=False)

    saved = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: np.asarray(x), state.g_params)
    )

    for devs in (eight_devices[:4], eight_devices[:1]):
        mesh = make_mesh(devices=devs)
        payload = ckpt.load_checkpoint(str(tmp_path / "ckpt_last"), template=state)
        restored = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated_sharding(mesh)), payload["state"]
        )
        for a, b in zip(jax.tree_util.tree_leaves(restored.g_params), saved):
            np.testing.assert_array_equal(np.asarray(a), b)
        bn = shard_batch({"gt": gt, "lr": lr}, mesh)
        cont, metrics = tr.train_step(restored, bn["gt"], bn["lr"])
        assert np.isfinite(float(metrics["g_loss"]))
        leaf = jax.tree_util.tree_leaves(cont.g_params)[0]
        assert len(leaf.sharding.device_set) == len(devs)
