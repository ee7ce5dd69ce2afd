"""parallel/prefetch + mesh helper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.parallel import make_mesh, prefetch_to_device, replicated_sharding
from srganfd_tpu.parallel.prefetch import CPUPrefetcher


def test_prefetch_to_device_preserves_order_and_moves():
    batches = [{"x": np.full((4, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_to_device_sharded(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    batches = [{"x": np.arange(16, dtype=np.float32).reshape(16, 1)} for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2, mesh=mesh))
    assert len(out) == 3
    assert len(out[0]["x"].sharding.device_set) == 8


def test_cpu_prefetcher_protocol():
    pf = CPUPrefetcher([1, 2, 3])
    assert pf.next() == 1
    assert pf.next() == 2
    pf.reset()
    assert pf.next() == 1
    pf.next(), pf.next()
    assert pf.next() is None


def test_mesh_shapes():
    mesh = make_mesh((2, -1), ("replica", "data"), devices=jax.devices()[:8])
    assert mesh.shape["replica"] == 2 and mesh.shape["data"] == 4
    with pytest.raises(ValueError):
        make_mesh((3,), devices=jax.devices()[:8])


def test_config_overrides():
    from srganfd_tpu.configs import get_config

    cfg = get_config("bsrgan", epochs=3, batch_size=2)
    assert cfg.epochs == 3 and cfg.batch_size == 2
    assert cfg.is_gan
    assert get_config("rrdbnet").is_gan is False
    with pytest.raises(KeyError):
        get_config("nope")


def test_hybrid_mesh_pseudo_slices(eight_devices):
    """2 pseudo-slices x 4 devices/slice on a (data, model) mesh: the
    model axis must stay inside one slice (contiguous device group), the
    data axis must cross slices."""
    from srganfd_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh((1, 4), (2, 1), ("data", "model"), devices=eight_devices)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    ids = np.array([[d.id for d in row] for row in mesh.devices])
    base = min(d.id for d in eight_devices)
    # model axis (row) = one contiguous slice; data axis crosses groups
    np.testing.assert_array_equal(ids - base, [[0, 1, 2, 3], [4, 5, 6, 7]])

    # -1 absorbs the per-slice device count
    mesh2 = make_hybrid_mesh((-1,), (2,), ("data",), devices=eight_devices)
    assert dict(mesh2.shape) == {"data": 8}

    with pytest.raises(ValueError):
        make_hybrid_mesh((1, 3), (2, 1), ("data", "model"), devices=eight_devices)


def test_hybrid_mesh_train_step_matches_flat(eight_devices):
    """One GAN step over the hybrid (dcn=2) mesh equals the flat-mesh
    step bit-for-bit (device assignment must not change numerics)."""
    from srganfd_tpu.configs import get_config
    from srganfd_tpu.parallel import make_hybrid_mesh, shard_batch
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=16,
    )
    rng = np.random.default_rng(0)
    gt = rng.uniform(size=(16, 16, 16, 3)).astype(np.float32)
    lr = gt[:, :: cfg.upscale_factor, :: cfg.upscale_factor, :]

    results = []
    for mesh in (
        make_mesh(devices=eight_devices),
        make_hybrid_mesh((-1,), (2,), devices=eight_devices),
    ):
        trainer = Trainer(cfg, steps_per_epoch=10)
        state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
        rep = replicated_sharding(mesh)
        state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
        batch = shard_batch({"gt": gt, "lr": lr}, mesh)
        state, metrics = trainer.train_step(state, batch["gt"], batch["lr"])
        leaf = jax.tree_util.tree_leaves(state.g_params)[0]
        results.append((float(metrics["g_loss"]), np.asarray(leaf)))

    assert results[0][0] == results[1][0]
    np.testing.assert_array_equal(results[0][1], results[1][1])


def test_maybe_init_distributed_noop(monkeypatch):
    """Without the env triggers it must do nothing (single-process runs
    and the CPU test mesh must never try to reach a coordinator)."""
    from srganfd_tpu.parallel import maybe_init_distributed

    monkeypatch.delenv("SRGANFD_DISTRIBUTED", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_init_distributed() is False


def test_flag_consensus_one_poll_delay(eight_devices):
    """FlagConsensus contract: each poll returns the consensus (max) of
    the PREVIOUS round — the delay that keeps the hot loop from
    host-syncing on a fresh collective. Single-process: the max spans
    the local 8-device mesh, so a raised flag must appear exactly one
    poll later and stay visible while raised."""
    from srganfd_tpu.parallel import FlagConsensus

    c = FlagConsensus()
    assert c.poll(0) == 0  # first poll: nothing pending
    assert c.poll(15) == 0  # flag raised now, visible next poll
    assert c.poll(15) == 15
    assert c.poll(0) == 15  # last raised round still draining
    assert c.poll(0) == 0


def test_flag_consensus_barrier_single_process(eight_devices):
    """barrier() must be callable (and a no-op) in a single process so
    the preempt exit path needs no process-count branching at call sites."""
    from srganfd_tpu.parallel import FlagConsensus

    FlagConsensus().barrier("srganfd:test_barrier")
