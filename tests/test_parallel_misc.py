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
