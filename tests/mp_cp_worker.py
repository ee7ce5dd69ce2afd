"""Worker for tests/test_multiprocess.py: cross-process ring attention.

Runs the PRODUCTION context-parallel serving path — BSRGANtrans over
``spatial_sharded_sr`` with ``ring_axis="data"``, i.e. the bottleneck
attention's K/V blocks rotating around the mesh with ``jax.lax.ppermute``
(``parallel/ring_attention.py``) — on a mesh spanning TWO jax.distributed
processes, so both the sp halos AND the cp K/V ring cross the (Gloo)
process boundary every rotation step.

Self-asserts the single-process test's correctness property
(tests/test_ring_attention.py::test_bsrgantrans_spatial_ring_serving):
with ring attention the sharded result tracks the unsharded model on a
vertical-gradient frame; shard-local attention visibly diverges. The
parent compares the two processes' replicated-output digests and pins
them against the single-process run.

Invoked as: python mp_cp_worker.py <coordinator_addr> <process_id> <num_processes>
"""

import hashlib
import json
import os
import sys


def main() -> None:
    addr, proc, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    if nprocs > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = addr
        os.environ["JAX_PROCESS_ID"] = str(proc)
        os.environ["JAX_NUM_PROCESSES"] = str(nprocs)

    import jax
    import numpy as np

    from srganfd_tpu.parallel import make_mesh, maybe_init_distributed

    if nprocs > 1:
        assert maybe_init_distributed(), "env triple should trigger initialization"
    assert jax.process_count() == nprocs and jax.device_count() == 8

    import jax.numpy as jnp

    from srganfd_tpu.models import create_model
    from srganfd_tpu.parallel.spatial import spatial_sharded_sr

    mesh = make_mesh()
    kw = dict(channels=8, growth_channels=4, num_rrdb=1)
    halo = 8
    base = create_model("bsrgantrans_x2", **kw)
    ring = create_model("bsrgantrans_x2", ring_axis="data", ring_halo=halo, **kw)

    rng = np.random.default_rng(3)
    img = (
        np.linspace(0, 1, 80, dtype=np.float32)[:, None, None]
        * np.ones((80, 16, 3), np.float32)
        + 0.1 * rng.uniform(size=(80, 16, 3)).astype(np.float32)
    ).clip(0, 1)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    ref = np.asarray(base.apply({"params": params}, jnp.asarray(img)[None]))[0]

    def run(model):
        return spatial_sharded_sr(
            lambda p, z: model.apply({"params": p}, z),
            params, img, 2, mesh, halo=halo, row_multiple=2,
        )

    got_ring = run(ring)
    got_local = run(base)
    b = 2 * halo
    err_ring = float(np.abs(got_ring[b:-b] - ref[b:-b]).max())
    err_local = float(np.abs(got_local[b:-b] - ref[b:-b]).max())
    assert err_ring < 2e-3, err_ring
    assert err_local > 10 * err_ring, (err_local, err_ring)

    print(
        "RESULT "
        + json.dumps(
            {
                "proc": proc,
                "digest": hashlib.sha256(np.ascontiguousarray(got_ring).tobytes()).hexdigest(),
                "err_ring": err_ring,
                "err_local": err_local,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
