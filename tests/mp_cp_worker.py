"""Worker for tests/test_multiprocess.py: cross-process context-parallel
attention (ring or ulysses backend).

Runs the PRODUCTION cp serving path — BSRGANtrans over
``spatial_sharded_sr`` with ``ring_axis="data"`` — on a mesh spanning TWO
jax.distributed processes, so the backend's collectives cross the (Gloo)
process boundary:

- ``ring``: the bottleneck attention's K/V blocks rotate around the mesh
  with ``jax.lax.ppermute`` (``parallel/ring_attention.py``), every
  rotation step; also asserts the negative (shard-local attention
  visibly diverges).
- ``ulysses``: the two head-sharding ``jax.lax.all_to_all`` collectives
  and the halo-mask ``all_gather`` (``parallel/ulysses.py``; 4-device
  mesh — the 4-head cap).

Self-asserts the single-process tests' correctness property
(tests/test_ring_attention.py / tests/test_ulysses.py): the sharded
result tracks the unsharded model on a vertical-gradient frame. The
parent compares the two processes' replicated-output digests and pins
them against the single-process run.

Invoked as: python mp_cp_worker.py <coordinator_addr> <process_id> <num_processes> [ring|ulysses]
"""

import hashlib
import json
import os
import sys


def main() -> None:
    addr, proc, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    backend = sys.argv[4] if len(sys.argv) > 4 else "ring"
    if nprocs > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = addr
        os.environ["JAX_PROCESS_ID"] = str(proc)
        os.environ["JAX_NUM_PROCESSES"] = str(nprocs)

    import jax
    import numpy as np

    from srganfd_tpu.parallel import make_mesh, maybe_init_distributed

    if nprocs > 1:
        assert maybe_init_distributed(), "env triple should trigger initialization"
    expected_devices = 8 if backend == "ring" else 4  # ulysses: 4-head cap
    assert jax.process_count() == nprocs and jax.device_count() == expected_devices

    import jax.numpy as jnp

    from srganfd_tpu.models import create_model
    from srganfd_tpu.parallel.spatial import spatial_sharded_sr

    mesh = make_mesh()
    kw = dict(channels=8, growth_channels=4, num_rrdb=1)
    halo = 8
    base = create_model("bsrgantrans_x2", **kw)
    sharded = create_model(
        "bsrgantrans_x2", ring_axis="data", ring_halo=halo,
        cp_backend=backend, **kw,
    )

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

    got = run(sharded)
    b = 2 * halo
    err = float(np.abs(got[b:-b] - ref[b:-b]).max())
    assert err < 2e-3, err
    record = {
        "proc": proc,
        "digest": hashlib.sha256(np.ascontiguousarray(got).tobytes()).hexdigest(),
        "err": err,
    }
    if backend == "ring":
        # the negative: shard-local attention (no cp) visibly diverges
        got_local = run(base)
        err_local = float(np.abs(got_local[b:-b] - ref[b:-b]).max())
        assert err_local > 10 * err, (err_local, err)
        record["err_local"] = err_local

    print("RESULT " + json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
