"""Worker for tests/test_multiprocess.py: cross-process Ulysses attention.

Runs the PRODUCTION context-parallel serving path — BSRGANtrans over
``spatial_sharded_sr`` with ``cp_backend="ulysses"`` — on a 4-device mesh
(the 4-head cap) spanning TWO jax.distributed processes, so the two
head-sharding ``jax.lax.all_to_all`` collectives (and the halo
``all_gather`` mask) cross the (Gloo) process boundary.

Self-asserts the single-process correctness property
(tests/test_ulysses.py::test_bsrgantrans_spatial_ulysses_serving): the
sharded result tracks the unsharded model. The parent compares the two
processes' replicated-output digests and pins them against the
single-process run.

Invoked as: python mp_ulysses_worker.py <coordinator_addr> <process_id> <num_processes>
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
    assert jax.process_count() == nprocs and jax.device_count() == 4

    import jax.numpy as jnp

    from srganfd_tpu.models import create_model
    from srganfd_tpu.parallel.spatial import spatial_sharded_sr

    mesh = make_mesh()
    kw = dict(channels=8, growth_channels=4, num_rrdb=1)
    halo = 8
    base = create_model("bsrgantrans_x2", **kw)
    uly = create_model(
        "bsrgantrans_x2", ring_axis="data", ring_halo=halo,
        cp_backend="ulysses", **kw,
    )

    rng = np.random.default_rng(5)
    img = (
        np.linspace(0, 1, 80, dtype=np.float32)[:, None, None]
        * np.ones((80, 16, 3), np.float32)
        + 0.1 * rng.uniform(size=(80, 16, 3)).astype(np.float32)
    ).clip(0, 1)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    ref = np.asarray(base.apply({"params": params}, jnp.asarray(img)[None]))[0]

    got = spatial_sharded_sr(
        lambda p, z: uly.apply({"params": p}, z),
        params, img, 2, mesh, halo=halo, row_multiple=2,
    )
    b = 2 * halo
    err = float(np.abs(got[b:-b] - ref[b:-b]).max())
    assert err < 2e-3, err

    print(
        "RESULT "
        + json.dumps(
            {
                "proc": proc,
                "digest": hashlib.sha256(np.ascontiguousarray(got).tobytes()).hexdigest(),
                "err": err,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
