"""Worker for tests/test_multiprocess.py: cross-process ppermute.

Runs the PRODUCTION spatially-sharded inference path
(``parallel/spatial.py``: shard_map + ``jax.lax.ppermute`` halo exchange
+ replicated-output all-gather) on a mesh whose ``data`` axis spans TWO
jax.distributed processes, so the boundary halos between shard 3 and
shard 4 cross the (Gloo) process boundary — the first non-psum collective
ever executed across real processes in this suite.

Correctness is asserted IN the worker: the sharded SR of a conv model
(receptive radius 1, halo 4) must match the unsharded forward on every
interior row, exactly as the single-process test
(tests/test_spatial_shard.py::test_spatial_shard_conv_model) pins it.
The parent additionally compares the two processes' full-output digests
(both hold the replicated result) and pins them against the
single-process run of this same worker.

Invoked as: python mp_sp_worker.py <coordinator_addr> <process_id> <num_processes>
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

    import flax.linen as nn
    import jax.numpy as jnp

    from srganfd_tpu.models.blocks import Conv
    from srganfd_tpu.ops.resize import upsample_nearest
    from srganfd_tpu.parallel.spatial import spatial_sharded_sr

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(Conv(8)(x), 0.2)
            x = upsample_nearest(x, 2)
            return Conv(3)(x)

    mesh = make_mesh()
    model = Tiny()
    img = np.random.default_rng(1).uniform(size=(40, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    fn = lambda p, z: model.apply({"params": p}, z)

    got = spatial_sharded_sr(fn, params, img, 2, mesh, halo=4)
    full = np.asarray(fn(params, jnp.asarray(img)[None]))[0]
    assert got.shape == full.shape, (got.shape, full.shape)
    border = 4  # reflect-vs-zero context at the true image edge only
    np.testing.assert_allclose(got[border:-border], full[border:-border], atol=1e-5)

    print(
        "RESULT "
        + json.dumps(
            {
                "proc": proc,
                "digest": hashlib.sha256(np.ascontiguousarray(got).tobytes()).hexdigest(),
                "sum": float(np.float64(np.abs(got)).sum()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
