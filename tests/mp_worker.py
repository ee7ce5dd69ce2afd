"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed run (4 virtual CPU devices each, Gloo collectives).

Runs the production multi-host path end-to-end: ``maybe_init_distributed``
(driven by the JAX_COORDINATOR_ADDRESS env triple, exactly like a CPU/GPU
cluster launch), a global 8-device ``data`` mesh, per-process batch shards
assembled with ``global_batch_from_host``, and two real GAN train steps.
Prints one JSON line with the loss metrics and a parameter checksum for
the parent test to compare against the single-process reference.

Invoked as: python mp_worker.py <coordinator_addr> <process_id> <num_processes>
(env must already force the CPU platform BEFORE jax import — the parent
sets PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS=cpu, and a device_count such
that num_processes * local_devices == 8). With <num_processes> = 1 the
same code produces the single-process reference in an identical numeric
environment (the pytest process itself enables x64, which perturbs
init/loss arithmetic enough to confound cross-process comparisons).
"""

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

    from srganfd_tpu.parallel import (
        global_batch_from_host,
        make_mesh,
        maybe_init_distributed,
        replicated_sharding,
    )

    if nprocs > 1:
        assert maybe_init_distributed(), "env triple should trigger initialization"
    else:
        assert not maybe_init_distributed()  # no env triple: stays a no-op
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 8 and jax.local_device_count() == 8 // nprocs

    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=16,
    )
    mesh = make_mesh()
    trainer = Trainer(cfg, steps_per_epoch=10)

    # identical global batch on both processes; each passes only ITS half
    gt = np.random.default_rng(0).uniform(size=(16, 16, 16, 3)).astype(np.float32)
    lr = gt[:, :: cfg.upscale_factor, :: cfg.upscale_factor, :]

    state = trainer.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    rep = replicated_sharding(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)

    per = 16 // nprocs
    mine = slice(proc * per, (proc + 1) * per)
    batch = global_batch_from_host({"gt": gt[mine], "lr": lr[mine]}, mesh)
    assert len(batch["gt"].sharding.device_set) == 8
    assert batch["gt"].shape[0] == 16  # global batch, not the local half

    # step-1 metrics are computed from identical init params + batch on
    # every path (tight comparison); the post-step-2 checksum carries the
    # cross-process psum's fp reduction order through two updates
    state, metrics = trainer.train_step(state, batch["gt"], batch["lr"])
    state, _ = trainer.train_step(state, batch["gt"], batch["lr"])

    def scalar(x) -> float:
        return float(np.asarray(jax.device_get(x.addressable_shards[0].data)))

    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(p)),
        out_shardings=rep,
    )(state.g_params)
    print(
        "RESULT "
        + json.dumps(
            {
                "proc": proc,
                "g_loss": scalar(metrics["g_loss"]),
                "d_loss": scalar(metrics["d_loss"]),
                "checksum": scalar(checksum),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
