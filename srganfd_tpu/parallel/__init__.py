"""Device mesh, shardings and host->HBM prefetch — the framework's
"communication backend" (SURVEY.md §2.9): XLA collectives over ICI ride
the shardings declared here; there is no hand-written NCCL/MPI analog."""

from srganfd_tpu.parallel.mesh import (  # noqa: F401
    FlagConsensus,
    make_hybrid_mesh,
    make_mesh,
    maybe_init_distributed,
    batch_sharding,
    global_batch_from_host,
    replicated_sharding,
    shard_batch,
)
from srganfd_tpu.parallel.prefetch import prefetch_to_device  # noqa: F401
