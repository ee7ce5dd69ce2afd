"""Worker for tests/test_multiprocess.py: one process of a 2-process
``run_train`` — the PRODUCTION training CLI path under jax.distributed
(per-process dataset sharding, ``global_batch_from_host`` assembly,
process-0-only tracker/checkpoint writes).

Invoked as:
    python mp_train_worker.py <addr> <proc> <train_dir> <valid_dir> <workdir> [steps]
(env must force the CPU platform with 4 local devices BEFORE jax import.)
"""

import json
import os
import sys


def main() -> None:
    addr, proc, train_dir, valid_dir, workdir = sys.argv[1:6]
    steps = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    os.environ["JAX_COORDINATOR_ADDRESS"] = addr
    os.environ["JAX_PROCESS_ID"] = proc
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ.setdefault("SRGANFD_NATIVE_LOADER", "0")
    os.chdir(workdir)  # shared: process 0 writes results/ + samples/ here

    from srganfd_tpu.cli.train import run_train
    from srganfd_tpu.configs import get_config

    cfg = get_config(
        "bsrgan",
        train_gt_images_dir=train_dir,
        valid_gt_images_dir=valid_dir,
        epochs=1,
        batch_size=4,  # per-process; global batch = 8 over the 8-device mesh
        gt_image_size=16,
        crop_image_size=24,
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 1},
        content_weight=(),
    )
    out = run_train(cfg, steps_per_epoch=steps)
    print(
        "RESULT "
        + json.dumps({"proc": int(proc), "best_psnr": float(out["best_psnr"])}),
        flush=True,
    )


if __name__ == "__main__":
    main()
