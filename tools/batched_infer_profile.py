"""Root-cause the batched-inference 'regression' (VERDICT r2 weak #2).

BENCH_HW r2: bsrgan_x4 on 256px LR — batch 1 = 56.3 ms (1.15 MP/s input)
but batch 4 = 291.9 ms (0.90 MP/s), i.e. batching LOSES 23% per frame.
Note however batch-1 512px (the same 1.05 MP input) also measured 0.92
MP/s — so the suspect is a throughput wall shared by all MP-scale
workloads, not batching per se.

This experiment separates COMPUTE from OUTPUT TRANSFER for each config:

- "fetch": the bench-style loop closed by a full device->host output pull
  (what BENCH_HW measured) — includes the axon tunnel's transfer of the
  (N, 4H, 4W, 3) SR frames;
- "reduce": the identical forward whose output is summed to ONE scalar
  on-device inside a loop-carried chain (4 bytes cross the tunnel) —
  pure compute+dispatch.

If "reduce" scales ~linearly with pixels while "fetch" grows superlinear,
the regression is tunnel output bandwidth (an artifact of this
remote-execution link, not of the TPU program) and serving guidance
should say so; if "reduce" itself regresses, it's an XLA layout/HBM
problem worth chasing.

Run on the real chip: python tools/batched_infer_profile.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    model = create_model("bsrgan_x4", dtype=jnp.bfloat16, scan_blocks=True)
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]

    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))

    configs = [(1, 128), (1, 256), (4, 256), (1, 512), (2, 512), (8, 256)]
    results = []
    for batch, lr_px in configs:
        x = jnp.asarray(rng.uniform(size=(batch, lr_px, lr_px, 3)).astype(np.float32))
        iters = 6
        # distinct device-resident inputs per iteration: the tunnel
        # memoizes repeated identical (executable, args) dispatches
        # (docs/tpu_performance.md), which would fake the compute
        xs = [x + jnp.float32(i) * 1e-6 for i in range(iters)]
        for xi in xs:
            xi.block_until_ready()

        # --- fetch mode: full output crosses the tunnel every iteration
        np.asarray(apply_fn(params, x))  # warm compile + first transfer
        t0 = time.perf_counter()
        for xi in xs:
            np.asarray(apply_fn(params, xi))
        t_fetch = (time.perf_counter() - t0) / iters * 1e3

        # --- reduce mode: loop-carried scalar chain, 4 bytes fetched
        @jax.jit
        def reduced(p, z, carry):
            y = model.apply({"params": p}, z + carry * 1e-12)
            return jnp.sum(y.astype(jnp.float32))

        carry = jnp.float32(0)
        carry = reduced(params, x, carry)
        float(carry)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = reduced(params, x, carry)
        t_red = float(carry) * 0 + (time.perf_counter() - t0)  # fetch closes chain
        t_red = t_red / iters * 1e3

        mp = batch * lr_px * lr_px / 1e6
        out_mb = batch * (4 * lr_px) ** 2 * 3 * 4 / 1e6
        row = {
            "batch": batch,
            "lr_px": lr_px,
            "input_mp": round(mp, 3),
            "output_mb_f32": round(out_mb, 1),
            "fetch_ms": round(t_fetch, 2),
            "reduce_ms": round(t_red, 2),
            "transfer_ms_est": round(t_fetch - t_red, 2),
            "fetch_mp_s": round(mp / (t_fetch / 1e3), 3),
            "reduce_mp_s": round(mp / (t_red / 1e3), 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # headline comparison the VERDICT asked about
    b1 = next(r for r in results if (r["batch"], r["lr_px"]) == (1, 256))
    b4 = next(r for r in results if (r["batch"], r["lr_px"]) == (4, 256))
    print(
        json.dumps(
            {
                "summary": "batch4_vs_4x_batch1_256px",
                "fetch_ratio": round(b4["fetch_ms"] / (4 * b1["fetch_ms"]), 3),
                "reduce_ratio": round(b4["reduce_ms"] / (4 * b1["reduce_ms"]), 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
