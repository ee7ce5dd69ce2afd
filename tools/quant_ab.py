"""A/B the int8 PTQ serving path in-model on the real TPU.

Variants (generator forward only — quant is serving-only):
  f32   : default f32 params/compute
  bf16  : bf16 compute (the serving default, ``cli.infer --half``)
  q+bf16: int8 RDB trunk (ops/quant.py) inside a bf16 model
  q+f32 : int8 RDB trunk inside an f32 model

Times with loop-carried chains (the only timing the axon tunnel can't
fake — see tools/tpu_profile.py docstring). Serving shapes: batch-1
large frames, plus the batched shape for throughput context.

Run alone (one TPU process at a time):  python tools/quant_ab.py
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpu_profile import chain_time  # noqa: E402  (same dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="bsrgan_x4")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=23)
    ap.add_argument(
        "--shapes", default="1x128x128,1x256x256,16x32x32",
        help="comma list of NxHxW LR shapes",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    variants = {
        "f32": {"dtype": jnp.float32},
        "bf16": {"dtype": jnp.bfloat16},
        "q+bf16": {"dtype": jnp.bfloat16, "quant": True},
        "q+f32": {"dtype": jnp.float32, "quant": True},
    }
    upscale = 4 if args.arch.endswith("x4") else 2
    results = {}
    for shape_s in args.shapes.split(","):
        n, h, w = (int(v) for v in shape_s.split("x"))
        lr = jnp.asarray(rng.uniform(size=(n, h, w, 3)).astype(np.float32))
        params = None
        for name, kw in variants.items():
            model = create_model(
                args.arch, num_rrdb=args.blocks, scan_blocks=True, **kw
            )
            if params is None:
                params = model.init(jax.random.PRNGKey(0), lr)["params"]
            # carry stays LR-shaped: stride the SR output back down
            fwd = lambda z, m=model: (
                m.apply({"params": params}, z)[:, ::upscale, ::upscale, :]
                .astype(jnp.float32) * 0.999 + z * 1e-6
            )
            t = chain_time(fwd, lr, args.iters, f"G fwd {shape_s} [{name}]")
            results[f"{shape_s}/{name}"] = t and round(t * 1e3, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
