"""Export a trained generator for serving.

Production-deployment path the reference lacks: serializes the jitted
generator to a portable StableHLO artifact via ``jax.export`` (loadable
from any JAX process — or other runtimes that consume StableHLO —
without the model source), together with a params .npz.

Usage:
    python -m srganfd_tpu.cli.export --model-arch bsrgan_x2 \
        --weights results/BSRGAN_x2/ckpt_best \
        --input-size 128 --batch 1 --out export/bsrgan_x2
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description="export generator to StableHLO")
    ap.add_argument("--model-arch", dest="arch", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--input-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from srganfd_tpu.models import create_model
    from srganfd_tpu.train import checkpoint as ckpt

    model = create_model(args.arch)
    shape = (args.batch, args.input_size, args.input_size, 3)
    if args.weights:
        payload = ckpt.load_checkpoint(args.weights)
        params = payload["state"]["ema_g_params"]
    else:
        print("! no --weights: exporting randomly initialized generator")
        params = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))["params"]

    def serve(params, lr):
        return model.apply({"params": params}, lr)

    exported = jax.export.export(jax.jit(serve))(
        jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.float32), params),
        jax.ShapeDtypeStruct(shape, jnp.float32),
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    with open(args.out + ".stablehlo", "wb") as f:
        f.write(exported.serialize())

    flat = {}

    def visit(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                visit(v, name)
            else:
                flat[name] = np.asarray(v)

    visit(params)
    np.savez(args.out + ".params.npz", **flat)
    print(
        f"exported {args.arch} for input {shape} ->\n"
        f"  {args.out}.stablehlo ({os.path.getsize(args.out + '.stablehlo')} bytes)\n"
        f"  {args.out}.params.npz ({len(flat)} arrays)"
    )


if __name__ == "__main__":
    main()
