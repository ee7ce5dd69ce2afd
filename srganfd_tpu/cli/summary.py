"""Model summary: parameter counts per module.

Parity nicety: ``A-ESRGAN/train_aesrgan.py`` prints a torchsummary model
summary; this is the Flax equivalent.

Usage:
    python -m srganfd_tpu.cli.summary --arch bsrgan_x4 [--input-size 32]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description="parameter summary for an arch")
    ap.add_argument("--arch", required=True)
    ap.add_argument("--input-size", type=int, default=32)
    ap.add_argument("--channels", type=int, default=None)
    args = ap.parse_args()

    from srganfd_tpu.models import create_model

    kwargs = {}
    if args.channels:
        kwargs["channels"] = args.channels
    model = create_model(args.arch, **kwargs)
    x = jnp.zeros((1, args.input_size, args.input_size, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))

    rows = []
    total = 0
    for top, sub in variables["params"].items():
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(sub))
        rows.append((top, n))
        total += n
    width = max(len(r[0]) for r in rows)
    print(f"{args.arch} @ {args.input_size}px input")
    for name, n in rows:
        print(f"  {name:<{width}}  {n:>12,}")
    print(f"  {'TOTAL':<{width}}  {total:>12,}  ({total * 4 / 1e6:.1f} MB f32)")
    other = [k for k in variables if k != "params"]
    if other:
        print(f"  mutable collections: {other}")


if __name__ == "__main__":
    main()
