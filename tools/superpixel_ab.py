"""A/B the RDB conv dataflows in-model on the real TPU.

Variants (identical numerics, proven by tests/test_fused_rdb.py):
  base   : fused regrouped-by-source convs (round-1 default)
  fsp    : fused + superpixel (wide convs also 2x2-feature-packed)
  sp     : literal 5-conv chain + superpixel (N = 4*32 = 128 full lanes)
  lit    : literal 5-conv chain (the reference dataflow)

Times G forward and G fwd+bwd with loop-carried chains (the only timing
the axon tunnel can't fake — see tools/tpu_profile.py docstring).

Run alone (one TPU process at a time):  python tools/superpixel_ab.py
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=23)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(
        rng.uniform(size=(args.batch, args.lr_size, args.lr_size, 3)).astype(np.float32)
    )

    variants = {
        "base": {},
        "fsp": {"superpixel": True},
        "sp": {"rdb_fused": False, "superpixel": True},
        "lit": {"rdb_fused": False},
    }
    results = {}
    params = None
    for name, kw in variants.items():
        model = create_model(
            "bsrgan_x4", num_rrdb=args.blocks, scan_blocks=True,
            dtype=jnp.bfloat16, **kw,
        )
        if params is None:
            params = model.init(jax.random.PRNGKey(0), lr)["params"]

        # carry stays LR-shaped: stride the SR output back down
        fwd = lambda z, m=model: (
            m.apply({"params": params}, z)[:, ::4, ::4, :] * 0.999 + z * 1e-6
        )
        t_f = chain_time(fwd, lr, args.iters, f"G fwd  [{name}]")

        def gstep(p, m=model):
            g = jax.grad(lambda pp: jnp.abs(m.apply({"params": pp}, lr)).mean())(p)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

        t_b = chain_time(gstep, params, args.iters, f"G f+b  [{name}]")
        results[name] = {"fwd_ms": t_f and t_f * 1e3, "fwdbwd_ms": t_b and t_b * 1e3}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
