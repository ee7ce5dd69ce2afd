"""Test the lane-padding hypothesis for the RDB trunk.

If XLA stores C=32/64 intermediates padded to 128 lanes, HBM traffic is
inflated 4x/2x and G fwd time should grow far slower than FLOPs as gc/ch
scale toward 128. Chained in-model G forwards (23-block scan trunk,
batch 16, 32px LR, bf16) at several widths; prints ms and ms normalized
by the model's conv MACs.

Run alone: python tools/lane_probe.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpu_profile import chain_time  # noqa: E402


def rdb_macs(ch, gc):
    return 9 * sum(
        (ch + gc * k) * (gc if k < 4 else ch) for k in range(5)
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(16, 32, 32, 3)).astype(np.float32))
    base_macs = rdb_macs(64, 32)
    out = {}
    for ch, gc in [(64, 32), (64, 64), (128, 64), (128, 128)]:
        model = create_model(
            "bsrgan_x4", channels=ch, growth_channels=gc, num_rrdb=23,
            scan_blocks=True, dtype=jnp.bfloat16,
        )
        params = model.init(jax.random.PRNGKey(0), lr)["params"]
        fwd = lambda z, m=model: (
            m.apply({"params": params}, z)[:, ::4, ::4, :] * 0.999 + z * 1e-6
        )
        rel = rdb_macs(ch, gc) / base_macs
        t = chain_time(fwd, lr, 8, f"G fwd ch{ch}/gc{gc} ({rel:.2f}x MACs)")
        if t:
            out[f"{ch}/{gc}"] = {"ms": t * 1e3, "rel_macs": rel, "ms_per_mac": t * 1e3 / rel}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
