"""A/B the v2 Pallas fused-RDB kernel against XLA, in-model on hardware.

Run alone: python tools/pallas_v2_ab.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpu_profile import chain_time  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(16, 32, 32, 3)).astype(np.float32))

    results = {}
    params = None
    for name, kw in {"xla": {}, "pallas_v2": {"pallas": 2}}.items():
        model = create_model(
            "bsrgan_x4", num_rrdb=23, scan_blocks=True, dtype=jnp.bfloat16, **kw
        )
        if params is None:
            params = model.init(jax.random.PRNGKey(0), lr)["params"]
        fwd = lambda z, m=model: (
            m.apply({"params": params}, z)[:, ::4, ::4, :] * 0.999 + z * 1e-6
        )
        t = chain_time(fwd, lr, 16, f"G fwd [{name}]")
        results[name] = t and t * 1e3

    if all(results.values()):
        # numerics sanity on-device
        a = create_model("bsrgan_x4", num_rrdb=23, scan_blocks=True, dtype=jnp.bfloat16)
        b = create_model(
            "bsrgan_x4", num_rrdb=23, scan_blocks=True, dtype=jnp.bfloat16, pallas=2
        )
        da = np.asarray(a.apply({"params": params}, lr), np.float32)
        db = np.asarray(b.apply({"params": params}, lr), np.float32)
        results["max_abs_diff"] = float(np.abs(da - db).max())
        print(f"on-device max|diff| = {results['max_abs_diff']:.2e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
