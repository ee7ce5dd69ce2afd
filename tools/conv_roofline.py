"""Measure XLA:TPU conv efficiency across shapes — the written roofline
for why the 23-RRDB trunk runs where it runs (VERDICT r1 weak #2).

Probes (all loop-carried chains, see tools/tpu_profile.py):
  ideal    : 3x3 conv at MXU-friendly C=256->256, 32x32 spatial
  wide     : C=512->512 at 16x16 (big-K big-N reference point)
  trunk0   : the RDB's first conv 64->192 (fused-regroup shape)
  trunk32  : a bare 64->32 conv (the narrow-N shape)
  gfwd16/32: model fwd in bf16 vs f32 (MXU-bound => ~2x apart;
             memory/layout-bound => similar)

Run alone: python tools/conv_roofline.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpu_profile import chain_time  # noqa: E402


def conv_probe(name, batch, hw, cin, cout, dtype, iters=64):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, cin)).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.02).astype(dtype)
    kb = jnp.asarray(rng.normal(size=(3, 3, cout, cin)).astype(np.float32) * 0.02).astype(dtype)

    def body(z):
        y = jax.lax.conv_general_dilated(
            z, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        # second conv back to cin so the carry chains; counts as 2 convs
        return jax.lax.conv_general_dilated(
            y, kb, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    dt = chain_time(body, x, iters, f"conv {name}")
    if dt is None:
        return None
    flops = 2 * 2 * batch * hw * hw * 9 * cin * cout  # 2 convs
    tflops = flops / dt / 1e12
    print(f"    -> {tflops:.1f} TFLOP/s ({tflops / 197 * 100:.0f}% of v5e bf16 peak)")
    return {"ms": dt * 1e3, "tflops": tflops}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    print(f"devices: {jax.devices()}", flush=True)
    out = {}
    out["ideal"] = conv_probe("256->256 @32px b16 bf16", 16, 32, 256, 256, jnp.bfloat16)
    out["wide"] = conv_probe("512->512 @16px b16 bf16", 16, 16, 512, 512, jnp.bfloat16)
    out["trunk0"] = conv_probe("64->192 @32px b16 bf16", 16, 32, 64, 192, jnp.bfloat16)
    out["trunk32"] = conv_probe("64->32 @32px b16 bf16", 16, 32, 64, 32, jnp.bfloat16)
    out["ideal_f32"] = conv_probe("256->256 @32px b16 f32", 16, 32, 256, 256, jnp.float32)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(16, 32, 32, 3)).astype(np.float32))
    for name, dt in (("gfwd_bf16", jnp.bfloat16), ("gfwd_f32", jnp.float32)):
        model = create_model("bsrgan_x4", num_rrdb=23, scan_blocks=True, dtype=dt)
        params = model.init(jax.random.PRNGKey(0), lr)["params"]
        fwd = lambda z, m=model: (
            m.apply({"params": params}, z)[:, ::4, ::4, :] * 0.999 + z * 1e-6
        )
        t = chain_time(fwd, lr, 16, f"G fwd {name}")
        out[name] = t and {"ms": t * 1e3}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
