"""A/B the large-input attention backends on the real TPU.

Run (one TPU process at a time!):
    python tools/attn_ab.py

Times, via loop-carried chains (see tools/tpu_profile.py for why naive
timing lies through the axon tunnel):

1. the raw attention op — XLA full softmax / XLA chunked sweep / Pallas
   flash kernel — at the BSRGANtrans bottleneck shape (4 heads, d=16)
   and the SA-discriminator shape (8 heads, d=32) across token counts;
2. the full bsrgantrans_x2 forward (bf16, the `--half` CLI path) at
   large frames under each backend.

The result gates which backend `--attn-chunk` recommends on hardware.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpu_profile import chain_time  # noqa: E402  (same dir; tunnel-safe timing)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--section", default="all", choices=["all", "raw", "model"],
                    help="raw = attention-op sweep, model = full bsrgantrans forward")
    ap.add_argument("--min-t", type=int, default=0, help="skip raw token counts below this")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from srganfd_tpu.models import blocks, create_model
    from srganfd_tpu.ops.pallas.attention import flash_attention

    print(f"devices: {jax.devices()}", flush=True)
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    it = args.iters

    def full_attn(q, k, v):
        d = q.shape[-1]
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) / jnp.sqrt(d)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("nhqk,nkhd->nqhd", w, v.astype(jnp.float32)).astype(q.dtype)

    # --- raw op across token counts --------------------------------------
    for h, d, label in [(4, 16, "bsrgantrans bottleneck"), (8, 32, "SA discriminator")] \
            if args.section in ("all", "raw") else []:
        for t in (4096, 16384, 65536):
            if t < args.min_t:
                continue
            q, k, v = (
                jnp.asarray(rng.normal(size=(1, t, h, d)).astype(np.float32)).astype(dtype)
                for _ in range(3)
            )
            print(f"-- {label}: T={t}, heads={h}, d={d}, {args.dtype}", flush=True)
            if t <= 16384:  # full softmax: (h, T, T) scores
                chain_time(lambda x: full_attn(x, k, v), q, it, "  XLA full softmax")
            chain_time(
                lambda x: blocks.chunked_attention(x, k, v, 512), q, it, "  XLA chunked(512)"
            )
            for bq, bk in ((512, 512), (1024, 1024), (2048, 1024)):
                chain_time(
                    lambda x, bq=bq, bk=bk: flash_attention(x, k, v, bq, bk),
                    q,
                    it,
                    f"  Pallas flash({bq},{bk})",
                )

    # --- in-model: bsrgantrans_x2 forward at large frames -----------------
    for lr_px in (256, 512) if args.section in ("all", "model") else ():
        x = jnp.asarray(
            rng.uniform(size=(1, lr_px, lr_px, 3)).astype(np.float32)
        ).astype(dtype)
        tokens = (lr_px // 2) ** 2
        for backend, chunk in (("chunked", 512), ("flash", 1024)):
            blocks.set_attention_backend(backend)
            model = create_model("bsrgantrans_x2", attn_chunk=chunk, dtype=dtype)
            params = model.init(jax.random.PRNGKey(0), x[:, :32, :32])["params"]
            body = lambda z: z + 1e-9 * model.apply({"params": params}, z)[:, ::2, ::2, :]
            chain_time(
                body,
                x,
                max(2, it // 2),
                f"bsrgantrans_x2 fwd {lr_px}px ({tokens} tokens) [{backend}]",
            )
        blocks.set_attention_backend("chunked")


if __name__ == "__main__":
    main()
