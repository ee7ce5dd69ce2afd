"""Probe: batch->channel folding with grouped convs for the RDB trunk.

lane_probe showed G fwd time grows ~4x slower than MACs as widths reach
128: the gc=32/ch=64 trunk is bound by sub-128-lane op overhead, not
FLOPs. This probe executes the SAME trunk arithmetic with 4 batch images
folded into channels: every conv becomes feature_group_count=4 with the
kernel tiled 4x along cout (exact per-group math, no strided convs or
transposes inside the trunk — the folding reshape happens once at entry
and exit).

Variants (trunk-only, 23 RRDBs = 69 RDBs, batch 16, 32px, bf16):
  plain : fused-by-source dataflow as the model runs today
  fold4 : same dataflow, batch folded 16 -> 4 x (C*4) grouped convs

Run alone: python tools/fold_probe.py
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpu_profile import chain_time  # noqa: E402

CH, GC, BLOCKS = 64, 32, 23
OFFSETS = [0, CH, CH + GC, CH + 2 * GC, CH + 3 * GC]
WIDTHS = [CH, GC, GC, GC, GC]
SPLITS = [GC, GC, GC, GC, CH]


def make_params(rng):
    ks = []
    for k in range(5):
        cin = CH + GC * k
        cout = GC if k < 4 else CH
        ks.append(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.03)
    bs = [rng.normal(size=(GC if k < 4 else CH,)).astype(np.float32) * 0.01 for k in range(5)]
    return ks, bs


def lrelu(x):
    import jax.numpy as jnp

    return jnp.where(x >= 0, x, 0.2 * x)


def rdb_plain(x, kernels, biases, dtype):
    import jax
    import jax.numpy as jnp

    def conv(inp, kern):
        return jax.lax.conv_general_dilated(
            inp, kern.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def contributions(s, inp):
        parts = [kernels[k][:, :, OFFSETS[s] : OFFSETS[s] + WIDTHS[s], :] for k in range(s, 5)]
        y = conv(inp, jnp.concatenate(parts, axis=3))
        out = [None] * 5
        start = 0
        for k in range(s, 5):
            out[k] = y[..., start : start + SPLITS[k]]
            start += SPLITS[k]
        return out

    acc = contributions(0, x)
    for k in range(4):
        out_k = lrelu(acc[k] + biases[k].astype(dtype))
        contrib = contributions(k + 1, out_k)
        for t in range(k + 1, 5):
            acc[t] = acc[t] + contrib[t]
    return (acc[4] + biases[4].astype(dtype)) * 0.2 + x


def rdb_fold(x, kernels, biases, dtype, groups=4):
    """x: (B/g, H, W, g*C) group-major folded. Grouped convs with kernels
    tiled g-fold along cout; slices extract per-group target channels via
    a (g, wide) reshape."""
    import jax
    import jax.numpy as jnp

    def conv(inp, kern):
        wide = kern.shape[-1]
        tiled = jnp.concatenate([kern.astype(dtype)] * groups, axis=3)
        return jax.lax.conv_general_dilated(
            inp, tiled, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        ), wide

    def regroup_slices(y, wide, spans):
        """y: (..., g*wide) group-major; return per-span folded tensors
        (..., g*span) via one reshape + slices."""
        n, h, w, _ = y.shape
        y5 = y.reshape(n, h, w, groups, wide)
        outs = []
        start = 0
        for span in spans:
            outs.append(
                y5[..., start : start + span].reshape(n, h, w, groups * span)
            )
            start += span
        return outs

    def fold_slice(inp, off, width):
        """input-channel slice in folded layout: (..., g*C) -> (..., g*width)."""
        n, h, w, _ = inp.shape
        c = inp.shape[-1] // groups
        return inp.reshape(n, h, w, groups, c)[..., off : off + width].reshape(
            n, h, w, groups * width
        )

    def contributions(s, inp_folded):
        parts = [kernels[k][:, :, OFFSETS[s] : OFFSETS[s] + WIDTHS[s], :] for k in range(s, 5)]
        kern = jnp.concatenate(parts, axis=3)
        y, wide = conv(inp_folded, kern)
        spans = [SPLITS[k] for k in range(s, 5)]
        got = regroup_slices(y, wide, spans)
        out = [None] * 5
        for k, g in zip(range(s, 5), got):
            out[k] = g
        return out

    acc = contributions(0, x)
    btile = lambda b: jnp.tile(b.astype(dtype), groups)
    for k in range(4):
        out_k = lrelu(acc[k] + btile(biases[k]))
        contrib = contributions(k + 1, out_k)
        for t in range(k + 1, 5):
            acc[t] = acc[t] + contrib[t]
    return (acc[4] + btile(biases[4])) * 0.2 + x


def trunk(rdb_fn, x, stacked_k, stacked_b, dtype):
    import jax

    def body(carry, params):
        ks = [params[f"k{i}"] for i in range(5)]
        bs = [params[f"b{i}"] for i in range(5)]
        out = rdb_fn(carry, ks, bs, dtype)
        return out, None

    out, _ = jax.lax.scan(body, x, {**stacked_k, **stacked_b})
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n_rdb = BLOCKS * 3
    all_k = [[] for _ in range(5)]
    all_b = [[] for _ in range(5)]
    for _ in range(n_rdb):
        ks, bs = make_params(rng)
        for i in range(5):
            all_k[i].append(ks[i])
            all_b[i].append(bs[i])
    stacked_k = {f"k{i}": jnp.asarray(np.stack(all_k[i])) for i in range(5)}
    stacked_b = {f"b{i}": jnp.asarray(np.stack(all_b[i])) for i in range(5)}

    dtype = jnp.bfloat16
    x = jnp.asarray(rng.uniform(size=(16, 32, 32, CH)).astype(np.float32)).astype(dtype)

    # correctness: fold4 == plain on one RDB
    ks = [stacked_k[f"k{i}"][0] for i in range(5)]
    bs = [stacked_b[f"b{i}"][0] for i in range(5)]
    ref = rdb_plain(x.astype(jnp.float32), ks, bs, jnp.float32)
    xf = x.astype(jnp.float32).reshape(4, 4, 32, 32, CH).transpose(0, 2, 3, 1, 4).reshape(4, 32, 32, 4 * CH)
    got_f = rdb_fold(xf, ks, bs, jnp.float32)
    got = got_f.reshape(4, 32, 32, 4, CH).transpose(0, 3, 1, 2, 4).reshape(16, 32, 32, CH)
    err = float(jnp.abs(got - ref).max())
    print(f"fold4 correctness max|diff| = {err:.2e}")
    # CPU: bit-exact; TPU: f32 convs accumulate through bf16-precision
    # MXU passes, and plain-vs-grouped reassociate differently
    limit = 1e-4 if jax.devices()[0].platform == "cpu" else 0.05
    assert err < limit, err

    results = {}
    body_plain = lambda z: trunk(rdb_plain, z, stacked_k, stacked_b, dtype) * 0.2 + z * 0.8
    t = chain_time(body_plain, x, 8, "trunk fwd plain (69 RDBs)")
    results["plain_ms"] = t and t * 1e3

    xf4 = x.reshape(4, 4, 32, 32, CH).transpose(0, 2, 3, 1, 4).reshape(4, 32, 32, 4 * CH)
    body_fold = lambda z: trunk(rdb_fold, z, stacked_k, stacked_b, dtype) * 0.2 + z * 0.8
    t = chain_time(body_fold, xf4, 8, "trunk fwd fold4 (69 RDBs)")
    results["fold4_ms"] = t and t * 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    main()
