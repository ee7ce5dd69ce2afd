"""Shared Flax building blocks (NHWC, bf16-friendly).

Parity notes reference the PyTorch originals:
- ResidualDenseBlock / RRDB: ``ESRGAN/model.py:29-86`` (identical clones in
  the other three folders).
- Kaiming-normal x0.1 conv init: ``ESRGAN/model.py:237-243``.
- Spectral-norm convs: ``Real_ESRGAN/model.py:29-105`` (torch
  ``spectral_norm`` with one power iteration per step).
- Token self-attention: ``BSRGAN/model.py:388-402`` (nn.MultiheadAttention
  over flattened HW tokens, 8 heads, returning head-averaged weights).
- Transformer encoder: torch ``nn.TransformerEncoderLayer`` defaults
  (post-LN, ff=2048, ReLU, dropout 0.1) as used by ``BSRGANtrans``
  (``A-ESRGAN/model.py:667-680``).
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Kaiming-normal (torch default: gain sqrt(2), fan_in) scaled by 0.1 =>
# variance 2/fan_in * 0.01.
kaiming_x01 = nn.initializers.variance_scaling(0.02, "fan_in", "normal")
kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def lrelu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.2)


def out_dtype(compute_dtype) -> Any:
    """Model outputs are emitted in f32 (bf16 compute upcasts for losses/
    metrics) — except under f64 lockstep-parity runs, where downcasting
    would reintroduce exactly the roundoff the f64 run exists to remove:
    a 4e-9 f32 rounding of the generator output measurably shifts the
    discriminator's gradients ~1e6-fold through its LeakyReLU kinks
    (tests/test_train_parity.py ESRGAN docstring)."""
    return jnp.float64 if compute_dtype == jnp.float64 else jnp.float32


# B[ty, dy, ky] = 1 iff ty == dy + ky: maps a 3x3 tap (ky) of output
# pixel dy in a 2x2 block onto tap ty of the 4x4 super-pixel kernel.
# numpy (not jnp) on purpose: a device array at import initializes the XLA
# backend, which breaks jax.distributed.initialize for multi-process
# programs importing this package first; it becomes a traced-in constant
# with identical numerics.
_S2D_TAPS = np.fromfunction(
    lambda t, d, k: t == d + k, (4, 2, 3)
).astype(np.float32)


def conv3x3_superpixel(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3/s1 SAME conv computed as one stride-2 4x4 conv whose output
    features are all four pixels of a 2x2 block, then depth-to-space.

    Why: the RDB trunk's convs emit only gc=32 features, so a direct conv
    fills 32 of the MXU's 128 output lanes (observed ~20% MXU in round-1
    profiles). Packing the 2x2 pixel block into the feature dimension
    gives N = 4*cout = 128 full lanes at the cost of a 16/9 MAC increase
    (the 4x4 super-kernel covers each pixel's 3x3 window with zeros
    elsewhere) — net ~2.25x on the MXU for cout=32. Exact: identical
    arithmetic per output pixel, requires even H and W.
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    b = _S2D_TAPS.astype(w.dtype)
    # k4[ty, tx, c, (dy, dx, o)] = w[ty - dy, tx - dx, c, o] (0 outside)
    k4 = jnp.einsum("YpK,XqL,KLco->YXcpqo", b, b, w).reshape(4, 4, cin, 4 * cout)
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        p,
        k4.astype(x.dtype),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (
        y.reshape(n, h // 2, wd // 2, 2, 2, cout)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h, wd, cout)
    )


class Conv(nn.Module):
    """3x3/s1 'same' conv by default; torch-style explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None  # None => torch p = k//2 for odd k, 1 for k=4
    use_bias: bool = True
    scaled_init: bool = False  # kaiming x0.1 (generator convention)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if pad is None:
            pad = 1 if self.kernel in (3, 4) else self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=kaiming_x01 if self.scaled_init else nn.initializers.lecun_normal(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class SNConv(nn.Module):
    """Conv2d wrapped in spectral normalization (one power iteration per
    training step, matching torch's ``spectral_norm`` default).

    The left-singular-vector estimate ``u`` lives in the ``spectral``
    variable collection; pass ``update_stats=True`` during training steps.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.he_uniform(),
            (self.kernel, self.kernel, in_ch, self.features),
            jnp.float32,
        )
        # torch views the weight as (out, in*k*k); ours is (k,k,in,out).
        w = k.reshape(-1, self.features).T  # (out, in*k*k)
        u_var = self.variable(
            "spectral", "u", lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,))
        )
        u = u_var.value
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        sigma = jax.lax.stop_gradient(u_new) @ w @ jax.lax.stop_gradient(v)
        k_sn = (k / sigma).astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k_sn,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + b.astype(self.dtype)
        return out


class ResidualDenseBlock(nn.Module):
    """5-conv dense block, LeakyReLU(0.2), 0.2-scaled residual
    (ESRGAN/model.py:29-60).

    TPU execution layout: the reference applies conv_k to the concatenation
    [x, out1..out_{k-1}] with only 32 output channels — a poor fit for the
    128-wide MXU and extra HBM traffic for every concat. Since convolution
    is linear in its input, we regroup by *source*: one conv carries each
    source's contributions to ALL later layers (x -> 192ch, out1 -> 160ch,
    out2 -> 128ch, out3 -> 96ch, out4 -> 64ch), and each out_k is the sum
    of its slices. Numerically identical (same parameters, checkpoint-
    compatible: params remain the 5 reference-shaped convs; kernels are
    re-sliced at trace time), MXU-shaped matmuls throughout, no
    concatenated activations ever materialize. Set ``fused=False`` for the
    literal reference dataflow.
    """

    channels: int
    growth_channels: int
    dtype: Any = jnp.float32
    fused: bool = True
    pallas: bool = False  # fused VMEM-resident kernel (benchmark-gated)
    superpixel: bool = False  # conv3x3_superpixel dataflow (full MXU lanes)
    quant: bool = False  # int8 PTQ serving path (ops/quant.py; inference only)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch, gc = self.channels, self.growth_channels
        # reference-shaped parameters: conv_k maps ch + k*gc -> gc (k<4), ch (k=4)
        kernels = []
        biases = []
        for k in range(5):
            cin = ch + gc * k
            cout = gc if k < 4 else ch
            kernels.append(
                self.param(f"conv{k}_kernel", kaiming_x01, (3, 3, cin, cout), jnp.float32)
            )
            biases.append(self.param(f"conv{k}_bias", nn.initializers.zeros, (cout,), jnp.float32))

        if self.pallas and not self.quant and not self.is_initializing():
            if int(self.pallas) >= 2:  # v2 whole-image batch-grouped kernel
                from srganfd_tpu.ops.pallas.rdb import rdb_apply_v2

                # VMEM cap: the kernel keeps bt whole images (input, im2col
                # staging, f32 accumulators) resident; measured on v5e,
                # bt*H*W = 4096 crashes the Mosaic compile and 2048 is fine,
                # so cap the working set there and fall through to the XLA
                # dataflow when even bt=1 exceeds it.
                hw = x.shape[1] * x.shape[2]
                bt = next(
                    (t for t in (4, 2, 1) if x.shape[0] % t == 0 and t * hw <= 2048),
                    None,
                )
                if bt is not None:
                    return rdb_apply_v2(
                        x.astype(self.dtype), tuple(kernels), tuple(biases), bt
                    ).astype(self.dtype)
                # else: image too large for the VMEM-resident kernel — use
                # the fused XLA dataflow below
            else:
                from srganfd_tpu.ops.pallas.rdb import rdb_apply

                h = x.shape[1]
                tile_h = next(t for t in (32, 16, 8, 4, 2, 1) if h % t == 0)
                return rdb_apply(
                    x.astype(self.dtype), tuple(kernels), tuple(biases), tile_h
                ).astype(self.dtype)

        use_sp = self.superpixel and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        use_quant = self.quant and not self.is_initializing()

        def conv(inp, kern):
            if use_quant:  # int8 PTQ path (overrides superpixel/pallas)
                from srganfd_tpu.ops.quant import qconv2d

                return qconv2d(inp, kern.astype(jnp.float32)).astype(self.dtype)
            if use_sp:
                return conv3x3_superpixel(inp.astype(self.dtype), kern.astype(self.dtype))
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype),
                kern.astype(self.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if not self.fused:
            outs = [x]
            for k in range(5):
                inp = jnp.concatenate(outs, -1) if k else x
                y = conv(inp, kernels[k]) + biases[k].astype(self.dtype)
                outs.append(lrelu(y) if k < 4 else y)
            return outs[-1] * 0.2 + x

        # source s occupies input-channel rows [off_s, off_s + width_s) of
        # every later conv's kernel; group them into one wide conv per source.
        offsets = [0, ch, ch + gc, ch + 2 * gc, ch + 3 * gc]
        widths = [ch, gc, gc, gc, gc]
        splits = [gc, gc, gc, gc, ch]  # output widths of conv0..conv4

        def contributions(source_idx: int, inp: jax.Array) -> list[jax.Array | None]:
            """conv of ``inp`` against the stacked kernels of conv_k for all
            k > source_idx - 1 (source 0 = x feeds conv0..4; source s = out_s
            feeds conv_s..4), split back per target conv."""
            first = source_idx  # x feeds conv0+, out_s feeds conv_s+ (s>=1)
            parts = [
                jax.lax.dynamic_slice_in_dim(
                    kernels[k], offsets[source_idx], widths[source_idx], axis=2
                )
                for k in range(first, 5)
            ]
            wide = jnp.concatenate(parts, axis=3)
            y = conv(inp, wide)
            out: list[jax.Array | None] = [None] * 5
            start = 0
            for k in range(first, 5):
                out[k] = y[..., start : start + splits[k]]
                start += splits[k]
            return out

        acc = contributions(0, x)
        outs = []
        for k in range(4):
            y = acc[k] + biases[k].astype(self.dtype)
            out_k = lrelu(y)
            outs.append(out_k)
            contrib = contributions(k + 1, out_k)
            for t in range(k + 1, 5):
                acc[t] = acc[t] + contrib[t]
        out5 = acc[4] + biases[4].astype(self.dtype)
        return out5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3 RDBs + 0.2-scaled residual
    (ESRGAN/model.py:63-86)."""

    channels: int
    growth_channels: int
    dtype: Any = jnp.float32
    pallas: bool = False
    superpixel: bool = False
    fused: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rdb = lambda: ResidualDenseBlock(
            self.channels, self.growth_channels, self.dtype, fused=self.fused,
            pallas=self.pallas, superpixel=self.superpixel, quant=self.quant,
        )
        out = rdb()(x)
        out = rdb()(out)
        out = rdb()(out)
        return out * 0.2 + x


class _ScanBody(nn.Module):
    """One RRDB step in (carry, xs) form for nn.scan."""

    channels: int
    growth_channels: int
    dtype: Any
    remat: bool = False
    pallas: bool = False
    superpixel: bool = False
    fused: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, carry, _):
        block_cls = nn.remat(RRDB) if self.remat else RRDB
        out = block_cls(
            self.channels, self.growth_channels, self.dtype, self.pallas,
            self.superpixel, self.fused, self.quant, name="RRDB_0"
        )(carry)
        return out, None


def run_trunk(
    x: jax.Array,
    channels: int,
    growth_channels: int,
    num_blocks: int,
    dtype: Any,
    scan_blocks: bool = False,
    remat: bool = False,
    pallas: bool = False,
    superpixel: bool = False,
    fused: bool = True,
    quant: bool = False,
) -> jax.Array:
    """The RRDB trunk, called inside a parent module's compact ``__call__``.

    - unrolled (default): params register as ``RRDB_{i}`` on the parent —
      checkpoint-compatible with ported reference weights;
    - ``scan_blocks=True``: one ``nn.scan`` over stacked params under
      ``ScanRRDB`` — compiles the block body once instead of N times
      (order-of-magnitude compile-time cut for the 23-block trunks) with
      identical numerics. ``stack_trunk_params``/``unstack_trunk_params``
      convert checkpoints between layouts. ``remat=True`` additionally
      rematerializes each block on the backward pass (activation memory
      ~N times smaller on the trunk).
    """
    if not scan_blocks:
        block_cls = nn.remat(RRDB) if remat else RRDB
        for i in range(num_blocks):
            # explicit names keep the param tree identical with/without remat
            x = block_cls(
                channels, growth_channels, dtype, pallas, superpixel, fused,
                quant, name=f"RRDB_{i}"
            )(x)
        return x
    scan = nn.scan(
        _ScanBody,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=num_blocks,
    )
    out, _ = scan(channels, growth_channels, dtype, remat, pallas, superpixel,
                  fused, quant, name="ScanRRDB")(x, None)
    return out


def stack_trunk_params(params: dict, num_blocks: int) -> dict:
    """Convert unrolled trunk params (RRDB_0..RRDB_{n-1}) to the scanned
    layout (ScanRRDB with a leading block axis)."""
    import numpy as np

    blocks = [params[f"RRDB_{i}"] for i in range(num_blocks)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    out = {k: v for k, v in params.items() if not k.startswith("RRDB_")}
    out["ScanRRDB"] = {"RRDB_0": stacked}
    return out


def unstack_trunk_params(params: dict, num_blocks: int) -> dict:
    """Inverse of :func:`stack_trunk_params`."""
    import numpy as np

    key = next(k for k in params if k.startswith("ScanRRDB"))
    stacked = params[key]
    inner = next(iter(stacked.values())) if isinstance(stacked, dict) else stacked
    out = {k: v for k, v in params.items() if not k.startswith("ScanRRDB")}
    for i in range(num_blocks):
        out[f"RRDB_{i}"] = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], inner)
    return out


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel-unshuffle matching torch ``nn.PixelUnshuffle``: output
    channel order is (c, fh, fw)."""
    if factor == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h', w', c, fh, fw
    return x.reshape(n, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel-shuffle (inverse of the above, torch channel order)."""
    if factor == 1:
        return x
    n, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(n, h, w, co, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * factor, w * factor, co)


def chunked_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, chunk: int
) -> jax.Array:
    """Softmax attention with query-block chunking: peak score memory is
    O(chunk * T) instead of O(T^2), unlocking large token counts (the
    reference's SA/transformer variants OOM on big frames — SURVEY.md §5).
    Full K/V stay resident; each block's softmax is exact, so the result
    is identical to unchunked attention. q/k/v: (N, T, H, D)."""
    n, t, h, d = q.shape
    pad = (-t) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nb = qp.shape[1] // chunk
    blocks = jnp.moveaxis(qp.reshape(n, nb, chunk, h, d), 1, 0)

    # remat the block: without it, lax.map's linearization stacks each
    # block's (n, h, chunk, T) softmax weights as residuals — O(T^2) total
    # in the backward, defeating the chunking exactly where it matters.
    # With remat, residuals are just the qi blocks; each block's scores are
    # recomputed transiently (O(chunk * T) live) during the grad sweep.
    @jax.checkpoint
    def blk(qi: jax.Array) -> jax.Array:
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", qi.astype(jnp.float32), k.astype(jnp.float32)
        ) / jnp.sqrt(d)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("nhqk,nkhd->nqhd", w, v.astype(jnp.float32))

    out = jax.lax.map(blk, blocks)  # (nb, n, chunk, h, d)
    out = jnp.moveaxis(out, 0, 1).reshape(n, nb * chunk, h, d)
    return out[:, :t].astype(q.dtype)


_attention_backend = os.environ.get("SRGANFD_ATTN_BACKEND", "chunked")


def set_attention_backend(name: str) -> None:
    """Select the large-input exact-attention execution backend:

    - ``"chunked"`` (default): query-block ``lax.map`` sweep over full
      resident K/V (``chunked_attention``) — pure XLA.
    - ``"flash"``: the Pallas online-softmax kernel
      (``ops.pallas.attention.flash_attention``) — scores never leave
      VMEM; identical semantics. Interpreted off-TPU.

    Set before the first jitted call (the choice is baked at trace time;
    already-compiled programs for the same shapes are not retraced).
    """
    global _attention_backend
    if name not in ("chunked", "flash"):
        raise ValueError(f"unknown attention backend {name!r}")
    _attention_backend = name


def large_attention(q: jax.Array, k: jax.Array, v: jax.Array, chunk: int) -> jax.Array:
    """Exact attention for large token counts via the selected backend
    (see ``set_attention_backend``); q/k/v: (N, T, H, D)."""
    if _attention_backend == "flash":
        from srganfd_tpu.ops.pallas.attention import flash_attention

        interpret = jax.devices()[0].platform != "tpu"
        # block_q must be sublane-aligned (multiple of 8) for the f32 VMEM
        # BlockSpec — a user chunk like 100 would compile under interpret
        # mode but be rejected by Mosaic on hardware. Cap at 1024: measured
        # on v5e (tools/attn_ab.py, docs/tpu_performance.md) (1024,1024)
        # blocks are ~2x (512,512) at T>=16384 while 2048 gains nothing
        # and can fail to compile at d=32.
        block_q = min(1024, max(8, -(-chunk // 8) * 8))
        return flash_attention(q, k, v, block_q, 1024, interpret)
    return chunked_attention(q, k, v, chunk)


def chunked_attention_fn(chunk: int):
    """``nn.MultiHeadDotProductAttention``-compatible ``attention_fn``
    (same q/k/v layout, extra kwargs ignored) running chunked attention —
    lets existing checkpoints switch memory regimes with no param change."""

    def fn(query, key, value, *args, **kwargs):  # noqa: ANN001
        return large_attention(query, key, value, chunk)

    return fn


class TokenSelfAttention(nn.Module):
    """Multi-head self-attention over flattened HW tokens; returns
    (output, head-averaged attention weights) like torch
    ``nn.MultiheadAttention`` (BSRGAN/model.py:388-402).

    O((HW)^2) by default — the reference's known memory hot spot. Set
    ``chunk_size`` > 0 for exact chunked attention with O(chunk*HW) score
    memory; the (n, q, k) weight map (itself O((HW)^2)) is then skipped
    and ``None`` is returned in its place.
    """

    channels: int
    num_heads: int = 8
    dtype: Any = jnp.float32
    chunk_size: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array | None]:
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c).astype(self.dtype)
        d = c // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            (self.num_heads, d), axis=-1, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("query")(tokens)
        k = dense("key")(tokens)
        v = dense("value")(tokens)
        if self.chunk_size:
            out = large_attention(q, k, v, self.chunk_size)
            avg_weights = None
        else:
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(d).astype(self.dtype)
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("nhqk,nkhd->nqhd", weights, v)
            avg_weights = jnp.mean(weights, axis=1)  # (n, q, k), torch head avg
        out = nn.DenseGeneral(
            c, axis=(-2, -1), dtype=self.dtype, param_dtype=jnp.float32, name="out"
        )(out)
        return out.reshape(n, h, w, c), avg_weights


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` defaults: post-LN, MHA, ReLU
    MLP with dim_feedforward=2048, dropout 0.1 (off when deterministic).

    ``ring_axis``: run the attention context-parallel over that mesh
    axis (the token axis is sharded across devices). ``cp_backend``
    picks the collective pattern: ``"ring"`` rotates K/V blocks via
    ppermute (``parallel/ring_attention.py``, any device count);
    ``"ulysses"`` head-shards via two all-to-alls
    (``parallel/ulysses.py``, capped at nhead-way). ``kv_valid`` masks
    which local tokens this shard contributes as keys (halo duplicates
    off) in either mode. Only meaningful inside ``shard_map``.
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    attn_chunk: int = 0  # >0: exact chunked attention (large-input mode)
    ring_axis: str | None = None
    cp_backend: str = "ring"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        kv_valid: jax.Array | None = None,
    ) -> jax.Array:
        if self.ring_axis is not None and self.cp_backend not in ("ring", "ulysses"):
            # a typo must not silently run ring attention (ADVICE r4): the
            # CLI validates via argparse choices, but ServingEngine and
            # programmatic callers pass the string straight through
            raise ValueError(
                f"unknown cp_backend {self.cp_backend!r}: expected 'ring' or 'ulysses'"
            )
        if self.ring_axis is not None and self.cp_backend == "ulysses":
            from srganfd_tpu.parallel.ulysses import ulysses_attention_fn

            attention_fn = ulysses_attention_fn(self.ring_axis, kv_valid)
        elif self.ring_axis is not None:
            from srganfd_tpu.parallel.ring_attention import ring_attention_fn

            attention_fn = ring_attention_fn(self.ring_axis, kv_valid)
        elif self.attn_chunk:
            attention_fn = chunked_attention_fn(self.attn_chunk)
        else:
            attention_fn = nn.dot_product_attention
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            deterministic=True,
            attention_fn=attention_fn,
        )(x, x)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x + attn)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x + y)
