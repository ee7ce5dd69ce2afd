"""Persistent super-resolution serving daemon.

Generalizes the reference's one-shot ``inference.py`` (``ESRGAN/
inference.py:79-102``) into a production server: the model is built and
compiled ONCE per shape bucket and stays resident; requests stream in
over one of three transports and SR frames stream out. This is the
deployment story for the thesis's CFD workload — a solver drops frames,
the daemon upscales them continuously.

Transports (pick one):
  --stdio            JSONL on stdin/stdout. One request per line:
                       {"input": "lr.png", "output": "sr.png"[, "id": x]}
                     replied with
                       {"id", "output", "ms", "in_hw", "out_hw", "ok"}
                     EOF or {"cmd": "shutdown"} stops the daemon.
  --watch DIR        poll DIR for new/updated frames; SR each into
                     --output DIR (same basename). `--once` drains the
                     backlog and exits (cron mode).
  --port N           HTTP: POST /sr with an encoded image body returns
                     the SR PNG; GET /healthz -> 200 "ok";
                     GET /stats -> JSON counters. Single-threaded by
                     default (the one TPU serializes compute anyway);
                     ``--batch auto`` threads the server and
                     micro-batches concurrent requests.

TPU-first serving behaviors:
  - shape bucketing: ``--bucket M`` reflect-pads inputs up to multiples
    of M so a size-varied stream compiles <= #buckets programs (the SR
    output is cropped back to scale * the true size; seam effects are
    confined to the generator's receptive field at the padded edge —
    use --bucket 0 for exact per-shape compiles).
  - ``--warmup HxW[,HxW...]`` pre-compiles the hot shapes before the
    transport opens, so the first real frame doesn't pay the 20-40 s
    cold compile.
  - ``--batch N``: watch-mode backlogs drain in batched dispatches —
    same-bucket frames stack into ONE device call (ragged tails
    repeat-pad to the fixed batch), keeping the MXU batch-efficient
    when a solver drops many frames between polls.
  - ``--half`` serves in bfloat16 (the measured-fastest mode on v5e —
    docs/tpu_performance.md); --quant-int8 / --self-ensemble / --tile
    compose like the one-shot CLI.
  - request latency percentiles (p50/p95) and per-bucket compile counts
    are tracked and reported on shutdown (and at GET /stats).

Overload limits (HTTP transport):
  - POST bodies above ``--max-body-mb`` (default 64) are rejected with
    413 before the body is read — a flood of oversized uploads cannot
    balloon decoded-frame memory.
  - with ``--batch auto`` the micro-batcher queue is bounded at
    ``--max-queue`` requests (default 32); when it is full new requests
    get 503 + Retry-After instead of queueing decoded float32 frames
    without limit. GET /stats reports the rejection count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

__all__ = ["ServingEngine", "main"]


def _pad_to_multiple(img: np.ndarray, mult: int) -> tuple[np.ndarray, int, int]:
    """Reflect-pad HWC to the next (mult, mult) multiple; returns the true
    (h, w) for crop-back (same scheme as ``cli.test``'s bucketed eval)."""
    h, w = img.shape[:2]
    if mult <= 1:
        return img, h, w
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    return img, h, w


def _batch_arg(v: str):
    """argparse type for --batch: 'auto' or a positive int."""
    if v == "auto":
        return v
    try:
        n = int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(f"--batch must be an int or 'auto', got {v!r}")
    if n < 1:
        raise argparse.ArgumentTypeError("--batch must be >= 1")
    return n


def _auto_drain_chunks(n: int) -> list[int]:
    """Measured backlog-drain ladder (docs/tpu_performance.md round 3,
    v5e 256px bsrgan_x4): per-dispatch cost makes batch-16 beat N singles
    from N>=15, batch-8 from N>=8, while batches 2-6 sit in a 40% conv-
    tiling valley — so drain 16s while >=15 remain, then at most one 8,
    then singles. Compiles at most {16, 8, 1} x buckets programs."""
    out: list[int] = []
    while n >= 15:
        out.append(16)
        n -= min(n, 16)
    if n >= 8:
        out.append(8)
        n -= 8
    out.extend([1] * n)
    return out


class ServingEngine:
    """Resident model + compiled-program cache + request statistics."""

    def __init__(
        self,
        arch: str,
        weights: str = "",
        use_ema: bool = False,
        half: bool = False,
        quant_int8: bool = False,
        self_ensemble: bool = False,
        tile: int = 0,
        tile_overlap: int = 16,
        bucket: int = 0,
        batch: int | str = 1,
        attn_chunk: int = 0,
        attn_backend: str = "chunked",
        spatial_shard: bool = False,
        cp_backend: str = "ring",
        model_kwargs: dict | None = None,
    ) -> None:
        import jax
        import jax.numpy as jnp

        from srganfd_tpu.models import create_model
        from srganfd_tpu.models.registry import arch_accepts

        if attn_backend != "chunked":
            from srganfd_tpu.models.blocks import set_attention_backend

            set_attention_backend(attn_backend)
        kwargs = {}
        if half:
            kwargs["dtype"] = jnp.bfloat16
        if quant_int8 and arch_accepts(arch, "quant"):
            kwargs["quant"] = True
        if attn_chunk and arch_accepts(arch, "attn_chunk"):
            kwargs["attn_chunk"] = attn_chunk
        kwargs.update(model_kwargs or {})
        self.model = create_model(arch, **kwargs)
        self.bucket = int(bucket)
        self.batch = "auto" if batch == "auto" else max(1, int(batch))
        self.tile = int(tile)
        self.tile_overlap = int(tile_overlap)
        self.self_ensemble = bool(self_ensemble)
        # multi-chip latency mode: each frame's H axis shards over the
        # mesh with ICI halo exchange (parallel/spatial.py) — the serving
        # analog of `infer --spatial-shard`; mutually exclusive with tile
        self.spatial_mesh = None
        self._spatial_row_multiple = 1
        self._spatial_halo = self.tile_overlap
        self._spatial_model = self.model
        if spatial_shard:
            if self.tile:
                raise ValueError("--spatial-shard and --tile are mutually exclusive")
            from srganfd_tpu.parallel import make_mesh

            self.spatial_mesh = make_mesh()
            if arch_accepts(arch, "ring_axis"):
                # transformer bottleneck: run the attention context-
                # parallel over the mesh so sharded serving stays exact —
                # ring (ppermute K/V, any count) or ulysses (head-sharded
                # all-to-all, <= num_heads-way; parallel/ulysses.py)
                self._spatial_halo += self._spatial_halo % 2
                self._spatial_row_multiple = 2
                self._spatial_model = create_model(
                    arch, ring_axis="data", ring_halo=self._spatial_halo,
                    cp_backend=cp_backend, **kwargs,
                )
        self._apply = jax.jit(lambda p, z: self.model.apply({"params": p}, z))

        probe = jnp.zeros((1, 16, 16, 3), jnp.float32)
        if weights:
            from srganfd_tpu.train import checkpoint as ckpt

            payload = ckpt.load_checkpoint(weights)
            self.params = payload["state"]["ema_g_params" if use_ema else "g_params"]
        else:
            print("! no --weights: serving randomly initialized parameters", file=sys.stderr)
            self.params = self.model.init(jax.random.PRNGKey(0), probe)["params"]
        self.upscale = int(np.asarray(self._apply(self.params, probe)).shape[1] // 16)

        self.served = 0
        self.failed = 0
        self.rejected = 0  # overload 503s (HTTP micro-batcher queue full)
        self.rejected_oversize = 0  # client-error 413s (bad/oversized Content-Length)
        self.latencies_ms: list[float] = []
        self._compiled: set[tuple[int, int]] = set()
        # guards the counters above AND _compiled: the HTTP transport is
        # multi-threaded under --batch auto, so a GET /stats snapshot can
        # race a dispatch adding a newly compiled shape (ADVICE r3)
        self.stats_lock = threading.Lock()

    # -- core -------------------------------------------------------------
    def sr_array(self, img: np.ndarray) -> np.ndarray:
        """float32 HWC [0,1] -> SR HWC [0,1]; pads to the bucket, crops
        back to ``upscale * true_size``."""
        import jax.numpy as jnp

        padded, h, w = _pad_to_multiple(img, self.bucket)
        with self.stats_lock:
            self._compiled.add(padded.shape[:2])
        if self.spatial_mesh is not None:
            from srganfd_tpu.parallel.spatial import spatial_sharded_sr

            run_one = lambda im: spatial_sharded_sr(
                lambda p, z: self._spatial_model.apply({"params": p}, z),
                self.params, im, self.upscale,
                self.spatial_mesh, halo=self._spatial_halo,
                row_multiple=self._spatial_row_multiple,
            )
            if self.self_ensemble:
                from srganfd_tpu.ops.self_ensemble import self_ensemble

                sr = self_ensemble(run_one, padded)
            else:
                sr = np.asarray(run_one(padded))
        elif self.tile:
            from srganfd_tpu.parallel.tiled_inference import tiled_sr

            run_one = lambda im: tiled_sr(
                self._apply, self.params, im, self.upscale,
                tile=self.tile, overlap=self.tile_overlap,
            )
            if self.self_ensemble:
                from srganfd_tpu.ops.self_ensemble import self_ensemble

                sr = self_ensemble(run_one, padded)
            else:
                sr = np.asarray(run_one(padded))
        elif self.self_ensemble:
            from srganfd_tpu.ops.self_ensemble import self_ensemble_batched

            sr = self_ensemble_batched(self._apply, self.params, padded)
        else:
            sr = np.asarray(self._apply(self.params, jnp.asarray(padded)[None])[0])
        return np.asarray(sr, np.float32)[: h * self.upscale, : w * self.upscale]

    def sr_batch(self, imgs: list[np.ndarray]) -> list[np.ndarray]:
        """SR a list of frames with fixed-size batched dispatches.

        Frames pad to the bucket and group by padded shape; each group
        runs through the resident jitted apply in stacks padded (by
        repeating the last frame) to exactly ``self.batch`` rows, so a
        backlog of ANY size compiles one program per (batch, H, W)
        bucket and keeps the MXU batch-efficient. Per-frame modes
        (tile / spatial shard / self-ensemble) and ``batch <= 1`` fall
        back to ``sr_array``.
        """
        per_frame = (
            (self.batch != "auto" and self.batch <= 1)
            or self.tile
            or self.self_ensemble
            or self.spatial_mesh is not None
        )
        if per_frame:
            return [self.sr_array(im) for im in imgs]
        import jax.numpy as jnp

        padded = [_pad_to_multiple(im, self.bucket) for im in imgs]
        groups: dict[tuple[int, int], list[int]] = {}
        for i, (p, _, _) in enumerate(padded):
            groups.setdefault(p.shape[:2], []).append(i)
        out: list[np.ndarray | None] = [None] * len(imgs)
        for shape, idxs in groups.items():
            with self.stats_lock:
                self._compiled.add(shape)
            if self.batch == "auto":
                plan = _auto_drain_chunks(len(idxs))
            else:
                plan = [self.batch] * -(-len(idxs) // self.batch)
            pos = 0
            for bsz in plan:
                chunk = idxs[pos : pos + bsz]
                pos += bsz
                stack = np.stack([padded[i][0] for i in chunk])
                if len(chunk) < bsz:  # ragged tail: repeat-pad
                    pad = np.repeat(stack[-1:], bsz - len(chunk), axis=0)
                    stack = np.concatenate([stack, pad], axis=0)
                sr = np.asarray(self._apply(self.params, jnp.asarray(stack)))
                for j, i in enumerate(chunk):
                    _, h, w = padded[i]
                    out[i] = np.asarray(sr[j], np.float32)[
                        : h * self.upscale, : w * self.upscale
                    ]
        return out  # type: ignore[return-value]

    def sr_files_batched(self, pairs: list[tuple[str, str]]) -> list[dict]:
        """Decode -> batched SR -> encode for (in_path, out_path) pairs.

        Per-file decode/encode failures yield ``{"ok": False}`` replies
        without poisoning the rest of the batch. Latency is accounted as
        the batch wall-clock split evenly over its frames.
        """
        import cv2

        from srganfd_tpu.data.datasets import load_image_rgb

        t0 = time.perf_counter()
        imgs: list[np.ndarray] = []
        live: list[int] = []
        replies: list[dict] = [None] * len(pairs)  # type: ignore[list-item]
        for i, (in_path, _) in enumerate(pairs):
            try:
                imgs.append(load_image_rgb(in_path))
                live.append(i)
            except Exception as e:  # noqa: BLE001 — a bad frame must not kill the batch
                self.failed += 1
                replies[i] = {"ok": False, "error": str(e)[:300]}
        srs = self.sr_batch(imgs) if imgs else []
        for img, sr, i in zip(imgs, srs, live):
            in_path, out_path = pairs[i]
            try:
                sr8 = np.clip(sr * 255.0, 0, 255).astype(np.uint8)
                out_dir = os.path.dirname(os.path.abspath(out_path))
                os.makedirs(out_dir, exist_ok=True)
                if not cv2.imwrite(out_path, sr8[..., ::-1]):
                    raise IOError(f"failed to encode {out_path}")
            except Exception as e:  # noqa: BLE001
                self.failed += 1
                replies[i] = {"ok": False, "error": str(e)[:300]}
                continue
            replies[i] = {
                "output": out_path,
                "in_hw": list(img.shape[:2]),
                "out_hw": list(sr8.shape[:2]),
                "ok": True,
            }
        ms = (time.perf_counter() - t0) * 1e3
        per_frame_ms = ms / max(1, len(live))
        for i in live:
            if replies[i]["ok"]:
                with self.stats_lock:
                    self.served += 1
                    self.latencies_ms.append(per_frame_ms)
                replies[i]["ms"] = round(per_frame_ms, 2)
        return replies

    def sr_file(self, in_path: str, out_path: str) -> dict:
        """Decode -> SR -> encode; returns the reply record."""
        import cv2

        from srganfd_tpu.data.datasets import load_image_rgb

        t0 = time.perf_counter()
        img = load_image_rgb(in_path)
        sr = self.sr_array(img)
        sr8 = np.clip(sr * 255.0, 0, 255).astype(np.uint8)
        out_dir = os.path.dirname(os.path.abspath(out_path))
        os.makedirs(out_dir, exist_ok=True)
        if not cv2.imwrite(out_path, sr8[..., ::-1]):
            raise IOError(f"failed to encode {out_path}")
        ms = (time.perf_counter() - t0) * 1e3
        with self.stats_lock:
            self.served += 1
            self.latencies_ms.append(ms)
        return {
            "output": out_path,
            "ms": round(ms, 2),
            "in_hw": list(img.shape[:2]),
            "out_hw": list(sr8.shape[:2]),
            "ok": True,
        }

    def warmup(self, shapes: list[tuple[int, int]]) -> None:
        for h, w in shapes:
            t0 = time.perf_counter()
            self.sr_array(np.zeros((h, w, 3), np.float32))
            print(
                f"warmup {h}x{w}: {(time.perf_counter() - t0):.1f}s",
                file=sys.stderr, flush=True,
            )
        self.served = 0
        self.latencies_ms.clear()

    def stats(self) -> dict:
        with self.stats_lock:  # snapshot: handler threads mutate these
            lat = sorted(self.latencies_ms)
            served, failed, rejected = self.served, self.failed, self.rejected
            rejected_oversize = self.rejected_oversize
            compiled = sorted(self._compiled)
        pick = lambda q: round(lat[min(len(lat) - 1, int(q * len(lat)))], 2) if lat else None
        return {
            "served": served,
            "failed": failed,
            "rejected": rejected,
            "rejected_oversize": rejected_oversize,
            "p50_ms": pick(0.50),
            "p95_ms": pick(0.95),
            "compiled_shapes": compiled,
            "upscale": self.upscale,
        }


# -- transports -----------------------------------------------------------


def serve_stdio(engine: ServingEngine, inp=None, out=None) -> None:
    """JSONL request/reply loop; injectable streams for tests."""
    inp = inp if inp is not None else sys.stdin
    out = out if out is not None else sys.stdout
    for line in inp:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}), file=out, flush=True)
            engine.failed += 1
            continue
        if req.get("cmd") == "shutdown":
            break
        if req.get("cmd") == "stats":
            print(json.dumps(engine.stats()), file=out, flush=True)
            continue
        try:
            reply = engine.sr_file(req["input"], req["output"])
        except Exception as e:  # noqa: BLE001 — a bad frame must not kill the daemon
            engine.failed += 1
            reply = {"ok": False, "error": str(e)[:300]}
        if "id" in req:
            reply["id"] = req["id"]
        print(json.dumps(reply), file=out, flush=True)


def serve_watch(
    engine: ServingEngine, in_dir: str, out_dir: str,
    poll_s: float = 0.5, once: bool = False, should_stop=None,
) -> int:
    """Poll ``in_dir``; SR any new/updated frame into ``out_dir``. A frame
    is picked up when its mtime settles (two consecutive polls equal) so
    half-written files from the producer aren't decoded mid-copy. Frames
    whose output already exists and is at least as new as the input are
    skipped — restarts and ``--once`` cron passes are idempotent."""
    from srganfd_tpu.data.datasets import list_image_files

    seen: dict[str, float] = {}
    pending: dict[str, float] = {}
    done = 0
    while True:
        ready: list[tuple[str, str, float]] = []
        for p in list_image_files(in_dir):
            try:
                mt = os.path.getmtime(p)
            except OSError:
                continue
            if seen.get(p) == mt:
                continue
            out_p = os.path.join(out_dir, os.path.basename(p))
            if os.path.exists(out_p) and os.path.getmtime(out_p) >= mt:
                seen[p] = mt
                continue
            if pending.get(p) == mt or once:
                ready.append((p, out_p, mt))
            else:
                pending[p] = mt  # wait one poll for the mtime to settle
        if ready:
            # drain the backlog through batched dispatches (one compiled
            # program per (batch, bucket) — see ServingEngine.sr_batch)
            replies = engine.sr_files_batched([(p, out_p) for p, out_p, _ in ready])
            for (p, _, mt), reply in zip(ready, replies):
                seen[p] = mt
                pending.pop(p, None)
                done += 1
                if reply.get("ok"):
                    print(json.dumps({"input": p, **reply}), flush=True)
                else:
                    print(f"! {p}: {reply.get('error')}", file=sys.stderr, flush=True)
        if once:
            return done
        if should_stop is not None and should_stop():
            return done
        time.sleep(poll_s)


class OverloadedError(RuntimeError):
    """Raised by :meth:`_MicroBatcher.submit` when the bounded request
    queue is full — the HTTP handler maps it to 503 + Retry-After."""


class _MicroBatcher:
    """Cross-request dynamic batching for the HTTP transport.

    Concurrent ``POST /sr`` requests enqueue their decoded frames; one
    dispatcher thread groups them and pushes the group through
    :meth:`ServingEngine.sr_batch`, whose ``auto`` ladder sizes the
    dispatches (singles for sparse traffic — a lone request is a plain
    batch-1 forward). A request that arrives alone dispatches
    IMMEDIATELY; only when a burst is already queued does the dispatcher
    hold the window open up to ``max_wait_ms`` to let stragglers join.

    The queue is BOUNDED at ``max_queue`` waiting frames: each entry
    holds a decoded float32 frame, so an unbounded queue would turn a
    request flood into unbounded host memory. When full, ``submit``
    raises :class:`OverloadedError` immediately (fail fast — the caller
    turns it into a 503 the client can retry) rather than blocking the
    handler thread."""

    def __init__(self, engine: "ServingEngine", max_wait_ms: float = 8.0,
                 max_queue: int = 32):
        import queue

        self.engine = engine
        self.q: "queue.Queue" = queue.Queue(maxsize=max(1, int(max_queue)))
        self._queue_mod = queue
        self.max_wait = max_wait_ms / 1e3
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, img: np.ndarray) -> np.ndarray:
        slot: dict = {"ev": threading.Event()}
        try:
            self.q.put_nowait((img, slot))
        except self._queue_mod.Full:
            raise OverloadedError(
                f"micro-batcher queue full ({self.q.maxsize} waiting)"
            ) from None
        slot["ev"].wait()
        if "err" in slot:
            raise RuntimeError(slot["err"])
        return slot["out"]

    def _loop(self) -> None:
        while True:
            item = self.q.get()
            batch = [item]
            if not self.q.empty():  # burst in flight: let stragglers join
                deadline = time.perf_counter() + self.max_wait
                while True:
                    rem = deadline - time.perf_counter()
                    if rem <= 0:
                        break
                    try:
                        batch.append(self.q.get(timeout=rem))
                    except self._queue_mod.Empty:
                        break
            try:
                outs = self.engine.sr_batch([b[0] for b in batch])
            except Exception as e:  # noqa: BLE001 — deliver to every waiter
                for _, slot in batch:
                    slot["err"] = f"{type(e).__name__}: {e}"
                    slot["ev"].set()
                continue
            for (_, slot), out in zip(batch, outs):
                slot["out"] = out
                slot["ev"].set()


def serve_http(
    engine: ServingEngine,
    port: int,
    host: str = "127.0.0.1",
    max_body_bytes: int = 64 * 1024 * 1024,
    max_queue: int = 32,
    should_stop=None,
) -> None:
    """Minimal stdlib HTTP server: POST /sr (image body, any cv2-decodable
    format) -> PNG; GET /healthz, /stats. With ``--batch`` (fixed > 1 or
    'auto') the server threads per request and a :class:`_MicroBatcher`
    groups concurrent frames into single device dispatches; otherwise it
    stays single-threaded (the single TPU serializes compute either way).

    Overload behavior: bodies over ``max_body_bytes`` get 413 without
    being read (counted as ``rejected_oversize`` — client errors, not
    overload); when the bounded micro-batcher queue (``max_queue``) is
    full, requests get 503 + Retry-After and count as ``rejected`` in
    GET /stats — memory stays bounded under a request flood, and a flood
    of bad uploads is distinguishable from queue saturation.
    """
    import http.server

    import cv2

    stats_lock = engine.stats_lock  # handler threads share the counters
    # micro-batching requires the auto ladder: a fixed --batch N would
    # repeat-pad a lone request to a full batch-N dispatch (N x compute).
    batcher = (
        _MicroBatcher(engine, max_queue=max_queue)
        if engine.batch == "auto"
        else None
    )

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet: stats cover observability
            pass

        def _send(
            self, code: int, body: bytes, ctype: str,
            extra_headers: dict | None = None,
        ) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra_headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/stats":
                stats = engine.stats()
                if batcher is not None:
                    # live overload headroom: waiting requests / capacity
                    stats["queue_depth"] = batcher.q.qsize()
                    stats["queue_capacity"] = batcher.q.maxsize
                self._send(200, json.dumps(stats).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802
            if self.path != "/sr":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                n = -1
            if n < 0 or n > max_body_bytes:
                # reject BEFORE reading: an oversized upload never
                # occupies host memory, and a negative/garbage length
                # must not turn into rfile.read(-1) blocking until the
                # client closes (single connection would wedge the
                # single-threaded server)
                with stats_lock:
                    engine.rejected_oversize += 1
                self._send(
                    413,
                    f"body length {n} outside [0, {max_body_bytes}]".encode(),
                    "text/plain",
                )
                return
            raw = np.frombuffer(self.rfile.read(n), np.uint8)
            img = cv2.imdecode(raw, cv2.IMREAD_COLOR)
            if img is None:
                with stats_lock:
                    engine.failed += 1
                self._send(400, b"undecodable image", "text/plain")
                return
            t0 = time.perf_counter()
            rgb = np.asarray(img[..., ::-1], np.float32) / 255.0
            try:
                sr = batcher.submit(rgb) if batcher is not None else engine.sr_array(rgb)
            except OverloadedError as e:
                with stats_lock:
                    engine.rejected += 1
                self._send(
                    503, str(e).encode(), "text/plain",
                    extra_headers={"Retry-After": "1"},
                )
                return
            except RuntimeError as e:
                with stats_lock:
                    engine.failed += 1
                self._send(500, str(e).encode(), "text/plain")
                return
            sr8 = np.clip(sr * 255.0, 0, 255).astype(np.uint8)
            ok, buf = cv2.imencode(".png", sr8[..., ::-1])
            if not ok:
                with stats_lock:
                    engine.failed += 1
                self._send(500, b"encode failed", "text/plain")
                return
            with stats_lock:
                engine.served += 1
                engine.latencies_ms.append((time.perf_counter() - t0) * 1e3)
            self._send(200, buf.tobytes(), "image/png")

    server_cls = (
        http.server.ThreadingHTTPServer if batcher is not None else http.server.HTTPServer
    )
    with server_cls((host, port), Handler) as srv:
        mode = "micro-batched" if batcher is not None else "single-threaded"
        print(
            f"serving on http://{host}:{port} (POST /sr, {mode})",
            file=sys.stderr, flush=True,
        )
        if should_stop is not None:
            # SIGTERM drain: the signal handler only sets a flag (nothing
            # http.server-safe can run in signal context); this watcher
            # turns the flag into a clean shutdown — in-flight handlers
            # finish, then serve_forever returns (found live: without it,
            # SIGTERM left the HTTP daemon running)
            def watch():
                while not should_stop():
                    time.sleep(0.2)
                srv.shutdown()

            threading.Thread(target=watch, daemon=True).start()
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass


def main() -> None:
    ap = argparse.ArgumentParser(description="srganfd_tpu serving daemon")
    ap.add_argument("--model-arch", dest="arch", default="rrdbnet_x4")
    ap.add_argument("--weights", default="")
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--device-type", dest="device", default="tpu", choices=["cpu", "tpu"])
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--stdio", action="store_true", help="JSONL on stdin/stdout")
    mode.add_argument("--watch", default="", help="poll this dir for frames")
    mode.add_argument("--port", type=int, default=0, help="HTTP server port")
    ap.add_argument("--output", default="", help="output dir (watch mode)")
    ap.add_argument("--once", action="store_true", help="watch: drain backlog and exit")
    ap.add_argument("--poll-interval", type=float, default=0.5)
    ap.add_argument("--bucket", type=int, default=0,
                    help="pad inputs to multiples of this (<= #buckets compiles); 0 = exact shapes")
    ap.add_argument("--batch", default="1", type=_batch_arg,
                    help="batched dispatch policy. Watch mode: drain backlogs in "
                    "dispatches of this size (same-bucket frames stack into one "
                    "device call; tails repeat-pad). 'auto' = the measured drain "
                    "ladder (16s, then one 8, then singles) — throughput is "
                    "NON-MONOTONE in batch on v5e: 8/16 beat batch-1 per frame "
                    "but 2-6 lose up to 40%% (docs/tpu_performance.md round 3). "
                    "HTTP mode: 'auto' additionally threads the server and "
                    "micro-batches concurrent requests (fixed N leaves HTTP "
                    "per-frame: padding lone requests to N would cost N x "
                    "compute each)")
    ap.add_argument("--warmup", default="", help="pre-compile shapes, e.g. 256x256,512x512")
    ap.add_argument("--half", action="store_true")
    ap.add_argument("--quant-int8", action="store_true")
    ap.add_argument("--self-ensemble", action="store_true")
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--tile-overlap", type=int, default=16)
    ap.add_argument(
        "--spatial-shard", action="store_true",
        help="shard each frame's H axis over all devices (ICI halo exchange) — "
        "multi-chip latency mode; mutually exclusive with --tile",
    )
    ap.add_argument("--attn-chunk", type=int, default=0)
    ap.add_argument("--attn-backend", choices=["chunked", "flash"], default="chunked")
    ap.add_argument(
        "--cp-backend", choices=["ring", "ulysses"], default="ring",
        help="--spatial-shard transformer attention collective: ring "
        "(ppermute K/V, any device count, streamed O(T_loc*T_glob) "
        "scores) or ulysses (head-sharded all-to-all, capped at the "
        "4-head count; materializes full O(T_glob^2) per-head scores — "
        "prefer ring on very large frames)",
    )
    ap.add_argument("--max-body-mb", type=int, default=64,
                    help="HTTP: reject POST bodies larger than this with 413")
    ap.add_argument("--max-queue", type=int, default=32,
                    help="HTTP --batch auto: bound the micro-batcher queue; "
                    "overflow requests get 503 + Retry-After")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.watch and not args.output:
        ap.error("--watch requires --output")

    engine = ServingEngine(
        args.arch, weights=args.weights, use_ema=args.use_ema, half=args.half,
        quant_int8=args.quant_int8, self_ensemble=args.self_ensemble,
        tile=args.tile, tile_overlap=args.tile_overlap, bucket=args.bucket,
        batch=args.batch,
        attn_chunk=args.attn_chunk, attn_backend=args.attn_backend,
        spatial_shard=args.spatial_shard,
        cp_backend=args.cp_backend,
    )
    if args.warmup:
        shapes = [tuple(int(v) for v in s.split("x")) for s in args.warmup.split(",")]
        engine.warmup(shapes)

    # graceful drain: SIGTERM/SIGINT finish the in-flight frame, then the
    # loop exits and final stats land on stderr
    stop = {"flag": False}

    def _stop(signum, frame):  # pragma: no cover - signal path
        stop["flag"] = True
        print(f"signal {signum}: draining", file=sys.stderr, flush=True)

    import signal as _signal

    try:
        _signal.signal(_signal.SIGTERM, _stop)
    except ValueError:
        pass

    try:
        if args.stdio:
            serve_stdio(engine)
        elif args.watch:
            serve_watch(
                engine, args.watch, args.output, poll_s=args.poll_interval,
                once=args.once, should_stop=lambda: stop["flag"],
            )
        else:
            serve_http(
                engine, args.port,
                max_body_bytes=args.max_body_mb * 1024 * 1024,
                max_queue=args.max_queue,
                should_stop=lambda: stop["flag"],
            )
    finally:
        print(json.dumps({"final_stats": engine.stats()}), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
