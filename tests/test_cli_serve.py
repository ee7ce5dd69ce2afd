"""Serving daemon: engine semantics, stdio protocol, watch mode, HTTP.

The daemon generalizes the reference's one-shot ``ESRGAN/inference.py``
into a persistent server; these tests drive each transport end-to-end
with a tiny generator on CPU.
"""

import io
import json
import os
import threading
import urllib.request

import cv2
import numpy as np
import pytest

from srganfd_tpu.cli.serve import ServingEngine, serve_stdio, serve_watch

TINY = {"channels": 8, "growth_channels": 4, "num_blocks": 1}


@pytest.fixture(scope="module")
def engine():
    return ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=16)


def _write_png(path, h=20, w=24, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(path), img)
    return img


def test_bucketed_sr_crops_back_to_true_size(engine):
    """A 20x24 input padded to the 32x32 bucket must come back as exactly
    (80, 96) — upscale * the TRUE size, not the padded one."""
    img = np.random.default_rng(0).uniform(size=(20, 24, 3)).astype(np.float32)
    sr = engine.sr_array(img)
    assert sr.shape == (80, 96, 3)
    # same-bucket sizes share one compiled shape
    engine.sr_array(np.zeros((17, 30, 3), np.float32))
    assert engine.stats()["compiled_shapes"] == [(32, 32)]


def test_bucket_padding_is_borderless_in_the_interior(engine):
    """Pad+crop must equal the exact-shape result away from the padded
    edge (seam effects are confined to the receptive field)."""
    exact = ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=0)
    exact.params = engine.params
    img = np.random.default_rng(1).uniform(size=(24, 24, 3)).astype(np.float32)
    a = engine.sr_array(np.pad(img, ((0, 4), (0, 4), (0, 0)), mode="reflect"))[:96, :96]
    b = exact.sr_array(np.pad(img, ((0, 4), (0, 4), (0, 0)), mode="reflect"))[:96, :96]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_stdio_protocol(engine, tmp_path):
    _write_png(tmp_path / "f0.png")
    _write_png(tmp_path / "f1.png", h=20, w=24, seed=1)
    reqs = [
        {"id": 1, "input": str(tmp_path / "f0.png"), "output": str(tmp_path / "sr0.png")},
        {"input": "/nonexistent.png", "output": str(tmp_path / "bad.png")},
        {"cmd": "stats"},
        {"id": 2, "input": str(tmp_path / "f1.png"), "output": str(tmp_path / "sr1.png")},
        {"cmd": "shutdown"},
        {"id": 3, "input": str(tmp_path / "f1.png"), "output": str(tmp_path / "sr2.png")},
    ]
    out = io.StringIO()
    serve_stdio(engine, inp=io.StringIO("\n".join(json.dumps(r) for r in reqs)), out=out)
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(replies) == 4  # 2 frames + 1 error + 1 stats; post-shutdown line unserved
    assert replies[0]["ok"] and replies[0]["id"] == 1
    assert replies[0]["out_hw"] == [80, 96]
    assert not replies[1]["ok"] and "error" in replies[1]
    assert "served" in replies[2]  # stats record
    assert replies[3]["ok"] and replies[3]["id"] == 2
    assert os.path.exists(tmp_path / "sr0.png") and os.path.exists(tmp_path / "sr1.png")
    assert not os.path.exists(tmp_path / "sr2.png")  # after shutdown
    sr0 = cv2.imread(str(tmp_path / "sr0.png"))
    assert sr0.shape == (80, 96, 3)


def test_watch_once_drains_backlog(engine, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    for i in range(3):
        _write_png(in_dir / f"f{i}.png", seed=i)
    done = serve_watch(engine, str(in_dir), str(out_dir), once=True)
    assert done == 3
    assert sorted(os.listdir(out_dir)) == ["f0.png", "f1.png", "f2.png"]
    # a second pass with nothing new is a no-op
    assert serve_watch(engine, str(in_dir), str(out_dir), once=True) == 0


def test_watch_reprocesses_updated_frames(engine, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _write_png(in_dir / "f.png", seed=0)
    assert serve_watch(engine, str(in_dir), str(out_dir), once=True) == 1
    _write_png(in_dir / "f.png", seed=9)
    import time

    future = time.time() + 100
    os.utime(in_dir / "f.png", (future, future))  # updated after its output
    assert serve_watch(engine, str(in_dir), str(out_dir), once=True) == 1


def test_http_transport(engine, tmp_path):
    import http.server
    import socket

    from srganfd_tpu.cli import serve as serve_mod

    # bind port 0 for a free port; reuse serve_http's handler wiring by
    # constructing the server in a thread and shutting it down after
    img = _write_png(tmp_path / "req.png", h=16, w=16)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t = threading.Thread(
        target=serve_mod.serve_http, args=(engine, port), daemon=True
    )
    t.start()
    # poll /healthz until up
    for _ in range(100):
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=1) as r:
                assert r.read() == b"ok"
            break
        except Exception:
            import time

            time.sleep(0.05)
    else:
        raise AssertionError("server did not come up")

    ok, buf = cv2.imencode(".png", img)
    assert ok
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sr", data=buf.tobytes(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        sr = cv2.imdecode(np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR)
    assert sr.shape == (64, 64, 3)

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=5) as r:
        stats = json.loads(r.read())
    assert stats["served"] >= 1 and stats["upscale"] == 4


def test_batched_drain_matches_per_frame(engine, tmp_path):
    """--batch: watch-mode backlogs drain in fixed-size batched
    dispatches; outputs must match the per-frame engine, mixed sizes
    group by bucket, and the ragged tail (5 frames, batch 2) repeat-pads
    without polluting real outputs."""
    batched = ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=16, batch=2)
    batched.params = engine.params

    in_dir, out_b, out_p = tmp_path / "in", tmp_path / "out_b", tmp_path / "out_p"
    in_dir.mkdir()
    sizes = [(20, 24), (20, 24), (17, 30), (40, 8), (20, 24)]  # 2 buckets, ragged tail
    for i, (h, w) in enumerate(sizes):
        _write_png(in_dir / f"f{i}.png", h=h, w=w, seed=i)

    assert serve_watch(batched, str(in_dir), str(out_b), once=True) == 5
    assert serve_watch(engine, str(in_dir), str(out_p), once=True) == 5
    for i in range(5):
        a = cv2.imread(str(out_b / f"f{i}.png"))
        b = cv2.imread(str(out_p / f"f{i}.png"))
        assert a.shape == b.shape == (sizes[i][0] * 4, sizes[i][1] * 4, 3)
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), atol=1.0
        )  # one uint8 step of jitter allowed between batch-2 and batch-1 programs
    assert batched.stats()["served"] == 5


def test_batched_drain_survives_bad_frame(engine, tmp_path):
    """A corrupt file inside a backlog fails alone: the rest of the
    batch is served and counters reflect exactly one failure."""
    batched = ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=16, batch=2)
    batched.params = engine.params
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    for i in range(2):
        _write_png(in_dir / f"f{i}.png", seed=i)
    (in_dir / "broken.png").write_bytes(b"not a png")

    done = serve_watch(batched, str(in_dir), str(out_dir), once=True)
    assert done == 3
    assert sorted(os.listdir(out_dir)) == ["f0.png", "f1.png"]
    stats = batched.stats()
    assert stats["served"] == 2 and stats["failed"] == 1


def test_spatial_shard_engine_matches_plain(engine):
    """--spatial-shard: per-frame H-axis sharding over the mesh returns
    the same SR as the single-device engine (halo exchange is exact),
    and composing it with --tile is rejected."""
    import pytest as _pytest

    img = np.random.default_rng(3).uniform(0, 1, (64, 16, 3)).astype(np.float32)
    # halo (tile_overlap) must fit inside each device's 64/8-row H shard
    sharded = ServingEngine(
        "rrdbnet_x4", model_kwargs=TINY, bucket=16, spatial_shard=True, tile_overlap=4
    )
    a = engine.sr_array(img)
    b = sharded.sr_array(img)
    # halo=4 truncates the trunk's receptive field at shard seams: tiny
    # boundary deltas are expected (same contract as tests/test_spatial_shard)
    np.testing.assert_allclose(a, b, atol=5e-5)

    with _pytest.raises(ValueError, match="mutually exclusive"):
        ServingEngine("rrdbnet_x4", model_kwargs=TINY, tile=32, spatial_shard=True)


def test_spatial_shard_trans_engine_uses_ring_attention():
    """bsrgantrans under --spatial-shard: the engine rebuilds the model
    with ring attention (context parallelism) so the transformer
    bottleneck still attends to the WHOLE frame across shards; the
    sharded output tracks the single-device engine."""
    tiny = {"channels": 8, "growth_channels": 4, "num_rrdb": 1}
    plain = ServingEngine("bsrgantrans_x2", model_kwargs=tiny, bucket=16)
    sharded = ServingEngine(
        "bsrgantrans_x2", model_kwargs=tiny, bucket=16,
        spatial_shard=True, tile_overlap=4,
    )
    assert sharded._spatial_model.ring_axis == "data"
    assert sharded._spatial_row_multiple == 2
    sharded.params = plain.params
    # vertical gradient: shard-local attention would visibly diverge
    rng = np.random.default_rng(5)
    img = (
        np.linspace(0, 1, 64, dtype=np.float32)[:, None, None]
        * np.ones((64, 16, 3), np.float32)
        + 0.1 * rng.uniform(size=(64, 16, 3)).astype(np.float32)
    ).clip(0, 1)
    a = plain.sr_array(img)
    b = sharded.sr_array(img)
    assert a.shape == b.shape
    np.testing.assert_allclose(a[8:-8], b[8:-8], atol=2e-3)


def test_auto_drain_ladder_batches(engine, tmp_path):
    """--batch auto: backlogs drain through the measured ladder (16s,
    then at most one 8, then singles — docs/tpu_performance.md round 3),
    never dispatching the 2-6 conv-tiling valley; outputs match the
    per-frame engine."""
    import cv2

    from srganfd_tpu.cli.serve import _auto_drain_chunks

    # the ladder itself: no 2-7 dispatch ever planned
    for n in range(1, 64):
        plan = _auto_drain_chunks(n)
        assert all(b in (1, 8, 16) for b in plan), (n, plan)
        assert sum(plan) >= n and sum(plan) - n < 16, (n, plan)

    auto = ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=16, batch="auto")
    auto.params = engine.params
    in_dir, out_a, out_p = tmp_path / "in", tmp_path / "out_a", tmp_path / "out_p"
    in_dir.mkdir()
    n = 9  # -> one batch-8 + one single per the ladder
    for i in range(n):
        _write_png(in_dir / f"f{i}.png", h=20, w=24, seed=i)
    assert serve_watch(auto, str(in_dir), str(out_a), once=True) == n
    assert serve_watch(engine, str(in_dir), str(out_p), once=True) == n
    for i in range(n):
        a = cv2.imread(str(out_a / f"f{i}.png"))
        b = cv2.imread(str(out_p / f"f{i}.png"))
        assert a.shape == b.shape == (80, 96, 3)
        np.testing.assert_allclose(a.astype(np.float32), b.astype(np.float32), atol=1.0)
    assert auto.stats()["served"] == n


def test_http_micro_batching_concurrent_requests(engine):
    """HTTP transport with --batch auto: concurrent POST /sr requests are
    grouped by the micro-batcher into shared device dispatches; every
    request gets its own correct-size PNG and the stats count them all."""
    import http.client
    import threading as _t

    import cv2

    from srganfd_tpu.cli.serve import serve_http

    eng = ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=16, batch="auto")
    eng.params = engine.params

    import socket
    import time as _time
    import urllib.request as _url

    with socket.socket() as sck:
        sck.bind(("127.0.0.1", 0))
        port = sck.getsockname()[1]
    server = _t.Thread(target=serve_http, args=(eng, port), daemon=True)
    server.start()
    for _ in range(200):
        try:
            with _url.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=1) as r:
                assert r.read() == b"ok"
            break
        except Exception:
            _time.sleep(0.05)
    else:
        raise AssertionError("server did not come up")

    img = (np.random.default_rng(0).uniform(0, 1, (20, 24, 3)) * 255).astype(np.uint8)
    ok_, buf = cv2.imencode(".png", img)
    assert ok_
    body = buf.tobytes()

    results = [None] * 9

    def post(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/sr", body=body)
        r = conn.getresponse()
        data = r.read()
        sr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        results[i] = (r.status, None if sr is None else sr.shape)
        conn.close()

    threads = [_t.Thread(target=post, args=(i,)) for i in range(9)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r == (200, (80, 96, 3)) for r in results), results
    assert eng.stats()["served"] == 9


def test_http_should_stop_drains_server(engine):
    """serve_http must honor the SIGTERM drain flag: once should_stop
    returns True the server shuts down and the serving thread exits
    (before this fix the HTTP transport ignored the flag entirely)."""
    import socket
    import threading as _t
    import time as _time
    import urllib.request as _url

    from srganfd_tpu.cli.serve import serve_http

    with socket.socket() as sck:
        sck.bind(("127.0.0.1", 0))
        port = sck.getsockname()[1]
    flag = {"stop": False}
    th = _t.Thread(
        target=serve_http, args=(engine, port),
        kwargs={"should_stop": lambda: flag["stop"]}, daemon=True,
    )
    th.start()
    for _ in range(200):
        try:
            with _url.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=1) as r:
                assert r.read() == b"ok"
            break
        except Exception:
            _time.sleep(0.05)
    else:
        raise AssertionError("server did not come up")
    flag["stop"] = True
    th.join(timeout=10)
    assert not th.is_alive()


def test_micro_batcher_bounded_queue_rejects_when_full():
    """The micro-batcher queue is BOUNDED: with the dispatcher stuck in a
    device call and the queue full, a new submit fails fast with
    OverloadedError instead of growing host memory without limit."""
    import threading as _t
    import time as _time

    from srganfd_tpu.cli.serve import OverloadedError, _MicroBatcher

    entered = _t.Event()
    release = _t.Event()

    class _StuckEngine:
        def sr_batch(self, imgs):
            entered.set()
            release.wait(timeout=30)
            return [im * 2 for im in imgs]

    mb = _MicroBatcher(_StuckEngine(), max_queue=2)
    frame = np.zeros((4, 4, 3), np.float32)

    outs = {}
    waiters = [
        _t.Thread(target=lambda i=i: outs.update({i: mb.submit(frame)}))
        for i in range(3)
    ]
    waiters[0].start()
    assert entered.wait(timeout=30)  # dispatcher now stuck inside sr_batch
    for w in waiters[1:]:
        w.start()
    for _ in range(100):  # wait for both waiters to occupy the queue
        if mb.q.full():
            break
        _time.sleep(0.02)
    assert mb.q.full()
    with pytest.raises(OverloadedError, match="queue full"):
        mb.submit(frame)
    release.set()
    for w in waiters:
        w.join(timeout=30)
    assert sorted(outs) == [0, 1, 2]  # queued requests all served after drain


def test_http_overload_503_and_body_cap(engine):
    """HTTP under flood: oversized POST bodies get 413 WITHOUT being
    read; when the bounded micro-batcher queue overflows, requests get
    503 + Retry-After; /stats counts every rejection and memory-holding
    work stays bounded at max_queue + in-flight."""
    import http.client
    import socket
    import threading as _t
    import time as _time
    import urllib.request as _url

    import cv2

    from srganfd_tpu.cli.serve import serve_http

    eng = ServingEngine("rrdbnet_x4", model_kwargs=TINY, bucket=16, batch="auto")
    eng.params = engine.params

    # gate the device call so the flood deterministically overflows the
    # tiny queue while the dispatcher is busy
    release = _t.Event()
    entered = _t.Event()
    real_sr_batch = eng.sr_batch

    def slow_sr_batch(imgs):
        entered.set()
        release.wait(timeout=60)
        return real_sr_batch(imgs)

    eng.sr_batch = slow_sr_batch

    with socket.socket() as sck:
        sck.bind(("127.0.0.1", 0))
        port = sck.getsockname()[1]
    _t.Thread(
        target=serve_http, args=(eng, port),
        kwargs={"max_body_bytes": 64 * 1024, "max_queue": 2}, daemon=True,
    ).start()
    for _ in range(200):
        try:
            with _url.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=1) as r:
                assert r.read() == b"ok"
            break
        except Exception:
            _time.sleep(0.05)
    else:
        raise AssertionError("server did not come up")

    # 1) body cap: a 128 KiB body against the 64 KiB limit -> 413
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/sr", body=b"\0" * (128 * 1024))
    r = conn.getresponse()
    assert r.status == 413
    r.read()
    conn.close()

    # 1b) a negative Content-Length must be rejected up front — not turn
    # into rfile.read(-1) blocking on the held-open connection
    with socket.create_connection(("127.0.0.1", port), timeout=30) as sck2:
        sck2.sendall(
            b"POST /sr HTTP/1.1\r\nHost: x\r\nContent-Length: -1\r\n\r\n"
        )
        first = sck2.recv(64)
    assert b"413" in first.split(b"\r\n", 1)[0], first
    with _url.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=5) as r2:
        assert r2.read() == b"ok"  # server still alive afterwards

    # 2) queue flood: 8 concurrent frames against max_queue=2
    img = (np.random.default_rng(0).uniform(0, 1, (20, 24, 3)) * 255).astype(np.uint8)
    ok_, buf = cv2.imencode(".png", img)
    assert ok_
    body = buf.tobytes()
    statuses = [None] * 8
    retry_after = []

    def post(i):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/sr", body=body)
        resp = c.getresponse()
        resp.read()
        statuses[i] = resp.status
        if resp.status == 503:
            retry_after.append(resp.getheader("Retry-After"))
        c.close()

    # deterministic sequencing (immune to CPU contention): the first
    # request is grabbed by the dispatcher and blocks inside the gated
    # sr_batch; only then do the other 7 flood in — the queue (cap 2)
    # holds 2 and the remaining 5 MUST 503 regardless of pacing, because
    # the dispatcher stays blocked until release
    threads = [_t.Thread(target=post, args=(i,)) for i in range(8)]
    threads[0].start()
    assert entered.wait(timeout=120), "dispatcher never reached sr_batch"
    for t in threads[1:]:
        t.start()
    for _ in range(600):  # wait for the 5 rejections to land
        if statuses.count(503) >= 5:
            break
        _time.sleep(0.1)
    release.set()
    for t in threads:
        t.join(timeout=180)

    served = statuses.count(200)
    rejected = statuses.count(503)
    assert served + rejected == 8, statuses
    assert served == 3 and rejected == 5, statuses
    assert all(ra == "1" for ra in retry_after)
    stats = eng.stats()
    assert stats["served"] == served
    # client-error 413s (size, neg-CL) are accounted separately from
    # genuine overload 503s (ADVICE r4)
    assert stats["rejected"] == rejected
    assert stats["rejected_oversize"] == 2
    # /stats exposes live queue headroom under --batch auto
    with _url.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r3:
        http_stats = json.loads(r3.read())
    assert http_stats["queue_capacity"] == 2
    assert 0 <= http_stats["queue_depth"] <= 2
