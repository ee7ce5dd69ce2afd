"""True multi-process data parallelism: 2 jax.distributed processes x 4
virtual CPU devices, Gloo cross-process collectives.

Until now the multi-host path was validated single-process only (virtual
8-device mesh). This test launches two REAL processes through the
production entry points — ``maybe_init_distributed`` (env triple),
``global_batch_from_host`` (per-host shard assembly), the jitted GAN
train step — and pins the result against the same two steps computed by
the same worker single-process on an 8-device mesh (identical numeric
environment): only the cross-process psum's fp reduction order may
separate them.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(local_devices: int) -> dict:
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        PYTHONPATH=str(REPO),
    )
    return env


def _parse(proc: subprocess.Popen, out: str) -> dict:
    assert proc.returncode == 0, out[-3000:]
    lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
    assert lines, out[-3000:]
    return json.loads(lines[-1][len("RESULT "):])


def test_two_process_gan_step_matches_single_process():
    # reference: the same worker, one process, 8 local devices
    ref_proc = subprocess.Popen(
        [sys.executable, str(WORKER), "unused", "0", "1"],
        env=_worker_env(8), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    ref = _parse(ref_proc, ref_proc.communicate(timeout=900)[0])

    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), addr, str(i), "2"],
            env=_worker_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for p, out in zip(procs, outs):
        r = _parse(p, out)
        results[r["proc"]] = r

    assert set(results) == {0, 1}
    # both processes observe the same replicated state
    for key in ("g_loss", "d_loss", "checksum"):
        np.testing.assert_allclose(
            results[0][key], results[1][key], rtol=1e-5, err_msg=key
        )
    # step-1 losses come from identical params + global batch: only the
    # cross-process (Gloo) vs in-process psum fp order separates them
    for key in ("g_loss", "d_loss"):
        np.testing.assert_allclose(
            results[0][key], ref[key], rtol=1e-4, err_msg=f"{key} vs reference"
        )
    # the checksum has been through two optimizer updates, which amplify
    # that fp-order noise through the GAN dynamics
    np.testing.assert_allclose(
        results[0]["checksum"], ref["checksum"], rtol=1e-3,
        err_msg="checksum vs reference",
    )


def test_two_process_run_train_cli(tmp_path):
    """The PRODUCTION training path under 2 real jax.distributed
    processes: run_train with per-process dataset sharding,
    global_batch_from_host batch assembly, process-0-only checkpoint and
    tracker writes — one epoch end-to-end, checkpoints on disk."""
    import cv2

    rng = np.random.default_rng(0)
    train_dir, valid_dir = tmp_path / "train", tmp_path / "valid"
    for d, n in ((train_dir, 8), (valid_dir, 2)):
        d.mkdir()
        for i in range(n):
            base = rng.uniform(0, 1, (12, 12, 3))
            img = cv2.resize(base, (48, 48), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(d / f"im{i}.png"), (np.clip(img, 0, 1) * 255).astype(np.uint8))
    work = tmp_path / "work"
    work.mkdir()

    addr = f"127.0.0.1:{_free_port()}"
    worker = REPO / "tests" / "mp_train_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i), str(train_dir),
             str(valid_dir), str(work)],
            env=_worker_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for p, out in zip(procs, outs):
        r = _parse(p, out)
        results[r["proc"]] = r
    assert set(results) == {0, 1}
    for r in results.values():
        assert np.isfinite(r["best_psnr"]) and r["best_psnr"] > 0

    ckpt_dir = work / "results" / "BSRGAN_x2"
    assert (ckpt_dir / "ckpt_last").exists()
    assert (ckpt_dir / "ckpt_last.meta.json").exists()
    logs = list((work / "samples" / "logs").rglob("events.jsonl"))
    assert logs and os.path.getsize(logs[0]) > 0


def test_sigterm_one_process_preempts_both(tmp_path):
    """Coordinated preemption: a SIGTERM delivered to only ONE of two
    jax.distributed processes must preempt BOTH — the un-signaled process
    would otherwise hang in the next train step's psum waiting for the
    exited peer. FlagConsensus propagates the flag; both exit 143 and the
    main process writes ckpt_preempt."""
    import cv2
    import signal
    import threading
    import time

    rng = np.random.default_rng(0)
    train_dir, valid_dir = tmp_path / "train", tmp_path / "valid"
    for d, n in ((train_dir, 8), (valid_dir, 2)):
        d.mkdir()
        for i in range(n):
            base = rng.uniform(0, 1, (12, 12, 3))
            img = cv2.resize(base, (48, 48), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(d / f"im{i}.png"), (np.clip(img, 0, 1) * 255).astype(np.uint8))
    work = tmp_path / "work"
    work.mkdir()

    addr = f"127.0.0.1:{_free_port()}"
    worker = REPO / "tests" / "mp_train_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i), str(train_dir),
             str(valid_dir), str(work), "2000"],
            env=_worker_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    bufs = [[], []]

    def _reader(p, buf):
        for line in p.stdout:
            buf.append(line)

    threads = [
        threading.Thread(target=_reader, args=(p, b), daemon=True)
        for p, b in zip(procs, bufs)
    ]
    for t in threads:
        t.start()

    # wait for the step loop to be running on process 0 (the progress
    # meter prints at step 0, right after the first jitted step returns)
    deadline = time.time() + 600
    while time.time() < deadline:
        if any("Epoch[0][" in ln for ln in bufs[0]):
            break
        for p in procs:
            assert p.poll() is None, "".join(bufs[0] + bufs[1])[-3000:]
        time.sleep(0.5)
    else:
        raise AssertionError("step loop never started:\n" + "".join(bufs[0])[-3000:])

    # signal ONLY the non-main process: the flag must travel to process 0
    # through the consensus collective, not through the OS
    procs[1].send_signal(signal.SIGTERM)
    for p, t in zip(procs, threads):
        p.wait(timeout=600)
        t.join(timeout=60)

    out0, out1 = "".join(bufs[0]), "".join(bufs[1])
    assert procs[0].returncode == 143, out0[-3000:]
    assert procs[1].returncode == 143, out1[-3000:]
    assert "preemption checkpoint written" in out0, out0[-3000:]
    ckpt_dir = work / "results" / "BSRGAN_x2"
    assert (ckpt_dir / "ckpt_preempt_last").exists()
    assert (ckpt_dir / "ckpt_preempt_last.meta.json").exists()


def _digest_pair_run(
    worker_name: str, total_devices: int, extra_args: tuple[str, ...] = ()
) -> tuple[dict, dict[int, dict]]:
    """Shared orchestration for the collective-validation workers: one
    single-process reference run over the full mesh, then the same worker
    on 2 real jax.distributed processes (half the devices each). Returns
    (ref_result, {proc: result}) after asserting the two processes'
    digests agree. Children are killed on a communicate timeout so a hung
    coordinator cannot leak the sibling process."""
    worker = REPO / "tests" / worker_name

    def _communicate(p):
        try:
            return p.communicate(timeout=900)[0]
        except subprocess.TimeoutExpired:
            p.kill()
            raise

    ref_proc = subprocess.Popen(
        [sys.executable, str(worker), "unused", "0", "1", *extra_args],
        env=_worker_env(total_devices), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    ref = _parse(ref_proc, _communicate(ref_proc))

    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i), "2", *extra_args],
            env=_worker_env(total_devices // 2), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(_communicate(p))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        r = _parse(p, out)
        results[r["proc"]] = r
    assert set(results) == {0, 1}
    assert results[0]["digest"] == results[1]["digest"], (
        "the two processes disagree on the replicated output"
    )
    return ref, results


def test_two_process_spatial_shard_ppermute():
    """Cross-process ppermute: the sp halo exchange runs on a mesh whose
    data axis spans 2 real jax.distributed processes, so the shard-3/4
    halos ride Gloo. Each worker self-asserts interior exactness vs the
    unsharded model; here the two processes' replicated outputs must be
    identical and must match the single-process run of the same worker
    (ppermute moves data without reducing, so unlike the psum tests there
    is no fp-order allowance — the outputs agree to the digest)."""
    ref, results = _digest_pair_run("mp_sp_worker.py", 8)
    np.testing.assert_allclose(results[0]["sum"], ref["sum"], rtol=1e-6)
    assert results[0]["digest"] == ref["digest"], (
        "cross-process ppermute produced different bits than the "
        "single-process mesh"
    )


def test_two_process_ring_attention_cp():
    """Cross-process context parallelism: BSRGANtrans serving via
    spatial_sharded_sr with ring attention on a 2-process mesh — the K/V
    ring's ppermute rotations cross the Gloo boundary every step. Workers
    self-assert the ring-vs-shard-local correctness property; outputs
    must be digest-identical across processes and vs the single-process
    mesh (data movement only, no reduction-order allowance)."""
    ref, results = _digest_pair_run("mp_cp_worker.py", 8, ("ring",))
    assert results[0]["digest"] == ref["digest"], (
        "cross-process K/V ring produced different bits than the "
        "single-process mesh"
    )


def test_two_process_ulysses_attention_cp():
    """Cross-process Ulysses context parallelism: BSRGANtrans serving via
    spatial_sharded_sr with cp_backend="ulysses" on a 4-device mesh (the
    4-head cap) split over 2 processes — the head-sharding all_to_all
    pair and the halo-mask all_gather cross the Gloo boundary. Workers
    self-assert the sharded-vs-unsharded property; outputs must be
    digest-identical across processes and vs the single-process mesh."""
    ref, results = _digest_pair_run("mp_cp_worker.py", 4, ("ulysses",))
    assert results[0]["digest"] == ref["digest"], (
        "cross-process all_to_all produced different bits than the "
        "single-process mesh"
    )
