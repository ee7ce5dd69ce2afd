"""Checkpoint save/restore via Orbax.

Parity target: ``save_checkpoint``/``load_state_dict``
(``ESRGAN/utils.py:30-101``): dicts of {epoch, best_psnr, best_ssim,
state_dict, ema_state_dict, optimizer, scheduler}, with best/last copies.
Here the whole GanTrainState pytree round-trips through one Orbax
checkpointer; "best"/"last" are directory names like the reference's
``g_best.pth.tar``/``g_last.pth.tar`` copies.
"""

from __future__ import annotations

import json
import os
import queue
import shutil
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

try:  # optional — live-MLflow artifact resolution for runs:/ URIs
    import mlflow as _mlflow
except Exception:  # pragma: no cover
    _mlflow = None

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "restore_into",
    "find_auto_resume",
    "resolve_checkpoint_uri",
    "AsyncCheckpointWriter",
]


def _to_host(tree: Any) -> Any:
    """Device->host copy of a state pytree, all leaves IN FLIGHT AT ONCE.

    A naive per-leaf ``np.asarray`` issues one blocking transfer per
    tensor; on a high-latency device link (the axon TPU tunnel: ~tens of
    ms per round trip) a ~2800-leaf train state then costs minutes per
    snapshot — measured 80-90 s per best-epoch checkpoint on hardware,
    4x the epoch's step work. ``copy_to_host_async`` first enqueues every
    D2H copy so the link pipelines them; the ``np.asarray`` pass then
    only waits for arrivals."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for x in leaves:
        if isinstance(x, jax.Array) and not x.is_deleted():
            try:
                x.copy_to_host_async()
            except (NotImplementedError, AttributeError):  # non-addressable etc.
                pass
    return jax.tree_util.tree_unflatten(treedef, [np.asarray(x) for x in leaves])


def _checkpointer() -> ocp.StandardCheckpointer:
    """An Orbax checkpointer scoped to THIS process.

    The training loop gates snapshot writes to process 0 (the payload is
    already host-resident numpy — fully replicated state), but Orbax's
    default ``Checkpointer`` issues cross-process sync barriers whenever
    ``jax.process_count() > 1``; with the other processes never calling
    ``save``, process 0 would deadlock on the barrier until the
    coordination service times out. Restricting ``active_processes`` to
    the caller keeps the barriers process-local (the per-process
    ``barrier_sync_key_prefix`` prevents key collisions if several
    processes restore the same path concurrently)."""
    if jax.process_count() > 1:
        idx = jax.process_index()
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=idx,
                active_processes={idx},
                barrier_sync_key_prefix=f"p{idx}",
            )
        )
    return ocp.StandardCheckpointer()


def save_checkpoint(
    directory: str,
    state: Any,
    epoch: int,
    best_metrics: dict[str, float],
    is_best: bool,
    name: str = "ckpt",
    step: int | None = None,
) -> None:
    """Write ``<dir>/<name>_last`` (always) and ``<dir>/<name>_best``
    (when ``is_best``), each a full training-state snapshot.

    Crash-safe: each target is written to a ``<target>.new`` staging dir
    (meta sidecar included) and swapped in via renames only — the previous
    snapshot is renamed aside to ``<target>.old`` and deleted last, so a
    kill at ANY point leaves at least one complete snapshot recoverable by
    the next save's sweep (observed: SIGTERM during an epoch-end best save
    destroyed the previous best and left a stale orbax tmp). The meta
    sidecar travels with its snapshot through the staging/swap, so meta
    and state can't go out of sync."""
    _write_snapshot(directory, {"state": _to_host(state)}, epoch, best_metrics, is_best, name, step)


def _write_snapshot(
    directory: str,
    payload: dict[str, Any],
    epoch: int,
    best_metrics: dict[str, float],
    is_best: bool,
    name: str = "ckpt",
    step: int | None = None,
) -> None:
    """Disk half of ``save_checkpoint``: takes an already host-resident
    payload (so an async writer can run it off-thread) and performs the
    Orbax write plus the crash-safe staging/rename swap."""
    os.makedirs(directory, exist_ok=True)
    _sweep_incomplete(directory)
    ckptr = _checkpointer()
    targets = [os.path.join(directory, f"{name}_last")]
    if is_best:
        targets.append(os.path.join(directory, f"{name}_best"))
    # scalar metadata rides a JSON sidecar: keeps the orbax tree identical
    # to the state template regardless of which metrics a config tracks
    # ``step`` = global steps APPLIED to the saved state (k-step buffering
    # can hold consumed-but-undispatched batches; the deterministic loader
    # + step-keyed degradation RNG redraw those exactly on resume), so a
    # resumed run is step-exact, not epoch-granular like the reference
    # (ESRGAN/utils.py:41-67 restores start_epoch only).
    meta = {"epoch": int(epoch), "best_metrics": {k: float(v) for k, v in best_metrics.items()}}
    if step is not None:
        meta["step"] = int(step)
    for t in targets:
        staging = os.path.abspath(t) + ".new"
        ckptr.save(staging, payload, force=True)
        ckptr.wait_until_finished()
        with open(staging + ".meta.json", "w") as f:
            json.dump(meta, f)
        old = os.path.abspath(t) + ".old"
        if os.path.exists(t):
            os.rename(t, old)
            if os.path.exists(t + ".meta.json"):
                os.replace(t + ".meta.json", old + ".meta.json")
        os.rename(staging, t)
        if os.path.exists(staging + ".meta.json"):
            os.replace(staging + ".meta.json", t + ".meta.json")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(old + ".meta.json"):
            os.remove(old + ".meta.json")


def _sweep_incomplete(directory: str) -> None:
    """Recover from a save killed mid-swap. Invariants of the swap order
    (stage ``.new`` + its meta -> rename target -> ``.old`` -> promote
    ``.new`` -> delete ``.old``): a ``.new`` dir with its meta sidecar is
    always a COMPLETE snapshot (orbax's own tmp-rename atomicity +
    ``wait_until_finished``); a ``.old`` dir is the previous complete
    snapshot. Promote the newest complete snapshot into place, then drop
    leftovers."""
    entries = set(os.listdir(directory))
    for entry in sorted(entries):
        path = os.path.join(directory, entry)
        if entry.endswith(".orbax-checkpoint-tmp"):
            shutil.rmtree(path, ignore_errors=True)
        elif entry.endswith(".new.meta.json") and entry[:-14] + ".new" not in entries:
            # crash between promoting the state dir and its sidecar: the
            # promoted snapshot owns this meta
            base = path[: -len(".new.meta.json")]
            if os.path.isdir(base) and not os.path.exists(base + ".meta.json"):
                os.replace(path, base + ".meta.json")
            else:
                os.remove(path)
        elif entry.endswith(".old.meta.json") and entry[:-14] + ".old" not in entries:
            os.remove(path)  # orphan left between rmtree(old) and its sidecar
        elif entry.endswith(".new") and os.path.isdir(path):
            base = path[:-4]
            if not os.path.exists(base) and os.path.exists(path + ".meta.json"):
                # crashed between renaming target aside and promoting the
                # staging — the staging is complete and newest: promote it
                os.rename(path, base)
                os.replace(path + ".meta.json", base + ".meta.json")
            else:
                shutil.rmtree(path, ignore_errors=True)
                if os.path.exists(path + ".meta.json"):
                    os.remove(path + ".meta.json")
        elif entry.endswith(".old") and os.path.isdir(path):
            base = path[:-4]
            if os.path.exists(base):
                shutil.rmtree(path, ignore_errors=True)
                if os.path.exists(path + ".meta.json"):
                    os.remove(path + ".meta.json")
            else:
                # crashed after renaming the target aside but with no
                # complete staging to promote: restore the previous snapshot
                os.rename(path, base)
                if os.path.exists(path + ".meta.json"):
                    os.replace(path + ".meta.json", base + ".meta.json")


def find_auto_resume(directory: str, steps_per_epoch: int) -> str | None:
    """Newest complete snapshot in ``directory`` for ``--resume auto``:
    preemptible jobs restart with the SAME command line and continue from
    whichever of ``ckpt_preempt_last`` / ``ckpt_step_last`` / ``ckpt_last``
    has the most applied steps (ties break toward the later name in that
    order — a preempt snapshot at step N supersedes an epoch save at N).
    Sweeps mid-swap leftovers first so a crash during a save never hides
    the recoverable snapshot. Returns None when nothing resumable exists
    (fresh start). The reference has no analog (resume requires manually
    pointing RESUME at a .pth.tar, ESRGAN/utils.py:41-67)."""
    if not os.path.isdir(directory):
        return None
    _sweep_incomplete(directory)
    best_path, best_key = None, None
    for rank, name in enumerate(("ckpt_last", "ckpt_step_last", "ckpt_preempt_last")):
        path = os.path.join(directory, name)
        meta_path = path + ".meta.json"
        if not (os.path.isdir(path) and os.path.exists(meta_path)):
            continue
        with open(meta_path) as f:
            meta = json.load(f)
        step = meta.get("step")
        if step is None:  # pre-step-metadata snapshot: epoch granularity
            step = (int(meta.get("epoch", 0)) + 1) * steps_per_epoch
        key = (int(step), rank)
        if best_key is None or key > best_key:
            best_path, best_key = path, key
    return best_path


def resolve_checkpoint_uri(path: str) -> str:
    """Resolve an MLflow ``runs:/<run_id>/<artifact_path>`` URI to a local
    directory — the reference's ``loadsFromMlrun`` surface
    (``BSRGAN/bsrgan_config.py:66,109-119``; models loaded from a run via
    ``mlflow.pytorch.load_model``, ``BSRGAN/train_bsrgan.py:63-80``).
    Artifacts here are Orbax snapshot dirs (or ported .npz files) logged
    by the Tracker under the reference's names (``best_g_model`` /
    ``last_g_model``).

    With a live mlflow the artifact is fetched through the tracking
    client; without one, the standard local file store
    (``$MLFLOW_TRACKING_URI`` or ``./mlruns``, laid out
    ``<experiment>/<run_id>/artifacts/<artifact>`` — exactly the paths
    the reference's config hardcodes, ``bsrgan_config.py:110-113``) is
    searched directly. Non-URI paths pass through unchanged."""
    if not path.startswith("runs:/"):
        return path
    run_id, _, artifact = path[len("runs:/") :].partition("/")
    if not run_id or not artifact:
        raise ValueError(f"malformed MLflow URI {path!r}: want runs:/<run_id>/<artifact>")
    if _mlflow is not None and hasattr(_mlflow, "artifacts"):
        return _mlflow.artifacts.download_artifacts(
            run_id=run_id, artifact_path=artifact
        )
    root = os.environ.get("MLFLOW_TRACKING_URI", "mlruns")
    for prefix in ("file://", "file:"):
        if root.startswith(prefix):
            root = root[len(prefix) :]
            break
    import glob

    hits = sorted(glob.glob(os.path.join(root, "*", run_id, "artifacts", artifact)))
    if not hits:
        raise FileNotFoundError(
            f"cannot resolve {path!r}: mlflow is not installed and no "
            f"{root}/*/{run_id}/artifacts/{artifact} exists on disk"
        )
    return hits[0]


def load_checkpoint(path: str, template: Any | None = None) -> dict[str, Any]:
    """Restore a checkpoint payload; with ``template`` the state pytree is
    restored with matching structure/dtypes (shape-filtered subsets like
    the reference's ``load_state_dict`` are handled by ``restore_into``).
    ``path`` may be an MLflow ``runs:/`` URI (resolved via
    :func:`resolve_checkpoint_uri`)."""
    path = resolve_checkpoint_uri(path)
    ckptr = _checkpointer()
    if template is not None:
        payload = ckptr.restore(os.path.abspath(path), {"state": _to_host(template)})
    else:
        payload = ckptr.restore(os.path.abspath(path))
    meta_path = os.path.abspath(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            payload = dict(payload, **json.load(f))
    else:
        payload = dict(payload, epoch=0, best_metrics={})
    return payload


class AsyncCheckpointWriter:
    """Move snapshot disk writes off the training step path.

    ``save`` captures a consistent host copy of the state NOW (the
    device->host transfer stays synchronous on the caller: the very next
    train step donates the state buffers, so the snapshot must be taken
    before dispatching it) and queues the Orbax serialization + the
    crash-safe swap of ``save_checkpoint`` to ONE worker thread. The
    single worker serializes swaps, so the on-disk protocol — and
    therefore ``_sweep_incomplete``'s recovery invariants — is exactly
    the synchronous path's. A bounded queue (default 2 pending) gives
    backpressure instead of unbounded host-RAM growth when disk IO falls
    behind the step rate. Worker errors are re-raised on the next
    ``save``/``wait``/``close`` — a checkpoint that silently never hit
    disk must not look like one that did.

    The reference has no analog (``ESRGAN/utils.py:85-101`` saves
    inline); this removes the multi-hundred-ms Orbax write from the
    step-time profile when mid-epoch snapshots (``save_every_steps``)
    are frequent.
    """

    def __init__(self, max_pending: int = 2) -> None:
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._err: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="srganfd-ckpt-writer", daemon=True
        )
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            try:
                _write_snapshot(**item)
            except BaseException as e:  # surfaced on the caller's thread
                self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def save(
        self,
        directory: str,
        state: Any,
        epoch: int,
        best_metrics: dict[str, float],
        is_best: bool,
        name: str = "ckpt",
        step: int | None = None,
    ) -> None:
        """Same signature/effect as ``save_checkpoint``; returns once the
        state is copied to host and the write is queued."""
        self._raise_pending()
        payload = {"state": _to_host(state)}
        self._q.put(
            dict(
                directory=directory,
                payload=payload,
                epoch=int(epoch),
                best_metrics={k: float(v) for k, v in best_metrics.items()},
                is_best=bool(is_best),
                name=name,
                step=step,
            )
        )

    def wait(self) -> None:
        """Block until every queued snapshot is on disk (call before
        exiting or before reading a just-written snapshot)."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        self._q.put(None)
        self._q.join()
        self._thread.join()
        self._raise_pending()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def restore_into(current: Any, loaded: Any) -> Any:
    """Shape-filtered merge (``ESRGAN/utils.py:68-77``): keep loaded leaves
    whose shapes match the current pytree, fall back to current otherwise."""
    flat_cur, treedef = jax.tree_util.tree_flatten(current)
    flat_new = jax.tree_util.tree_leaves(loaded)
    merged = [
        n if getattr(n, "shape", None) == getattr(c, "shape", None) else c
        for c, n in zip(flat_cur, flat_new)
    ]
    return jax.tree_util.tree_unflatten(treedef, merged)


def merge_by_path(current: Any, loaded: Any) -> tuple[Any, int, int]:
    """Name-and-shape-filtered merge — the reference's ``load_state_dict``
    in "pretrained" mode (``ESRGAN/utils.py:68-77``: keep checkpoint
    entries whose KEY exists in the model with the SAME shape, drop the
    rest). Unlike :func:`restore_into` this tolerates checkpoints with a
    different tree structure (extra/missing modules).

    Returns ``(merged, n_loaded, n_total)``."""
    flat_new = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }
    flat_cur, treedef = jax.tree_util.tree_flatten_with_path(current)
    merged, n_loaded = [], 0
    for kp, cur in flat_cur:
        new = flat_new.get(jax.tree_util.keystr(kp))
        if new is not None and getattr(new, "shape", None) == getattr(cur, "shape", None):
            merged.append(new)
            n_loaded += 1
        else:
            merged.append(cur)
    return jax.tree_util.tree_unflatten(treedef, merged), n_loaded, len(flat_cur)


def load_pretrained_params(
    path: str, key: str = "g_params", with_d_vars: bool = False
) -> Any:
    """Load a params pytree for pretrained initialization (the reference's
    ``pretrained_g/d_model_weights_path``, ``BSRGAN/train_bsrgan.py:60-86``).

    Accepts this framework's Orbax checkpoints (``key`` selects
    ``g_params``/``ema_g_params``/``d_params`` from the saved state) or a
    flat ``.npz`` in the ``tools/port_torch_weights.py`` layout
    ('/'-joined key paths) — i.e. a ported reference ``.pth.tar``.

    ``with_d_vars=True`` returns ``(params, d_vars_or_None)`` so a
    discriminator loaded from a native checkpoint also restores its
    mutable collections (BatchNorm running stats, spectral-norm u's)
    instead of silently keeping init statistics; npz sources carry those
    inline (the caller pops ``batch_stats``) and return ``None`` here.

    ``path`` may also be an MLflow ``runs:/<run_id>/<artifact>`` URI —
    the reference's ``loadsFromMlrun`` pretrained-model route
    (``BSRGAN/train_bsrgan.py:63-80``); it resolves to the logged Orbax
    dir (or .npz) via :func:`resolve_checkpoint_uri`."""
    path = resolve_checkpoint_uri(path)
    if path.endswith(".npz"):
        flat = np.load(path)
        tree: dict = {}
        for k in flat.files:
            node = tree
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = flat[k]
        return (tree, None) if with_d_vars else tree
    payload = load_checkpoint(path)
    state = payload["state"]
    if key not in state or state[key] is None:
        raise KeyError(f"checkpoint {path} has no '{key}'")
    if with_d_vars:
        return state[key], state.get("d_vars")
    return state[key]

def warn_if_young_ema(
    payload: dict, decay: float, reference_semantics: bool = False
) -> None:
    """``--use-ema`` on a young checkpoint silently serves a model that is
    still mostly its random init: the conventional EMA lerps from the
    initial params (PARITY.md deviation 11), so after t steps the init
    still carries decay^t of the weight. Warn when that exceeds 5%.
    Under ``ema_reference_semantics`` the EMA is ~the raw model (inverted
    lerp + first-update copy) and never young — no warning."""
    if reference_semantics:
        return
    try:
        steps = int(payload["state"]["step"])
    except Exception:  # noqa: BLE001 — missing/odd metadata
        # a checkpoint whose age is unknown is exactly the case the
        # warning exists for — say so instead of staying silent (ADVICE r4)
        print(
            "! --use-ema: checkpoint carries no step metadata, EMA age "
            "unknown — a young EMA may still be mostly its random init"
        )
        return
    init_w = float(decay) ** max(0, steps)
    if init_w > 0.05:
        print(
            f"! --use-ema: EMA decay {decay} over only {steps} steps — the "
            f"EMA still carries {init_w:.0%} of the INITIAL params; expect "
            "degraded output until ~3/(1-decay) steps (use raw weights or "
            "train longer)"
        )
