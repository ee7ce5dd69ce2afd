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
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "restore_into"]


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


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
    os.makedirs(directory, exist_ok=True)
    _sweep_incomplete(directory)
    payload = {"state": _to_host(state)}
    ckptr = ocp.StandardCheckpointer()
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


def load_checkpoint(path: str, template: Any | None = None) -> dict[str, Any]:
    """Restore a checkpoint payload; with ``template`` the state pytree is
    restored with matching structure/dtypes (shape-filtered subsets like
    the reference's ``load_state_dict`` are handled by ``restore_into``)."""
    ckptr = ocp.StandardCheckpointer()
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
