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
) -> None:
    """Write ``<dir>/<name>_last`` (always) and ``<dir>/<name>_best``
    (when ``is_best``), each a full training-state snapshot.

    Crash-safe: each target is written to a ``<target>.new`` staging dir
    first and swapped in only once complete, so a kill mid-save (observed:
    SIGTERM during an epoch-end best save destroyed the previous best and
    left a stale orbax tmp) can never lose the previous snapshot; the
    JSON meta sidecar is written per target immediately after its swap so
    meta and state can't go out of sync across targets."""
    os.makedirs(directory, exist_ok=True)
    # sweep incomplete writes from prior crashes (orbax tmps are never valid)
    for entry in os.listdir(directory):
        if entry.endswith(".orbax-checkpoint-tmp") or entry.endswith(".new"):
            shutil.rmtree(os.path.join(directory, entry), ignore_errors=True)
    payload = {"state": _to_host(state)}
    ckptr = ocp.StandardCheckpointer()
    targets = [os.path.join(directory, f"{name}_last")]
    if is_best:
        targets.append(os.path.join(directory, f"{name}_best"))
    # scalar metadata rides a JSON sidecar: keeps the orbax tree identical
    # to the state template regardless of which metrics a config tracks
    meta = {"epoch": int(epoch), "best_metrics": {k: float(v) for k, v in best_metrics.items()}}
    for t in targets:
        staging = os.path.abspath(t) + ".new"
        ckptr.save(staging, payload, force=True)
        ckptr.wait_until_finished()
        if os.path.exists(t):
            shutil.rmtree(t)
        os.rename(staging, t)
        with open(t + ".meta.json", "w") as f:
            json.dump(meta, f)


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
