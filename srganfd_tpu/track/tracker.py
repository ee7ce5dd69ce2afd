"""Experiment tracking: MLflow + TensorBoard + JSONL fan-out.

Parity target (SURVEY.md §2.7/§5): the reference logs to three sinks —
MLflow (experiment/run/params/metrics/models/images, e.g.
``BSRGAN/train_bsrgan.py:125-143,201-230``; run resumption by ``run_id``
with a try/except restart ``:133-137``), TensorBoard scalars
(``ESRGAN/train_esrgan.py:91,444-453``) and the stdout ProgressMeter.

This module keeps the same metric/param/image naming surface. MLflow and
TensorBoard are optional imports (absent in this image); the JSONL sink is
always on so every run remains inspectable, and the adapters activate
automatically when the packages exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

try:  # optional
    import mlflow
except Exception:  # pragma: no cover
    mlflow = None

try:  # optional (ships with torch)
    from torch.utils.tensorboard import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class Tracker:
    """Fan-out tracker with the reference's logging vocabulary."""

    def __init__(
        self,
        experience_name: str,
        run_name: str = "",
        run_id: str = "",
        samples_dir: str = "samples",
        use_mlflow: bool = True,
        use_tensorboard: bool = True,
        tags: Any = None,
        description: str = "",
        enabled: bool = True,
    ) -> None:
        """``enabled=False`` turns every sink into a no-op — used by
        non-zero processes in multi-host training so tracker files and
        MLflow runs aren't raced/duplicated per host."""
        self.enabled = enabled
        self.dir = os.path.join(samples_dir, "logs", experience_name or "default")
        self._jsonl = None
        self._tb = None
        self._mlflow_active = False
        self.run_id = run_id
        if not enabled:
            return
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "events.jsonl"), "a")
        if use_tensorboard and SummaryWriter is not None:
            self._tb = SummaryWriter(self.dir)

        if use_mlflow and mlflow is not None:
            name = experience_name or "default"
            try:
                mlflow.set_experiment(name)
            except Exception:
                # reference creates the experiment when set fails
                # (BSRGAN/train_bsrgan.py:126-130); we additionally re-set
                # so the run lands in it rather than in Default
                mlflow.create_experiment(name)
                mlflow.set_experiment(name)
            kwargs = dict(
                run_id=run_id or None,
                run_name=run_name or None,
                tags=_normalize_tags(tags),
                description=description or None,
            )
            try:
                mlflow.start_run(**kwargs)
            except Exception:
                # reference recovers from an unclosed previous run the same
                # way (BSRGAN/train_bsrgan.py:133-137)
                mlflow.end_run()
                mlflow.start_run(**kwargs)
            run = mlflow.active_run()
            self.run_id = getattr(getattr(run, "info", None), "run_id", "") or run_id
            self._mlflow_active = True

    # -- API mirroring the reference call sites --------------------------------

    def log_params(self, params: dict[str, Any]) -> None:
        self._write({"type": "params", "params": {k: _plain(v) for k, v in params.items()}})
        if self._mlflow_active:
            mlflow.log_params({k: str(v)[:500] for k, v in params.items()})

    def log_metrics(self, metrics: dict[str, float], step: int) -> None:
        plain = {k: float(v) for k, v in metrics.items()}
        self._write({"type": "metrics", "step": step, "metrics": plain})
        if self._mlflow_active:
            mlflow.log_metrics(plain, step=step)
        if self._tb is not None:
            for k, v in plain.items():
                self._tb.add_scalar(k, v, step)

    def log_scalar(self, name: str, value: float, step: int) -> None:
        self.log_metrics({name: value}, step)

    def log_image(self, image: np.ndarray, name: str) -> None:
        """image: HWC RGB float [0,1] or uint8."""
        if not self.enabled:
            return
        path = os.path.join(self.dir, name.replace("/", "_"))
        if not path.lower().endswith((".png", ".jpg")):
            path += ".png"
        arr = image
        if arr.dtype != np.uint8:
            arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
        if cv2 is not None:
            cv2.imwrite(path, arr[..., ::-1])
        self._write({"type": "image", "name": name, "path": path})
        if self._mlflow_active:
            mlflow.log_image(image, name if "." in name else name + ".png")

    def log_dict(self, payload: dict[str, Any], name: str) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.dir, name if name.endswith(".json") else name + ".json")
        with open(path, "w") as f:
            json.dump({k: _plain(v) for k, v in payload.items()}, f, indent=2)
        if self._mlflow_active:
            mlflow.log_dict(payload, name)

    def log_artifact_dir(self, path: str, name: str) -> None:
        self._write({"type": "artifact", "name": name, "path": path})
        if self._mlflow_active:
            mlflow.log_artifacts(path, name)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._mlflow_active:
            mlflow.end_run()

    # -- internals --------------------------------------------------------------

    def _write(self, record: dict[str, Any]) -> None:
        if self._jsonl is None:
            return
        record["ts"] = time.time()
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()


def _normalize_tags(tags: Any) -> dict | None:
    """mlflow.start_run requires Dict[str, str] tags; the configs (like the
    reference's ``bsrgan_config.py:75``) declare ``tags`` as a string.
    Accept both: parse "k=v,k2=v2" strings, wrap a bare string as
    {"tag": s}, pass dicts through."""
    if not tags:
        return None
    if isinstance(tags, dict):
        return tags
    if isinstance(tags, str):
        if "=" in tags:
            pairs = (item.split("=", 1) for item in tags.split(",") if "=" in item)
            return {k.strip(): v.strip() for k, v in pairs}
        return {"tag": tags}
    return {"tag": str(tags)}


def _plain(v: Any) -> Any:
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v if isinstance(v, (int, float, str, bool, type(None))) else str(v)
