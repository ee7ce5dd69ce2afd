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
    ) -> None:
        self.dir = os.path.join(samples_dir, "logs", experience_name or "default")
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "events.jsonl"), "a")

        self._tb = None
        if use_tensorboard and SummaryWriter is not None:
            self._tb = SummaryWriter(self.dir)

        self._mlflow_active = False
        self.run_id = run_id
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
                tags=tags or None,
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
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._mlflow_active:
            mlflow.end_run()

    # -- internals --------------------------------------------------------------

    def _write(self, record: dict[str, Any]) -> None:
        record["ts"] = time.time()
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()


def _plain(v: Any) -> Any:
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v if isinstance(v, (int, float, str, bool, type(None))) else str(v)
