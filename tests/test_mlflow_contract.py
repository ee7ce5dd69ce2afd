"""MLflow adapter contract: a fake mlflow module records every call so the
adapter's full surface — experiment create-on-miss, unclosed-run recovery,
run resumption by id, tags/description, params truncation, metrics/images/
dicts/artifacts, end_run — executes the sequence of the reference
(``BSRGAN/train_bsrgan.py:125-143,201-230``) without a live MLflow."""


import numpy as np
import pytest

import srganfd_tpu.track.tracker as tracker_mod
from srganfd_tpu.track.tracker import Tracker


class FakeRunInfo:
    def __init__(self, run_id):
        self.run_id = run_id


class FakeRun:
    def __init__(self, run_id):
        self.info = FakeRunInfo(run_id)


class FakeMlflow:
    """Records (method, args, kwargs) tuples; configurable failures."""

    def __init__(self, fail_set_experiment=False, fail_first_start=False):
        self.calls = []
        self._fail_set = fail_set_experiment
        self._fail_first_start = fail_first_start
        self._run = None

    def _rec(self, name, *a, **k):
        self.calls.append((name, a, k))

    def set_experiment(self, name):
        self._rec("set_experiment", name)
        if self._fail_set:
            self._fail_set = False
            raise RuntimeError("no such experiment")

    def create_experiment(self, name):
        self._rec("create_experiment", name)
        return "exp-1"

    def start_run(self, run_id=None, run_name=None, tags=None, description=None):
        self._rec("start_run", run_id=run_id, run_name=run_name, tags=tags,
                  description=description)
        if self._fail_first_start:
            self._fail_first_start = False
            raise RuntimeError("Run already active")
        self._run = FakeRun(run_id or "generated-run-id")
        return self._run

    def active_run(self):
        self._rec("active_run")
        return self._run

    def end_run(self):
        self._rec("end_run")
        self._run = None

    def log_params(self, params):
        self._rec("log_params", params)

    def log_metrics(self, metrics, step=None):
        self._rec("log_metrics", metrics, step=step)

    def log_image(self, image, name):
        self._rec("log_image", name)

    def log_dict(self, payload, name):
        self._rec("log_dict", payload, name)

    def log_artifacts(self, path, name):
        self._rec("log_artifacts", path, name)


@pytest.fixture
def fake(monkeypatch):
    def install(**kw):
        m = FakeMlflow(**kw)
        monkeypatch.setattr(tracker_mod, "mlflow", m)
        return m

    return install


def _names(m):
    return [c[0] for c in m.calls]


def test_full_reference_sequence(fake, tmp_path):
    """The canonical train_bsrgan flow: set_experiment -> start_run ->
    log_params -> per-epoch log_metrics -> model artifacts -> end_run."""
    m = fake()
    t = Tracker("exp", run_name="run1", samples_dir=str(tmp_path),
                use_tensorboard=False, tags={"k": "v"}, description="desc")
    t.log_params({"g_arch_name": "bsrgan_x4", "pixel_weight": [20.0], "long": "x" * 900})
    t.log_metrics({"psnr_val": 30.0, "ssim_val": 0.9}, step=3)
    t.log_image(np.zeros((4, 4, 3), np.uint8), "SR Image")
    t.log_dict({"PSNR": 30.0}, "test_metrics.json")
    t.log_artifact_dir(str(tmp_path), "best_g_model")
    t.close()

    assert _names(m) == [
        "set_experiment", "start_run", "active_run", "log_params",
        "log_metrics", "log_image", "log_dict", "log_artifacts", "end_run",
    ]
    # start_run kwargs forwarded (tags/description like the reference's
    # mlflow.start_run(run_name=..., tags=..., description=...))
    _, _, kw = m.calls[1]
    assert kw == {"run_id": None, "run_name": "run1", "tags": {"k": "v"},
                  "description": "desc"}
    # params stringified and truncated to 500 chars (mlflow's limit)
    params = m.calls[3][1][0]
    assert params["pixel_weight"] == "[20.0]"
    assert len(params["long"]) == 500
    # metrics carry the step
    assert m.calls[4][2]["step"] == 3
    # run id surfaced for resumption
    assert t.run_id == "generated-run-id"


def test_experiment_created_when_missing(fake, tmp_path):
    """set_experiment raising -> create_experiment (+ re-set), as the
    reference's try/except at train_bsrgan.py:126-130."""
    m = fake(fail_set_experiment=True)
    Tracker("new-exp", samples_dir=str(tmp_path), use_tensorboard=False)
    assert _names(m)[:4] == [
        "set_experiment", "create_experiment", "set_experiment", "start_run",
    ]


def test_unclosed_run_recovery(fake, tmp_path):
    """start_run raising -> end_run -> start_run, as train_bsrgan.py:133-137."""
    m = fake(fail_first_start=True)
    t = Tracker("exp", samples_dir=str(tmp_path), use_tensorboard=False)
    assert _names(m)[:5] == [
        "set_experiment", "start_run", "end_run", "start_run", "active_run",
    ]
    assert t.run_id == "generated-run-id"


def test_run_resumption_by_id(fake, tmp_path):
    """run_id passed through, as test_bsrgan.py:64-68 resumes a run."""
    m = fake()
    t = Tracker("exp", run_id="abc123", samples_dir=str(tmp_path),
                use_tensorboard=False)
    assert m.calls[1][2]["run_id"] == "abc123"
    assert t.run_id == "abc123"


def test_no_mlflow_module_is_silent(monkeypatch, tmp_path):
    monkeypatch.setattr(tracker_mod, "mlflow", None)
    t = Tracker("exp", samples_dir=str(tmp_path), use_tensorboard=False)
    t.log_metrics({"a": 1.0}, 0)
    t.close()  # no error, JSONL still written
    assert t.run_id == ""


def test_train_cli_logs_model_artifacts(fake, tmp_path, monkeypatch):
    """run_train logs best/last model artifacts under the reference's
    names (train_bsrgan.py:201-214)."""
    import cv2

    from srganfd_tpu.cli.train import run_train
    from srganfd_tpu.configs import get_config

    m = fake()
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("valid", 2)]:
        d = tmp_path / split
        d.mkdir()
        for i in range(n):
            img = cv2.resize(rng.uniform(0, 1, (16, 16, 3)), (96, 96))
            cv2.imwrite(str(d / f"im{i}.png"), (np.clip(img, 0, 1) * 255).astype(np.uint8))
    monkeypatch.chdir(tmp_path)
    cfg = get_config(
        "rrdbnet",
        train_gt_images_dir=str(tmp_path / "train"),
        valid_gt_images_dir=str(tmp_path / "valid"),
        epochs=1,
        batch_size=2,
        gt_image_size=32,
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_blocks": 1},
    )
    run_train(cfg, steps_per_epoch=2)
    arts = [c for c in m.calls if c[0] == "log_artifacts"]
    names = [c[1][1] for c in arts]
    assert "best_g_model" in names and "last_g_model" in names
    assert _names(m)[-1] == "end_run"
