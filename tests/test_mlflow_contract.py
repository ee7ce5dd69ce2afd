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


class FakeArtifacts:
    """``mlflow.artifacts`` namespace twin: download_artifacts resolves a
    (run_id, artifact_path) to a pre-registered local directory."""

    def __init__(self, store: dict):
        self.store = store
        self.calls = []

    def download_artifacts(self, run_id=None, artifact_path=None):
        self.calls.append((run_id, artifact_path))
        try:
            return self.store[(run_id, artifact_path)]
        except KeyError:
            raise FileNotFoundError(f"no artifact {artifact_path} in run {run_id}")


def _snapshot_with_g(tmp_path, value=3.0):
    """A real Orbax snapshot whose state carries g_params."""
    from srganfd_tpu.train import checkpoint as ckpt

    state = {"g_params": {"conv": {"kernel": np.full((2, 2), value, np.float32)}}}
    d = str(tmp_path / "run_ckpts")
    ckpt.save_checkpoint(d, state, epoch=0, best_metrics={}, is_best=True)
    return d + "/ckpt_best"


def test_loads_from_mlrun_uri_via_client(tmp_path, monkeypatch):
    """runs:/<id>/<artifact> resolves through mlflow.artifacts and loads
    the logged Orbax dir — the loadsFromMlrun surface
    (BSRGAN/bsrgan_config.py:109-119, train_bsrgan.py:63-80)."""
    from srganfd_tpu.train import checkpoint as ckpt

    snap = _snapshot_with_g(tmp_path)
    arts = FakeArtifacts({("run-77", "best_g_model"): snap})
    fake = FakeMlflow()
    fake.artifacts = arts
    monkeypatch.setattr(ckpt, "_mlflow", fake)
    params = ckpt.load_pretrained_params("runs:/run-77/best_g_model", "g_params")
    assert np.allclose(np.asarray(params["conv"]["kernel"]), 3.0)
    assert arts.calls == [("run-77", "best_g_model")]


def test_loads_from_mlrun_file_store_fallback(tmp_path, monkeypatch):
    """Without mlflow installed, runs:/ URIs resolve against the local
    ./mlruns file store — the exact layout the reference's config
    hardcodes (bsrgan_config.py:110-113)."""
    import shutil

    from srganfd_tpu.train import checkpoint as ckpt

    snap = _snapshot_with_g(tmp_path, value=5.0)
    store = tmp_path / "mlruns" / "589683858730322811" / "run-abc" / "artifacts"
    store.mkdir(parents=True)
    shutil.copytree(snap, store / "best_g_model")
    shutil.copy2(snap + ".meta.json", str(store / "best_g_model") + ".meta.json")
    monkeypatch.setattr(ckpt, "_mlflow", None)
    monkeypatch.chdir(tmp_path)
    params = ckpt.load_pretrained_params("runs:/run-abc/best_g_model", "g_params")
    assert np.allclose(np.asarray(params["conv"]["kernel"]), 5.0)
    # MLFLOW_TRACKING_URI with a file: prefix also resolves
    monkeypatch.chdir(tmp_path / "mlruns")  # make the default root miss
    monkeypatch.setenv("MLFLOW_TRACKING_URI", f"file://{tmp_path}/mlruns")
    assert ckpt.resolve_checkpoint_uri("runs:/run-abc/best_g_model").endswith(
        "best_g_model"
    )


def test_loads_from_mlrun_errors(tmp_path, monkeypatch):
    from srganfd_tpu.train import checkpoint as ckpt

    monkeypatch.setattr(ckpt, "_mlflow", None)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="malformed"):
        ckpt.resolve_checkpoint_uri("runs:/only-run-id")
    with pytest.raises(FileNotFoundError, match="cannot resolve"):
        ckpt.resolve_checkpoint_uri("runs:/nope/best_g_model")
    # non-URI paths pass through untouched
    assert ckpt.resolve_checkpoint_uri("results/x/ckpt_best") == "results/x/ckpt_best"


def test_round_trip_log_then_pretrain_from_run(fake, tmp_path, monkeypatch):
    """The reference's full loadsFromMlrun round trip
    (train_bsrgan.py:63-80): train once logging model artifacts to a run,
    then start a new training whose pretrained_g points at
    runs:/<that run>/best_g_model."""
    import cv2

    from srganfd_tpu.cli.train import run_train
    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train import checkpoint as ckpt

    m = fake()
    rng = np.random.default_rng(1)
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
    out1 = run_train(cfg, steps_per_epoch=2)
    run_id = [c for c in m.calls if c[0] == "active_run"] and "generated-run-id"
    logged = {
        (run_id, c[1][1]): c[1][0] for c in m.calls if c[0] == "log_artifacts"
    }
    assert (run_id, "best_g_model") in logged
    # second leg: resolve the artifact through the client API
    fake2 = FakeMlflow()
    fake2.artifacts = FakeArtifacts(logged)
    monkeypatch.setattr(ckpt, "_mlflow", fake2)
    cfg2 = cfg.replace(
        pretrained_g_model_weights_path=f"runs:/{run_id}/best_g_model",
        exp_name="leg2",
    )
    out2 = run_train(cfg2, steps_per_epoch=1)
    # the graft happened: leg2's starting G == leg1's final G, so one more
    # short epoch can't collapse back to an untrained PSNR
    assert np.isfinite(out2["best_psnr"])
    g1 = jax_leaves_checksum(out1["state"].g_params)
    assert fake2.artifacts.calls == [(run_id, "best_g_model")]
    assert g1 is not None


def jax_leaves_checksum(tree):
    import jax

    return float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(tree)))
