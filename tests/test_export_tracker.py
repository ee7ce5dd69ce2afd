"""Export round-trip (StableHLO serialize -> deserialize -> call) and the
JSONL tracker sink."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_export_roundtrip(tmp_path):
    from srganfd_tpu.models import create_model

    model = create_model("rrdbnet_x2", channels=8, growth_channels=4, num_blocks=1)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def serve(p, lr):
        return model.apply({"params": p}, lr)

    exported = jax.export.export(jax.jit(serve))(
        jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, jnp.float32), params),
        jax.ShapeDtypeStruct((1, 8, 8, 3), jnp.float32),
    )
    blob = exported.serialize()
    assert len(blob) > 1000

    reloaded = jax.export.deserialize(blob)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    want = serve(params, lr)
    got = reloaded.call(params, lr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_jsonl_tracker(tmp_path):
    from srganfd_tpu.track.tracker import Tracker

    t = Tracker("exp", samples_dir=str(tmp_path), use_mlflow=False, use_tensorboard=False)
    t.log_params({"lr": 1e-4, "arch": "bsrgan_x2"})
    t.log_metrics({"Train/g_loss": 0.5}, step=1)
    t.log_image(np.zeros((8, 8, 3), np.float32), "sample")
    t.log_dict({"PSNR": 30.0}, "metrics")
    t.close()

    events_path = os.path.join(str(tmp_path), "logs", "exp", "events.jsonl")
    lines = [json.loads(l) for l in open(events_path)]
    kinds = {l["type"] for l in lines}
    assert {"params", "metrics", "image"} <= kinds
    assert os.path.exists(os.path.join(str(tmp_path), "logs", "exp", "metrics.json"))


def test_tracker_disabled_is_noop(tmp_path):
    """enabled=False (non-zero processes in multi-host training) must not
    create files or raise from any logging call."""
    from srganfd_tpu.track.tracker import Tracker

    t = Tracker("exp2", samples_dir=str(tmp_path), enabled=False)
    t.log_params({"lr": 1e-4})
    t.log_metrics({"Train/g_loss": 0.5}, step=1)
    t.log_image(np.zeros((4, 4, 3), np.float32), "sample")
    t.log_dict({"PSNR": 30.0}, "metrics")
    t.log_artifact_dir(str(tmp_path), "best_g_model")
    t.close()
    assert not os.path.exists(os.path.join(str(tmp_path), "logs", "exp2"))


def test_normalize_tags():
    """mlflow.start_run needs Dict[str,str]; configs (like the reference's
    bsrgan_config.py:75) declare tags as a string."""
    from srganfd_tpu.track.tracker import _normalize_tags

    assert _normalize_tags("") is None
    assert _normalize_tags(None) is None
    assert _normalize_tags({"a": "b"}) == {"a": "b"}
    assert _normalize_tags("ablation") == {"tag": "ablation"}
    assert _normalize_tags("k=v, k2 = v2") == {"k": "v", "k2": "v2"}
