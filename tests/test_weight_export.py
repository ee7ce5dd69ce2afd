"""Reverse weight export (Flax -> reference torch format): exported
checkpoints must drive the reference topology to the same outputs, and
port->export must be an exact round trip."""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
import export_torch_weights as export  # noqa: E402
import port_torch_weights as port  # noqa: E402

from srganfd_tpu.models import create_model  # noqa: E402
from srganfd_tpu.models.blocks import stack_trunk_params  # noqa: E402
from test_generator_arch_parity import _TorchRRDBNetX4  # noqa: E402


def test_exported_generator_matches_in_torch_twin():
    """Our randomly-initialized Flax generator, exported, must produce the
    same SR output from the reference RRDBNet topology in torch."""
    model = create_model("rrdbnet_x4", channels=8, growth_channels=4, num_blocks=2)
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(1, 12, 12, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(lr))["params"]
    want = np.asarray(model.apply({"params": params}, jnp.asarray(lr)))

    sd = export.export_rrdb_generator(jax.tree_util.tree_map(np.asarray, params))
    tmodel = _TorchRRDBNetX4(ch=8, gc=4, nb=2).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    with torch.no_grad():
        got = tmodel(torch.from_numpy(np.moveaxis(lr, -1, 1))).numpy()
    np.testing.assert_allclose(np.moveaxis(got, 1, -1), want, atol=3e-5, rtol=1e-4)


def test_export_handles_scanned_trunk():
    model = create_model("rrdbnet_x4", channels=8, growth_channels=4, num_blocks=2)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 3)))["params"]
    flat = jax.tree_util.tree_map(np.asarray, params)
    stacked = stack_trunk_params(flat, 2)
    sd_a = export.export_rrdb_generator(flat)
    sd_b = export.export_rrdb_generator(stacked)
    assert sorted(sd_a) == sorted(sd_b)
    for k in sd_a:
        np.testing.assert_array_equal(sd_a[k], sd_b[k])


def test_port_export_round_trip_identity():
    """torch-style dict -> port -> export must reproduce every tensor."""
    rng = np.random.default_rng(3)
    ch, gc, nb = 8, 4, 2

    def conv(prefix, cin, cout):
        return {
            f"{prefix}.weight": rng.normal(size=(cout, cin, 3, 3)).astype(np.float32),
            f"{prefix}.bias": rng.normal(size=cout).astype(np.float32),
        }

    sd = {}
    sd.update(conv("conv1", 3, ch))
    for i in range(nb):
        for j in range(3):
            for k in range(5):
                sd.update(
                    conv(
                        f"trunk.{i}.rdb{j + 1}.conv{k + 1}",
                        ch + gc * k,
                        gc if k < 4 else ch,
                    )
                )
    sd.update(conv("conv2", ch, ch))
    sd.update(conv("upsampling1.0", ch, ch))
    sd.update(conv("upsampling2.0", ch, ch))
    sd.update(conv("conv3.0", ch, ch))
    sd.update(conv("conv4", ch, 3))

    back = export.export_rrdb_generator(port.convert_rrdb_generator(sd, num_blocks=nb))
    assert sorted(back) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_unet_discriminator_export_round_trip():
    rng = np.random.default_rng(4)
    c = 16

    def conv(prefix, cin, cout, k=3, bias=True, sn=False):
        key = f"{prefix}.weight_orig" if sn else f"{prefix}.weight"
        d = {key: rng.normal(size=(cout, cin, k, k)).astype(np.float32)}
        if bias:
            d[f"{prefix}.bias"] = np.zeros(cout, np.float32)
        return d

    sd = {}
    sd.update(conv("conv1", 3, c))
    chans = [(c, c * 2), (c * 2, c * 4), (c * 4, c * 8),
             (c * 8, c * 4), (c * 4, c * 2), (c * 2, c), (c, c), (c, c)]
    for name, (ci, co) in zip(
        ["down_block1.0", "down_block2.0", "down_block3.0",
         "up_block1.0", "up_block2.0", "up_block3.0", "conv2.0", "conv3.0"],
        chans,
    ):
        sd.update(conv(name, ci, co, bias=False, sn=True))
    sd.update(conv("conv4", c, 1))

    back = export.export_unet_discriminator(port.convert_unet_discriminator(sd))
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v)
    # SN triplet present and sigma-normalized: ||weight||_2 == 1
    w = back["down_block1.0.weight"].reshape(back["down_block1.0.weight"].shape[0], -1)
    assert abs(np.linalg.norm(w, 2) - 1.0) < 1e-4


def test_load_params_from_orbax_ckpt(tmp_path):
    """The documented primary usage — ``--ckpt <orbax dir>`` — must find
    params under payload["state"] with the real GanTrainState field names
    (g_params / ema_g_params / d_params); round 2 shipped with a lookup at
    the payload top level that failed on every checkpoint."""
    import argparse

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train import checkpoint as ckpt
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("rrdbnet").replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_blocks": 1},
    )
    tr = Trainer(cfg, steps_per_epoch=2)
    gt = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 16, 16, 3)).astype(np.float32))
    state = tr.init_state(jax.random.PRNGKey(0), gt[:, ::4, ::4, :].shape, gt.shape)
    ckpt.save_checkpoint(str(tmp_path), state, epoch=0, best_metrics={}, is_best=False)

    def args(**kw):
        base = dict(npz="", ckpt=str(tmp_path / "ckpt_last"),
                    use_ema=False, discriminator=False)
        base.update(kw)
        return argparse.Namespace(**base)

    got = export.load_params(args())
    want = jax.tree_util.tree_map(np.asarray, state.g_params)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), b)

    ema = export.load_params(args(use_ema=True))
    assert jax.tree_util.tree_structure(ema) == jax.tree_util.tree_structure(want)

    # the exported dict must drive the torch twin (end-to-end --ckpt flow)
    sd = export.export_rrdb_generator(jax.tree_util.tree_map(np.asarray, got))
    tmodel = _TorchRRDBNetX4(ch=8, gc=4, nb=1).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected


def test_bsrgantrans_export_refused(tmp_path, monkeypatch):
    """bsrgantrans_* must be refused by main(), not silently mis-exported
    through the RRDB name map (its transformer bottleneck has no torch
    counterpart there; "bsrgantrans" startswith "bsrgan")."""
    npz = tmp_path / "p.npz"
    np.savez(npz, **{"Conv_0.kernel": np.zeros((3, 3, 3, 8), np.float32)})
    monkeypatch.setattr(
        sys, "argv",
        ["export_torch_weights.py", "--arch", "bsrgantrans_x2",
         "--npz", str(npz), "--out", str(tmp_path / "o.pth")],
    )
    with pytest.raises(SystemExit, match="bsrgantrans"):
        export.main()
