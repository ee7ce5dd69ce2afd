"""Pipeline-parallel (pp) trunk vs the sequential model: forward and
gradient exactness on the virtual 8-device CPU mesh, including the
padded-stage path (the flagship's 23-block trunk is prime) and the
composed (data, pipe) mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.models import create_model
from srganfd_tpu.parallel import make_mesh
from srganfd_tpu.parallel.pipeline import (
    pad_stages,
    pipelined_generator_apply,
    pipelined_trunk_apply,
    split_trunk_params,
)


def _tiny_model(**kw):
    return create_model(
        "bsrgan_x2", channels=8, growth_channels=4, num_rrdb=5,
        scan_blocks=True, **kw
    )


def _init(model, batch=4, size=8, seed=0):
    lr = jnp.asarray(
        np.random.default_rng(seed).uniform(size=(batch, size, size, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), lr)["params"]
    return params, lr


def test_pipelined_trunk_matches_sequential(eight_devices):
    """5 blocks over 4 stages (padded slot skipped) == the scan trunk."""
    from srganfd_tpu.models.blocks import RRDB

    mesh = make_mesh((4,), ("pipe",), devices=eight_devices[:4])
    model = _tiny_model()
    params, lr = _init(model)
    _, stacked = split_trunk_params(params)
    padded, mask = pad_stages(stacked, 4)
    assert int(mask.sum()) == 5 and mask.shape[0] == 8

    block = RRDB(8, 4, jnp.float32)
    block_apply = lambda p, h: block.apply({"params": p}, h)

    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(4, 8, 8, 8)).astype(np.float32)
    )
    # sequential reference: apply the 5 real blocks in order
    want = x
    for i in range(5):
        p_i = jax.tree_util.tree_map(lambda a: a[i], stacked)
        want = block_apply(p_i, want)

    got = jax.jit(
        lambda s, z: pipelined_trunk_apply(
            block_apply, s, mask, z, mesh, microbatches=2
        )
    )(padded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


def test_pipelined_generator_forward_and_grads(eight_devices):
    """Full generator forward + L1 grads through the pipelined schedule
    match the unsharded model (autodiff transposes the ppermute ring)."""
    mesh = make_mesh((4,), ("pipe",), devices=eight_devices[:4])
    model = _tiny_model()
    params, lr = _init(model)
    apply_fn, nontrunk, padded, mask = pipelined_generator_apply(mesh=mesh, model=model, params=params)

    sr_ref = model.apply({"params": params}, lr)
    sr_pp = jax.jit(apply_fn)(nontrunk, padded, lr)
    np.testing.assert_allclose(np.asarray(sr_pp), np.asarray(sr_ref), atol=1e-6, rtol=1e-6)

    gt = jnp.ones_like(sr_ref) * 0.5

    def loss_ref(p):
        return jnp.mean(jnp.abs(model.apply({"params": p}, lr) - gt))

    def loss_pp(ntp, tsk):
        return jnp.mean(jnp.abs(apply_fn(ntp, tsk, lr) - gt))

    g_ref = jax.grad(loss_ref)(params)
    g_nt, g_tr = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(nontrunk, padded)

    # non-trunk grads match leaf-for-leaf
    ref_nt = {k: v for k, v in g_ref.items() if k != "ScanRRDB"}
    nt_by_path = dict(jax.tree_util.tree_leaves_with_path(g_nt))
    ref_nt_leaves = jax.tree_util.tree_leaves_with_path(ref_nt)
    assert len(ref_nt_leaves) == len(nt_by_path) > 0
    for path, a in ref_nt_leaves:
        np.testing.assert_allclose(
            np.asarray(nt_by_path[path]), np.asarray(a), atol=1e-5, rtol=1e-4
        )

    # trunk grads: first 5 slots match the scan grads, padded slots are zero
    ref_tr = g_ref["ScanRRDB"]["RRDB_0"]
    got_by_path = dict(jax.tree_util.tree_leaves_with_path(g_tr))
    for path, a in jax.tree_util.tree_leaves_with_path(ref_tr):
        b = np.asarray(got_by_path[path])
        np.testing.assert_allclose(b[:5], np.asarray(a), atol=1e-5, rtol=1e-4)
        assert np.all(b[5:] == 0.0)


def test_pipeline_composes_with_data_parallelism(eight_devices):
    """(data=2, pipe=4) mesh: batch-sharded pipelined forward matches."""
    mesh = make_mesh((2, 4), ("data", "pipe"), devices=eight_devices)
    model = _tiny_model()
    params, lr = _init(model, batch=8)
    apply_fn, nontrunk, padded, mask = pipelined_generator_apply(
        mesh=mesh, model=model, params=params, batch_axis="data", microbatches=2
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    lr_sharded = jax.device_put(lr, NamedSharding(mesh, P("data")))
    sr_ref = model.apply({"params": params}, lr)
    sr_pp = jax.jit(apply_fn)(nontrunk, padded, lr_sharded)
    np.testing.assert_allclose(np.asarray(sr_pp), np.asarray(sr_ref), atol=1e-6, rtol=1e-6)


def test_trainer_pipe_mesh_step_matches_plain(eight_devices):
    """Full GAN train step with a (data, pipe) mesh Trainer == the plain
    Trainer's step (params stay one full tree; the pp split is internal),
    and batch-1 eval falls back to the sequential trunk."""
    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        compute_dtype="float32",
        content_weight=(),
        g_kwargs={
            "channels": 8, "growth_channels": 4, "num_rrdb": 5,
            "scan_blocks": True,
        },
        mesh_shape=(2, 4),
        mesh_axes=("data", "pipe"),
        pipeline_microbatches=2,
    )
    mesh = make_mesh((2, 4), ("data", "pipe"), devices=eight_devices)
    rng = np.random.default_rng(7)
    sf = cfg.upscale_factor
    gt = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)).astype(np.float32))
    lr = gt[:, ::sf, ::sf, :]

    tr_ref = Trainer(cfg, steps_per_epoch=10)
    tr_pp = Trainer(cfg, steps_per_epoch=10, mesh=mesh)

    # identical init; separate states (train_step donates its input)
    s_ref = tr_ref.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    s_pp = tr_pp.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    s_ref, m_ref = tr_ref.train_step(s_ref, gt, lr)
    s_pp, m_pp = tr_pp.train_step(s_pp, gt, lr)

    for key in ("g_loss", "d_loss", "pixel_loss"):
        np.testing.assert_allclose(
            float(m_pp[key]), float(m_ref[key]), atol=1e-5, rtol=1e-5
        )
    got = dict(jax.tree_util.tree_leaves_with_path(s_pp.g_params))
    for path, a in jax.tree_util.tree_leaves_with_path(s_ref.g_params):
        np.testing.assert_allclose(
            np.asarray(got[path]), np.asarray(a), atol=1e-5, rtol=1e-4
        )

    # batch-1 eval: 1 % microbatches != 0 -> sequential fallback, same output
    one = lr[:1]
    np.testing.assert_allclose(
        np.asarray(tr_pp.eval_sr(s_pp.g_params, one)),
        np.asarray(tr_ref.eval_sr(s_ref.g_params, one)),
        atol=1e-5,
        rtol=1e-5,
    )

    # misconfiguration: pipe axis without the scanned trunk layout
    bad = cfg.replace(g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 5})
    try:
        Trainer(bad, steps_per_epoch=10, mesh=mesh)
        raise AssertionError("expected ValueError for unscanned trunk")
    except ValueError as e:
        assert "scan_blocks" in str(e)


def test_pipelined_bsrgantrans_forward(eight_devices):
    """The transformer-bottleneck family accepts the pp hook too."""
    mesh = make_mesh((4,), ("pipe",), devices=eight_devices[:4])
    model = create_model(
        "bsrgantrans_x2", channels=8, growth_channels=4, num_rrdb=3,
        scan_blocks=True,
    )
    params, lr = _init(model, batch=4, size=8)
    apply_fn, nontrunk, padded, _ = pipelined_generator_apply(
        model, params, mesh, microbatches=2
    )
    sr_ref = model.apply({"params": params}, lr)
    sr_pp = jax.jit(apply_fn)(nontrunk, padded, lr)
    np.testing.assert_allclose(np.asarray(sr_pp), np.asarray(sr_ref), atol=1e-6, rtol=1e-6)


def test_pad_stages_divisible_is_identity():
    stacked = {"k": jnp.arange(12.0).reshape(4, 3)}
    padded, mask = pad_stages(stacked, 4)
    assert padded["k"].shape == (4, 3) and bool(mask.all())


def test_pipelined_full_apply_matches_sequential(eight_devices):
    """The whole-tree form (the Trainer's path): split/pad inside the
    trace, output identical to the unsharded model."""
    from srganfd_tpu.parallel.pipeline import pipelined_full_apply

    mesh = make_mesh((4,), ("pipe",), devices=eight_devices[:4])
    model = _tiny_model()
    params, lr = _init(model)
    apply_fn = pipelined_full_apply(model, mesh, microbatches=2)
    sr_ref = model.apply({"params": params}, lr)
    sr_pp = jax.jit(apply_fn)(params, lr)
    np.testing.assert_allclose(np.asarray(sr_pp), np.asarray(sr_ref), atol=1e-6, rtol=1e-6)
