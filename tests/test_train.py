"""Train-step smoke tests: generator-only and both GAN orderings, plus
data-parallel execution on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.configs import get_config
from srganfd_tpu.parallel import make_mesh, shard_batch
from srganfd_tpu.train.loop import Trainer
from srganfd_tpu.train.state import GanTrainState


def _tiny(cfg, **kw):
    return cfg.replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, **cfg.g_kwargs},
        d_kwargs={**cfg.d_kwargs},
        **kw,
    )


def _batch(rng, n, gt_size, sf):
    gt = rng.uniform(size=(n, gt_size, gt_size, 3)).astype(np.float32)
    lr = gt[:, ::sf, ::sf, :]
    return jnp.asarray(gt), jnp.asarray(lr)


def test_generator_only_step_decreases_loss():
    cfg = _tiny(get_config("rrdbnet"))
    cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, "num_blocks": 1}, model_lr=1e-3)
    tr = Trainer(cfg, steps_per_epoch=10)
    gt, lr = _batch(np.random.default_rng(0), 2, 32, 4)
    state = tr.init_state(jax.random.PRNGKey(0), lr.shape, gt.shape)
    losses = []
    for _ in range(4):
        state, metrics = tr.train_step(state, gt, lr)
        losses.append(float(metrics["pixel_loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4


def test_esrgan_gan_step_runs():
    cfg = _tiny(get_config("esrgan"))
    cfg = cfg.replace(
        g_kwargs={**cfg.g_kwargs, "num_blocks": 1},
        content_weight=(),  # VGG off for speed; adversarial path is the target
        gt_image_size=128,
    )
    tr = Trainer(cfg, steps_per_epoch=10)
    gt, lr = _batch(np.random.default_rng(1), 2, 128, 4)
    state = tr.init_state(jax.random.PRNGKey(1), lr.shape, gt.shape)
    state, metrics = tr.train_step(state, gt, lr)
    for key in ("pixel_loss", "adversarial_loss", "d_loss", "d_gt_probability", "d_sr_probability"):
        assert key in metrics and np.isfinite(float(metrics[key])), key
    # VGG-D batch_stats must have updated
    assert state.d_vars and "batch_stats" in state.d_vars


def test_bsrgan_d_first_step_runs():
    cfg = _tiny(get_config("bsrgan"))
    cfg = cfg.replace(
        g_kwargs={**cfg.g_kwargs, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=32,
    )
    tr = Trainer(cfg, steps_per_epoch=10)
    gt, lr = _batch(np.random.default_rng(2), 2, 32, 2)
    state = tr.init_state(jax.random.PRNGKey(2), lr.shape, gt.shape)
    s0_spectral = jax.tree_util.tree_leaves(state.d_vars["spectral"])[0].copy()
    state, metrics = tr.train_step(state, gt, lr)
    assert np.isfinite(float(metrics["g_loss"]))
    s1_spectral = jax.tree_util.tree_leaves(state.d_vars["spectral"])[0]
    assert not np.allclose(np.asarray(s0_spectral), np.asarray(s1_spectral))


def test_fused_d_forward_matches_reference_split():
    """The concatenated real|fake D forward must match the reference's two
    separate forwards up to the one-fewer-power-iteration divergence
    (PARITY.md item 6): same losses/grads to ~1e-4 after one step."""
    cfg = _tiny(get_config("bsrgan"))
    cfg = cfg.replace(
        g_kwargs={**cfg.g_kwargs, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=32,
    )
    gt, lr = _batch(np.random.default_rng(5), 2, 32, 2)
    outs = {}
    for fuse in (True, False):
        tr = Trainer(cfg.replace(fuse_d_forwards=fuse), steps_per_epoch=10)
        state = tr.init_state(jax.random.PRNGKey(5), lr.shape, gt.shape)
        state, metrics = tr.train_step(state, gt, lr)
        outs[fuse] = (metrics, state)
    for k in ("d_loss", "g_loss", "d_gt_probability", "d_sr_probability"):
        np.testing.assert_allclose(
            float(outs[True][0][k]), float(outs[False][0][k]), rtol=2e-3, atol=2e-4
        )
    da = jax.tree_util.tree_leaves(outs[True][1].d_params)
    db = jax.tree_util.tree_leaves(outs[False][1].d_params)
    for a, b in zip(da, db):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4)


def test_ema_tracks_params():
    cfg = _tiny(get_config("rrdbnet"))
    cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, "num_blocks": 1}, model_ema_decay=0.5)
    tr = Trainer(cfg, steps_per_epoch=10)
    gt, lr = _batch(np.random.default_rng(3), 1, 16, 4)
    state = tr.init_state(jax.random.PRNGKey(3), lr.shape, gt.shape)
    state, _ = tr.train_step(state, gt, lr)
    g0 = jax.tree_util.tree_leaves(state.g_params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(e0))  # ema lags params


def test_data_parallel_step_on_mesh(eight_devices):
    mesh = make_mesh(devices=eight_devices)
    cfg = _tiny(get_config("rrdbnet"))
    cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, "num_blocks": 1})
    tr = Trainer(cfg, steps_per_epoch=10)
    gt_h = np.random.default_rng(4).uniform(size=(8, 16, 16, 3)).astype(np.float32)
    lr_h = gt_h[:, ::4, ::4, :]
    state = tr.init_state(jax.random.PRNGKey(4), lr_h.shape, gt_h.shape)
    batch = shard_batch({"gt": gt_h, "lr": lr_h}, mesh)
    assert len(batch["gt"].sharding.device_set) == 8
    state, metrics = tr.train_step(state, batch["gt"], batch["lr"])
    assert np.isfinite(float(metrics["pixel_loss"]))
    # parameters stay replicated: the update must be identical on devices
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_skip_nonfinite_updates_guard():
    """A poisoned (NaN) batch must leave params bit-identical with the
    guard on; without it the params are destroyed. Reference has no such
    protection (a NaN loss poisons torch params silently)."""
    base = _tiny(get_config("rrdbnet"))
    gt, lr = _batch(np.random.default_rng(5), 2, 16, 4)
    # poison the INPUT: a NaN in gt alone can yield finite grads (the
    # output clamp zero-masks saturated pixels), but a NaN input floods
    # the forward, so every grad leaf is nonfinite.
    lr = lr.at[0, 0, 0, 0].set(jnp.nan)

    def step(cfg):
        tr = Trainer(cfg, steps_per_epoch=10)
        state = tr.init_state(jax.random.PRNGKey(5), lr.shape, gt.shape)
        before = jax.tree_util.tree_map(np.asarray, state.g_params)
        state, metrics = tr.train_step(state, gt, lr)
        return before, jax.tree_util.tree_map(np.asarray, state.g_params), metrics

    cfg_g = base.replace(
        g_kwargs={**base.g_kwargs, "num_blocks": 1}, skip_nonfinite_updates=True
    )
    before, after, metrics = step(cfg_g)
    assert not np.isfinite(float(metrics["pixel_loss"]))  # loss IS nan...
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)  # ...but params are untouched

    cfg_bad = base.replace(g_kwargs={**base.g_kwargs, "num_blocks": 1})
    _, after_bad, _ = step(cfg_bad)
    assert any(
        not np.isfinite(l).all() for l in jax.tree_util.tree_leaves(after_bad)
    )  # without the guard the NaN propagates into params


def test_skip_nonfinite_guard_protects_ema_and_d_vars():
    """The guard must freeze EVERYTHING a poisoned step touches: not just
    params/opt-state, but also the EMA twin and the discriminator's
    mutable collections (spectral-norm u / batch stats) — a NaN forward
    would otherwise poison d_vars permanently even with an optimizer-level
    guard like optax.apply_if_finite. Finite steps must stay bit-identical
    to the unguarded step."""
    base = _tiny(get_config("bsrgan"))
    base = base.replace(
        g_kwargs={**base.g_kwargs, "num_rrdb": 1},
        content_weight=(),
        skip_nonfinite_updates=True,
        gt_image_size=32,
        crop_image_size=0,
    )
    gt, lr = _batch(np.random.default_rng(7), 2, 32, base.upscale_factor)

    tr = Trainer(base, steps_per_epoch=10)
    state0 = tr.init_state(jax.random.PRNGKey(7), lr.shape, gt.shape)
    snap = jax.tree_util.tree_map(np.asarray, state0)

    # finite step: guarded == unguarded, bit-identical
    tr_off = Trainer(base.replace(skip_nonfinite_updates=False), steps_per_epoch=10)
    s_on, m_on = tr.train_step(state0, gt, lr)
    state0b = tr_off.init_state(jax.random.PRNGKey(7), lr.shape, gt.shape)
    s_off, _ = tr_off.train_step(state0b, gt, lr)
    assert float(m_on["g_update_skipped"]) == 0.0
    assert float(m_on["d_update_skipped"]) == 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves((s_on.g_params, s_on.d_params, s_on.ema_g_params, s_on.d_vars)),
        jax.tree_util.tree_leaves((s_off.g_params, s_off.d_params, s_off.ema_g_params, s_off.d_vars)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # poisoned step: the WHOLE state (params, opt, EMA, d_vars) is frozen
    state1 = tr.init_state(jax.random.PRNGKey(7), lr.shape, gt.shape)
    lr_bad = lr.at[0, 0, 0, 0].set(jnp.nan)
    gt_bad = gt.at[0, 0, 0, 0].set(jnp.nan)
    s_bad, m_bad = tr.train_step(state1, gt_bad, lr_bad)
    assert float(m_bad["g_update_skipped"]) == 1.0
    assert float(m_bad["d_update_skipped"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(
            (snap.g_params, snap.d_params, snap.ema_g_params, snap.d_vars, snap.g_opt_state, snap.d_opt_state)
        ),
        jax.tree_util.tree_leaves(
            (s_bad.g_params, s_bad.d_params, s_bad.ema_g_params, s_bad.d_vars, s_bad.g_opt_state, s_bad.d_opt_state)
        ),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_clip_norm_inactive_when_large():
    """A clip threshold far above the true grad norm must not change the
    update (the chain wiring preserves reference optimizer semantics)."""
    base = _tiny(get_config("rrdbnet"))
    gt, lr = _batch(np.random.default_rng(6), 2, 16, 4)
    outs = {}
    for clip in (0.0, 1e9):
        cfg = base.replace(g_kwargs={**base.g_kwargs, "num_blocks": 1}, grad_clip_norm=clip)
        tr = Trainer(cfg, steps_per_epoch=10)
        state = tr.init_state(jax.random.PRNGKey(6), lr.shape, gt.shape)
        state, _ = tr.train_step(state, gt, lr)
        outs[clip] = jax.tree_util.tree_leaves(state.g_params)
    for a, b in zip(outs[0.0], outs[1e9]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-7)


def test_grad_accum_exact_for_generator_only():
    """L1 pretrain: mean-of-chunk-grads == full-batch grads, so the
    accumulated step must match the full step to fp tolerance."""
    base = _tiny(get_config("rrdbnet"))
    gt, lr = _batch(np.random.default_rng(8), 4, 16, 4)
    outs = {}
    for accum in (1, 2):
        cfg = base.replace(g_kwargs={**base.g_kwargs, "num_blocks": 1}, grad_accum_steps=accum)
        tr = Trainer(cfg, steps_per_epoch=10)
        state = tr.init_state(jax.random.PRNGKey(8), lr.shape, gt.shape)
        state, metrics = tr.train_step(state, gt, lr)
        outs[accum] = (state, metrics)
    np.testing.assert_allclose(
        float(outs[2][1]["pixel_loss"]), float(outs[1][1]["pixel_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[1][0].g_params),
        jax.tree_util.tree_leaves(outs[2][0].g_params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6, rtol=1e-5)


def test_grad_accum_gan_step_close_to_full():
    """Full D-first GAN step under accumulation: pixel/content grads are
    exactly linear; the SN power-iteration cadence (one iteration per
    chunk forward instead of per batch forward) is the only divergence,
    so the updated params stay close to the full-batch step."""
    base = _tiny(get_config("bsrgan"))
    sf = base.upscale_factor
    gt, lr = _batch(np.random.default_rng(9), 4, 16, sf)
    outs = {}
    for accum in (1, 2):
        cfg = base.replace(
            g_kwargs={**base.g_kwargs, "num_rrdb": 1},
            content_weight=(),
            grad_accum_steps=accum,
        )
        tr = Trainer(cfg, steps_per_epoch=10)
        state = tr.init_state(jax.random.PRNGKey(9), lr.shape, gt.shape)
        state, metrics = tr.train_step(state, gt, lr)
        outs[accum] = (state, metrics)
    for key in ("g_loss", "d_loss", "pixel_loss"):
        np.testing.assert_allclose(
            float(outs[2][1][key]), float(outs[1][1][key]), rtol=5e-2, atol=5e-4
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[1][0].g_params),
        jax.tree_util.tree_leaves(outs[2][0].g_params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-2, atol=5e-4)
    # batch not divisible by accum fails loudly at trace time
    cfg = base.replace(
        g_kwargs={**base.g_kwargs, "num_rrdb": 1}, content_weight=(), grad_accum_steps=3
    )
    tr = Trainer(cfg, steps_per_epoch=10)
    state = tr.init_state(jax.random.PRNGKey(9), lr.shape, gt.shape)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        tr.train_step(state, gt, lr)


def test_multistep_schedule():
    from srganfd_tpu.train.schedule import multistep_lr

    sched = multistep_lr(1.0, (10, 20), 0.5)
    assert float(sched(0)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(25)) == 0.25


def test_bf16_scan_trunk_gan_step():
    # the exact bench configuration (bf16 compute, scanned trunk), shrunk
    cfg = get_config("bsrgan").replace(
        upscale_factor=4,
        g_arch="bsrgan_x4",
        g_kwargs={"scan_blocks": True, "channels": 8, "growth_channels": 4, "num_rrdb": 2},
        gt_image_size=32,
        batch_size=2,
        content_weight=(),
        compute_dtype="bfloat16",
    )
    tr = Trainer(cfg, steps_per_epoch=10)
    gt, lr = _batch(np.random.default_rng(7), 2, 32, 4)
    state = tr.init_state(jax.random.PRNGKey(7), lr.shape, gt.shape)
    for _ in range(2):
        state, metrics = tr.train_step(state, gt, lr)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_multiscale_ensemble_gan_step():
    # A-ESRGAN paper ensemble: two attention U-Nets at 1x and 1/2x
    cfg = _tiny(get_config("aesrgan"))
    cfg = cfg.replace(
        d_arch="discriminator_attention_unet_ms",
        g_kwargs={**cfg.g_kwargs, "num_rrdb": 1},
        d_kwargs={"num_scales": 2},
        content_weight=(),
        gt_image_size=32,
    )
    tr = Trainer(cfg, steps_per_epoch=10)
    gt, lr = _batch(np.random.default_rng(8), 2, 32, 2)
    state = tr.init_state(jax.random.PRNGKey(8), lr.shape, gt.shape)
    state, metrics = tr.train_step(state, gt, lr)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_two_axis_mesh_step(eight_devices):
    # batch sharded jointly over (replica, data); params replicated;
    # jit inserts the cross-axis gradient reductions
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((2, 4), ("replica", "data"), devices=eight_devices)
    cfg = _tiny(get_config("rrdbnet"))
    cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, "num_blocks": 1})
    tr = Trainer(cfg, steps_per_epoch=10)
    gt_h = np.random.default_rng(9).uniform(size=(8, 16, 16, 3)).astype(np.float32)
    lr_h = gt_h[:, ::4, ::4, :]
    state = tr.init_state(jax.random.PRNGKey(9), lr_h.shape, gt_h.shape)
    sharding = NamedSharding(mesh, P(("replica", "data")))
    gt = jax.device_put(jnp.asarray(gt_h), sharding)
    lr = jax.device_put(jnp.asarray(lr_h), sharding)
    assert len(gt.sharding.device_set) == 8
    state, metrics = tr.train_step(state, gt, lr)
    assert np.isfinite(float(metrics["pixel_loss"]))


def test_bsrgan_fused_degraded_step_matches_composed():
    """The single-dispatch degradation+crop+update program must equal the
    composed path (apply_bsrgan_batch_cropped then train_step) exactly."""
    from srganfd_tpu.ops.degrade import apply_bsrgan_batch_cropped, plan_bsrgan_batch

    cfg = _tiny(get_config("bsrgan"))
    cfg = cfg.replace(
        g_kwargs={**cfg.g_kwargs, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=16,
        upscale_factor=2,
        g_arch="bsrgan_x2",
    )
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, (2, 48, 48, 3)).astype(np.uint8)
    plan = plan_bsrgan_batch(rng, 2, 2, per_sample_order=True)
    tops = np.array([0, 3])
    lefts = np.array([2, 1])

    tr_a = Trainer(cfg, steps_per_epoch=10)
    state_a = tr_a.init_state(jax.random.PRNGKey(9), (2, 8, 8, 3), (2, 16, 16, 3))
    state_a, m_a = tr_a.bsrgan_fused_train_step(state_a, raw, plan, tops, lefts, 16)

    tr_b = Trainer(cfg, steps_per_epoch=10)
    state_b = tr_b.init_state(jax.random.PRNGKey(9), (2, 8, 8, 3), (2, 16, 16, 3))
    gt_c, lr_c = apply_bsrgan_batch_cropped(raw, plan, tops, lefts, 16, 2)
    state_b, m_b = tr_b.train_step(state_b, gt_c, lr_c)

    for k in m_a:
        np.testing.assert_allclose(
            float(m_a[k]), float(m_b[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    la = jax.tree_util.tree_leaves(state_a.g_params)
    lb = jax.tree_util.tree_leaves(state_b.g_params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_bsrgan_fused_multi_step_matches_sequential():
    """K scanned fused steps in ONE dispatch == K sequential fused
    dispatches (exact per-step numerics; returned metrics are the mean)."""
    from srganfd_tpu.ops.degrade import plan_bsrgan_batch

    cfg = _tiny(get_config("bsrgan"))
    cfg = cfg.replace(
        g_kwargs={**cfg.g_kwargs, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=16,
        upscale_factor=2,
        g_arch="bsrgan_x2",
    )
    rng = np.random.default_rng(13)
    raws, plans, topss, leftss = [], [], [], []
    for _ in range(2):
        raws.append(rng.integers(0, 256, (2, 48, 48, 3)).astype(np.uint8))
        plans.append(plan_bsrgan_batch(rng, 2, 2, scale2_prob=0.0, per_sample_order=True))
        topss.append(rng.integers(0, 5, 2))
        leftss.append(rng.integers(0, 5, 2))

    tr_a = Trainer(cfg, steps_per_epoch=10)
    state_a = tr_a.init_state(jax.random.PRNGKey(9), (2, 8, 8, 3), (2, 16, 16, 3))
    state_a, m_a = tr_a.bsrgan_fused_train_multi_step(state_a, raws, plans, topss, leftss, 16)

    tr_b = Trainer(cfg, steps_per_epoch=10)
    state_b = tr_b.init_state(jax.random.PRNGKey(9), (2, 8, 8, 3), (2, 16, 16, 3))
    ms = []
    for raw, plan, tops, lefts in zip(raws, plans, topss, leftss):
        state_b, m = tr_b.bsrgan_fused_train_step(state_b, raw, plan, tops, lefts, 16)
        ms.append(m)

    for k in m_a:
        want = float(np.mean([float(m[k]) for m in ms]))
        np.testing.assert_allclose(float(m_a[k]), want, rtol=1e-5, atol=1e-6, err_msg=k)
    la = jax.tree_util.tree_leaves(state_a.g_params)
    lb = jax.tree_util.tree_leaves(state_b.g_params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # plans with different static degradation branches must be rejected
    plan_s2 = plan_bsrgan_batch(
        np.random.default_rng(1), 2, 4, scale2_prob=1.0, per_sample_order=True
    )
    assert plan_s2.scale2  # upscale 4 + prob 1.0 guarantees the other branch
    with pytest.raises(ValueError, match="static branch"):
        tr_a.bsrgan_fused_train_multi_step(
            state_a, raws, [plans[0], plan_s2], topss, leftss, 16
        )


def test_generic_multi_step_matches_sequential():
    """Family-agnostic K-step dispatch: 2 scanned pre-degraded GAN steps in
    ONE jitted program == 2 sequential train_step calls (exact; metrics are
    the mean). Uses the D-first BSRGAN ordering incl. spectral-norm state."""
    cfg = _tiny(get_config("bsrgan"))
    cfg = cfg.replace(
        g_kwargs={**cfg.g_kwargs, "num_rrdb": 1},
        content_weight=(),
        gt_image_size=32,
    )
    rng = np.random.default_rng(21)
    batches = []
    for _ in range(2):
        gt, lr = _batch(rng, 2, 32, 2)
        batches.append({"gt": gt, "lr": lr})

    tr_a = Trainer(cfg, steps_per_epoch=10)
    state_a = tr_a.init_state(jax.random.PRNGKey(4), batches[0]["lr"].shape, batches[0]["gt"].shape)
    multi = tr_a.make_train_multi_step()
    state_a, m_a = multi(state_a, tuple(batches))

    tr_b = Trainer(cfg, steps_per_epoch=10)
    state_b = tr_b.init_state(jax.random.PRNGKey(4), batches[0]["lr"].shape, batches[0]["gt"].shape)
    ms = []
    for b in batches:
        state_b, m = tr_b.train_step(state_b, b["gt"], b["lr"])
        ms.append(m)

    for k in m_a:
        want = float(np.mean([float(m[k]) for m in ms]))
        np.testing.assert_allclose(float(m_a[k]), want, rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(
        jax.tree_util.tree_leaves((state_a.g_params, state_a.d_params, state_a.ema_g_params)),
        jax.tree_util.tree_leaves((state_b.g_params, state_b.d_params, state_b.ema_g_params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    assert int(state_a.step) == 2


def test_ema_update_reference_semantics_twins_averaged_model():
    """``ema_reference_semantics`` reproduces the reference's literal
    AveragedModel behavior: the INVERTED lerp ((1-decay)*avg + decay*p,
    ``ESRGAN/train_esrgan.py:249``) plus the first-update copy — pinned
    against torch's AveragedModel with the reference's own avg_fn."""
    import pytest

    torch = pytest.importorskip("torch")
    from torch.optim.swa_utils import AveragedModel

    from srganfd_tpu.train.state import ema_update

    decay = 0.9
    torch.manual_seed(0)
    m = torch.nn.Linear(3, 2).double()
    ema_avg = lambda a, p, n: (1 - decay) * a + decay * p
    ema_m = AveragedModel(m, avg_fn=ema_avg)

    ema_j = {k: jnp.asarray(v.detach().numpy().copy()) for k, v in m.state_dict().items()}
    for step in range(3):
        with torch.no_grad():
            for p in m.parameters():
                p.add_(torch.randn_like(p) * 0.1)
        ema_m.update_parameters(m)
        params = {k: jnp.asarray(v.detach().numpy().copy()) for k, v in m.state_dict().items()}
        ema_j = ema_update(
            ema_j, params, decay, reference_semantics=True, step=jnp.asarray(step)
        )

    want = {k: v.detach().numpy() for k, v in ema_m.module.state_dict().items()}
    for k in want:
        np.testing.assert_allclose(np.asarray(ema_j[k]), want[k], rtol=1e-12)
    # and the flag threads through the Trainer config
    from srganfd_tpu.configs import get_config

    assert get_config("bsrgan").ema_reference_semantics is False
