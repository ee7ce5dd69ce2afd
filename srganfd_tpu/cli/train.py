"""Training entry point.

Mirrors the reference train scripts' main() template
(``load_dataset -> build_model -> define_loss/optimizer/scheduler ->
epoch loop{train, validate, checkpoint-best/last, track}``,
``BSRGAN/train_bsrgan.py:38-232``) for every model family, driven by a
config name instead of per-family copy-pasted scripts.

Usage:
    python -m srganfd_tpu.cli.train --config rrdbnet \
        --train-dir data/train --valid-dir data/valid [--epochs N]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu import configs
from srganfd_tpu.cli.degrade_adapter import DegradationAdapter
from srganfd_tpu.data.datasets import BatchLoader, DegeneratedImageDataset, TrainValidImageDataset
from srganfd_tpu.metrics.psnr_ssim import psnr_tensor, ssim_tensor
from srganfd_tpu.parallel import make_mesh
from srganfd_tpu.track.tracker import Tracker
from srganfd_tpu.train import checkpoint as ckpt
from srganfd_tpu.train.loop import Trainer
from srganfd_tpu.utils.meters import AverageMeter, ProgressMeter

# cooperative preemption: the handler only flags — run_train's loop saves
# ckpt_preempt at the next safe point. Saving from inside the handler can
# reenter an in-flight orbax write (observed on hardware: SIGTERM during an
# epoch-end best save died without writing ckpt_preempt).
_PREEMPT = {"signum": 0}


def _request_preempt(signum, frame):  # pragma: no cover - signal path
    _PREEMPT["signum"] = signum
    print(f"signal {signum}: preemption checkpoint at next safe point", flush=True)


def _install_preempt_handler(reset: bool = True):
    """Install the flag-only SIGTERM handler; returns the handler it
    replaced (None when not on the main thread) so callers can restore it."""
    import signal

    if reset:
        _PREEMPT["signum"] = 0  # a fresh run must not inherit a stale request
    try:
        return signal.signal(signal.SIGTERM, _request_preempt)
    except ValueError:
        return None  # not the main thread (e.g. under a test harness)


def _restore_sigterm(prev) -> None:
    """Undo ``_install_preempt_handler``: once training returns, a SIGTERM
    must terminate the process again instead of setting a flag nobody
    reads (the flag-only handler would otherwise swallow SIGTERM forever)."""
    import signal

    if prev is None:
        return
    try:
        signal.signal(signal.SIGTERM, prev)
    except ValueError:
        pass


def build_datasets(cfg):
    if cfg.degradation == "paired":
        from srganfd_tpu.data.datasets import PairedImageDataset

        train_ds = PairedImageDataset(cfg.train_gt_images_dir, cfg.train_lr_images_dir)
        valid_ds = PairedImageDataset(cfg.valid_gt_images_dir, cfg.valid_lr_images_dir)
        return train_ds, valid_ds
    if cfg.degradation == "realesrgan":
        train_ds = DegeneratedImageDataset(
            cfg.train_gt_images_dir,
            cfg.gt_image_size,
            cfg.degradation_params["model"],
            mode="Train",
        )
        valid_ds = DegeneratedImageDataset(
            cfg.valid_gt_images_dir,
            cfg.gt_image_size,
            cfg.degradation_params["model"],
            mode="Valid",
        )
    else:
        crop = cfg.crop_image_size or cfg.gt_image_size
        train_ds = TrainValidImageDataset(
            cfg.train_gt_images_dir, cfg.gt_image_size, "Train", crop
        )
        valid_ds = TrainValidImageDataset(
            cfg.valid_gt_images_dir, cfg.gt_image_size, "Valid", crop
        )
    return train_ds, valid_ds


def validate(
    cfg, trainer, params, valid_loader, adapter, lpips_fn=None, max_batches: int = 16,
    should_stop=None, mesh=None,
):
    """Per-epoch validation: SR the degraded valid crops; Y-channel
    PSNR/SSIM with crop_border = upscale_factor, plus LPIPS when a metric
    fn is given (``BSRGAN/train_bsrgan.py:515-607`` surface).

    The adapter keys its RNG by (seed, host, step) and validation passes
    steps 0..n, so every epoch validates on the SAME degradations:
    metrics are epoch-comparable and no new degradation-plan variants
    need compiling after the first epoch (the reference's global torch
    RNG instead drifts per epoch)."""
    psnrs, ssims, lpipses = [], [], []
    for i, host_batch in enumerate(valid_loader):
        if i >= max_batches or (should_stop is not None and should_stop()):
            break
        batch = adapter(host_batch, i)
        lr, gt = batch["lr"], batch["gt"]
        if mesh is not None and jax.process_count() == 1:
            # shard the eval batch over the data axis: on a multi-chip
            # mesh the per-epoch validation pass otherwise computes on
            # one device while the rest idle (the train step is already
            # dp-sharded). Metrics are per-image, so sharded == unsharded.
            ndata = mesh.shape.get("data", 1)
            if ndata > 1 and int(lr.shape[0]) % ndata == 0:
                from srganfd_tpu.parallel import shard_batch

                sharded = shard_batch({"lr": lr, "gt": gt}, mesh)
                lr, gt = sharded["lr"], sharded["gt"]
        sr = trainer.eval_sr(params, lr)
        if sr.shape != gt.shape:  # bsrgan eval path keeps full-size gt
            continue
        psnrs.extend(np.asarray(psnr_tensor(sr, gt, cfg.upscale_factor, cfg.only_test_y_channel)))
        ssims.extend(np.asarray(ssim_tensor(sr, gt, cfg.upscale_factor, cfg.only_test_y_channel)))
        if lpips_fn is not None:
            lpipses.extend(np.asarray(lpips_fn(sr, gt)))
    return {
        "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "ssim": float(np.mean(ssims)) if ssims else 0.0,
        "lpips": float(np.mean(lpipses)) if lpipses else float("inf"),
    }


def run_train(
    cfg,
    steps_per_epoch: int | None = None,
    use_mesh: bool = True,
    resume: str = "",
    profile_dir: str = "",
    save_every_steps: int = 0,
    async_ckpt: bool = False,
    ckpt_every_epochs: int = 1,
) -> dict:
    """Train per the config. ``save_every_steps`` adds mid-epoch snapshots
    (preemption recovery beyond the reference's per-epoch checkpoints).
    ``ckpt_every_epochs=N`` thins the epoch-end snapshot cadence to every
    Nth epoch (best-metric epochs and the final epoch always save): the
    reference's per-epoch save (``ESRGAN/train_rrdbnet.py:120-139``) is
    the right cadence for its ~100k-iter epochs, but on small datasets an
    epoch can be seconds of steps against hundreds of MB of Orbax writes.
    SIGTERM requests a cooperative preemption checkpoint: the loop saves
    ``ckpt_preempt`` at the next step boundary and exits 143 (grace needed:
    about one train step + one checkpoint write; the handler itself never
    saves — a mid-write signal would corrupt an in-flight orbax save).

    Every snapshot (mid-epoch, preemption, epoch-end) is step-exact:
    K-step dispatch buffers are flushed before snapshotting so the applied
    steps are exactly the prefix ``0..step``, and ``--resume`` continues
    bit-identically (seekable loaders + step-keyed degradation RNG).
    Note that under ``SRGANFD_STEPS_PER_DISPATCH=K`` the flush itself
    changes how later steps are grouped into dispatches relative to a
    never-snapshotting run — per-step numerics are equivalence-tested
    identical, but the fused-bsrgan path additionally applies steps in
    degradation-branch groups, so its step ORDER (and hence exact floats)
    matches the run that wrote the snapshot, not a snapshot-free run."""
    # install the flag-only SIGTERM handler FIRST: setup (first jit compile
    # is tens of seconds) is otherwise a window where a preemption signal
    # still hits SIG_DFL and kills the process without a checkpoint
    # (observed on hardware + reproduced: signal at +21 s died in setup).
    # Restored on return so later SIGTERMs terminate the process normally.
    prev_sigterm = _install_preempt_handler()
    try:
        return _run_train_body(
            cfg,
            steps_per_epoch=steps_per_epoch,
            use_mesh=use_mesh,
            resume=resume,
            profile_dir=profile_dir,
            save_every_steps=save_every_steps,
            async_ckpt=async_ckpt,
            ckpt_every_epochs=ckpt_every_epochs,
        )
    finally:
        _restore_sigterm(prev_sigterm)


def _run_train_body(
    cfg,
    steps_per_epoch: int | None = None,
    use_mesh: bool = True,
    resume: str = "",
    profile_dir: str = "",
    save_every_steps: int = 0,
    async_ckpt: bool = False,
    ckpt_every_epochs: int = 1,
) -> dict:
    from srganfd_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    if not use_mesh:
        mesh = None
    elif cfg.dcn_mesh_shape is not None:
        from srganfd_tpu.parallel import make_hybrid_mesh

        mesh = make_hybrid_mesh(cfg.mesh_shape, cfg.dcn_mesh_shape, cfg.mesh_axes)
    else:
        mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    train_ds, valid_ds = build_datasets(cfg)
    spe = steps_per_epoch or cfg.steps_per_epoch or max(1, len(train_ds) // cfg.batch_size)

    trainer = Trainer(cfg, steps_per_epoch=spe, mesh=mesh)
    train_adapter = DegradationAdapter(cfg, seed=cfg.seed, train=True)
    valid_adapter = DegradationAdapter(cfg, seed=cfg.seed + 1, train=True)

    lr_size = cfg.gt_image_size // cfg.upscale_factor
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.seed),
        (cfg.batch_size, lr_size, lr_size, 3),
        (cfg.batch_size, cfg.gt_image_size, cfg.gt_image_size, 3),
    )
    # pretrained initialization BEFORE resume (reference order,
    # BSRGAN/train_bsrgan.py:60-92): name+shape-filtered graft of a prior
    # run's generator/discriminator — the bsrnet -> bsrgan workflow. A
    # full-state --resume below still overrides everything.
    if cfg.pretrained_g_model_weights_path:
        loaded = ckpt.load_pretrained_params(cfg.pretrained_g_model_weights_path, "g_params")
        g_new, n_ok, n_all = ckpt.merge_by_path(state.g_params, loaded)
        # EMA restarts as a copy of the loaded generator, like the
        # reference's AveragedModel built after the pretrained load
        state = state.replace(
            g_params=g_new, ema_g_params=jax.tree_util.tree_map(jnp.copy, g_new)
        )
        print(
            f"loaded pretrained G ({n_ok}/{n_all} tensors) from "
            f"{cfg.pretrained_g_model_weights_path}"
        )
    if cfg.pretrained_d_model_weights_path and state.d_params is not None:
        loaded, saved_d_vars = ckpt.load_pretrained_params(
            cfg.pretrained_d_model_weights_path, "d_params", with_d_vars=True
        )
        # ported VGG-128 D checkpoints (npz) carry BN running stats inline
        # (tools/port_torch_weights.py convert_vgg_discriminator); native
        # Orbax checkpoints carry every mutable collection in d_vars —
        # graft whichever is present so a pretrained D never silently
        # trains against init statistics (ADVICE r2)
        bn_stats = loaded.pop("batch_stats", None) if isinstance(loaded, dict) else None
        d_new, n_ok, n_all = ckpt.merge_by_path(state.d_params, loaded)
        d_vars = state.d_vars
        if bn_stats and d_vars and "batch_stats" in d_vars:
            merged_stats, s_ok, s_all = ckpt.merge_by_path(d_vars["batch_stats"], bn_stats)
            d_vars = dict(d_vars, batch_stats=merged_stats)
            n_ok, n_all = n_ok + s_ok, n_all + s_all
        if saved_d_vars and d_vars:
            for coll, saved in saved_d_vars.items():
                if coll in d_vars and saved is not None:
                    merged, s_ok, s_all = ckpt.merge_by_path(d_vars[coll], saved)
                    d_vars = dict(d_vars, **{coll: merged})
                    n_ok, n_all = n_ok + s_ok, n_all + s_all
        state = state.replace(d_params=d_new, d_vars=d_vars)
        print(
            f"loaded pretrained D ({n_ok}/{n_all} tensors) from "
            f"{cfg.pretrained_d_model_weights_path}"
        )
    start_epoch = 0
    start_step = 0
    resume_best: dict = {}
    if resume == "auto":
        # preemptible-job ergonomics: rerun the SAME command line and pick
        # up from the newest complete snapshot (preempt/step/epoch), or
        # start fresh when none exists
        resume = ckpt.find_auto_resume(
            f"{cfg.results_dir}/{cfg.exp_name or cfg.name}", spe
        ) or ""
        print(f"auto-resume: {resume or 'no snapshot found, fresh start'}")
    if resume:
        # full-state resume: params/EMA/optimizer/step/epoch/best metrics
        # (reference load_mode="resume", ESRGAN/utils.py:41-67)
        payload = ckpt.load_checkpoint(resume, template=state)
        state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
        resume_best = dict(payload.get("best_metrics") or {})
        if "step" in payload:
            # step-exact resume (mid-epoch/preempt snapshots record the
            # steps APPLIED to the state): restart inside the epoch —
            # the sought loader + step-keyed degradation RNG make the
            # continuation bit-identical to the uninterrupted run
            start_step = int(payload["step"])
            start_epoch = start_step // spe
            print(f"resumed from {resume} at step {start_step} (epoch {start_epoch})")
        else:
            start_epoch = int(payload["epoch"]) + 1
            start_step = start_epoch * spe
            print(f"resumed from {resume} at epoch {start_epoch}")

    # Loaders are built AFTER resume so the data stream can be sought to
    # the resume position: batches (and the step-keyed degradation plans)
    # are pure functions of (seed, batch id), so a resumed run consumes
    # exactly the samples the uninterrupted run would have — the reference
    # restarts its DataLoader epoch from scratch instead
    # (BSRGAN/train_bsrgan.py:86-101 resume sets start_epoch only).
    start_batch = start_step
    train_loader = None
    if cfg.degradation in ("bicubic", "bsrgan") and os.environ.get("SRGANFD_NATIVE_LOADER", "1") != "0":
        # GT-crop pipelines can use the C++ decode/augment loader
        from srganfd_tpu.data import native_loader

        if native_loader.available():
            train_loader = native_loader.NativeBatchLoader(
                train_ds.paths,
                crop=cfg.crop_image_size or cfg.gt_image_size,
                batch_size=cfg.batch_size,
                seed=cfg.seed,
                num_threads=max(cfg.num_workers, 2),
                # the fused degradation programs fold /255 on-device: ship
                # raw bytes (4x less host->device traffic)
                uint8=cfg.degradation in ("bsrgan", "bicubic"),
                start_batch=start_batch,
            )
            print("using native C++ data loader")
    if train_loader is None:
        train_loader = BatchLoader(
            train_ds,
            cfg.batch_size,
            shuffle=True,
            seed=cfg.seed,
            num_workers=cfg.num_workers,
            start_batch=start_batch,
        )

    # data-parallel placement: replicate state, shard batches over the
    # mesh's data axis (multi-host: each process contributes its per-host
    # shard via global_batch_from_host). jit then inserts the psum
    # gradient sync from the shardings alone (SURVEY §2.9).
    data_ax = mesh.shape.get("data", 1) if mesh is not None else 1
    global_batch = cfg.batch_size * jax.process_count()
    dp = data_ax > 1 and global_batch % data_ax == 0
    if data_ax > 1 and not dp:
        print(f"! global batch {global_batch} not divisible by data axis {data_ax}: unsharded")
    if dp:
        from srganfd_tpu.parallel import (
            batch_sharding,
            global_batch_from_host,
            replicated_sharding,
        )

        rep = replicated_sharding(mesh)
        state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
        bsh = batch_sharding(mesh)
        # K-step dispatch stacks to (K, B, ...): batch axis moves to dim 1
        from jax.sharding import NamedSharding, PartitionSpec

        stacked_sharding = NamedSharding(mesh, PartitionSpec(None, "data"))

        def to_global(tree):
            if jax.process_count() > 1:
                return global_batch_from_host(tree, mesh)
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), tree)
    else:
        stacked_sharding = None

        def to_global(tree):
            return tree

    needs_pixel_target = cfg.degradation == "realesrgan"
    step_fn = trainer.make_train_step(separate_pixel_target=needs_pixel_target)

    # single-dispatch mode: degradation+crop fused INTO the train step
    # (for remote-execution tunnels; see docs/tpu_performance.md)
    fuse_step = (
        cfg.degradation == "bsrgan"
        and os.environ.get("SRGANFD_FUSE_STEP", "0") == "1"
    )
    if fuse_step and jax.process_count() > 1:
        # the fused path ships per-sample plan operands sized to the LOCAL
        # batch; under multi-host the gt batch is assembled globally, so the
        # operands would mismatch (and differ per process). Fall back.
        print("! SRGANFD_FUSE_STEP ignored under multi-host (plan operands are per-host)")
        fuse_step = False
    # K-step dispatch: scan K whole train steps inside ONE jitted program,
    # amortizing the tunnel's fixed per-execution latency K-fold. With
    # SRGANFD_FUSE_STEP each scanned step embeds its own degradation chain
    # (steps buffer per static chain branch — scale2 on/off x interp — so
    # execution order across branches shifts slightly; every (batch, plan)
    # pair is preserved and per-step numerics are exact). Without it, the
    # adapter's pre-degraded batches buffer and scan family-agnostically.
    # Logged metrics are means over each K-step dispatch.
    superstep = max(1, int(os.environ.get("SRGANFD_STEPS_PER_DISPATCH", "1")))
    if superstep > 1 and jax.process_count() > 1:
        # per-host buffering would desynchronize the collective dispatch
        # order across processes; keep multi-host on the one-step path
        print("! SRGANFD_STEPS_PER_DISPATCH ignored under multi-host")
        superstep = 1
    if fuse_step:
        from srganfd_tpu.ops.degrade import bsrgan_lr_size, plan_bsrgan_batch

        print("degradation fused into the train step (SRGANFD_FUSE_STEP=1)")
    if superstep > 1:
        print(f"K-step dispatch: {superstep} train steps per device dispatch"
              + (" (fused chain)" if fuse_step else ""))
        if not fuse_step:
            multi_step_fn = trainer.make_train_multi_step(
                separate_pixel_target=needs_pixel_target
            )

    # multi-host: every process runs the (collective) train/validate programs
    # symmetrically, but only process 0 writes — tracker sinks, checkpoints,
    # and best-model selection would otherwise race/diverge per host (each
    # process validates its own data shard).
    is_main = jax.process_index() == 0
    tracker = Tracker(cfg.experience_name or cfg.exp_name or cfg.name, cfg.run_name, cfg.run_id,
                      samples_dir=cfg.samples_dir, tags=cfg.tags or None,
                      description=cfg.description, enabled=is_main)
    tracker.log_params({k: v for k, v in vars(cfg).items() if not k.startswith("_")})

    lpips_fn = None
    if cfg.optimizing_metric == "LPIPS" or cfg.is_gan:
        from srganfd_tpu.losses.lpips import Lpips

        lpips_metric = Lpips()
        if not lpips_metric.pretrained:
            print("! LPIPS weights unavailable: validation LPIPS is the deterministic surrogate")
        lpips_fn = jax.jit(lpips_metric.__call__)

    best = {"psnr": -1.0, "ssim": -1.0, "lpips": float("inf")}
    # carry best-so-far across resume so ckpt_best can't regress to a
    # worse post-resume epoch (the reference reloads best_psnr the same
    # way, ESRGAN/utils.py:44 via load_state_dict resume)
    # carry EVERY tracked key (e.g. d_sr_prob for the Discriminator-SR-Prob
    # selector), not just the psnr/ssim/lpips defaults
    best.update({k: float(v) for k, v in resume_best.items()})
    batch_time = AverageMeter("Time", ":6.3f")
    data_time = AverageMeter("Data", ":6.3f")
    g_loss_m = AverageMeter("G loss", ":6.4f")

    ckpt_dir = f"{cfg.results_dir}/{cfg.exp_name or cfg.name}"

    # --async-ckpt: Orbax writes + swaps happen on a writer thread; the
    # step loop only pays the device->host copy. save_snapshot resolves
    # ckpt.save_checkpoint at call time so the sync path stays patchable.
    writer = ckpt.AsyncCheckpointWriter() if (async_ckpt and is_main) else None

    def save_snapshot(*a, **kw):
        (writer.save if writer is not None else ckpt.save_checkpoint)(*a, **kw)

    def flush_snapshots():
        if writer is not None:
            writer.wait()

    # multi-process preemption must be COORDINATED: the train step is a
    # collective (psum grad sync), so a SIGTERM delivered to one process
    # only would otherwise make it exit mid-epoch while its peers hang in
    # the next step's collective (and, with is_main elsewhere, no preempt
    # checkpoint would be written at all). Every process polls the max of
    # all local flags at the same loop points — a symmetric, one-poll-
    # delayed collective (FlagConsensus) that never stalls the dispatch
    # pipeline — so any subset receiving the signal preempts the cluster.
    multi = jax.process_count() > 1
    if multi:
        from srganfd_tpu.parallel import FlagConsensus

        _consensus = FlagConsensus()

        def _preempt_signum() -> int:
            return _consensus.poll(_PREEMPT["signum"])
    else:
        def _preempt_signum() -> int:
            return _PREEMPT["signum"]

    def _preempt_exit_if_requested():
        sig = _preempt_signum()
        if not sig:
            return
        # K-step buffers must be applied before snapshotting: the fused
        # path groups steps by degradation branch, so without a flush the
        # applied set is not a prefix of 0..global_step and no single
        # `step` value could describe it (resume would double-apply some
        # steps and skip others). Flush runs on EVERY process — the
        # dispatches are collective under dp.
        flush_buffers()
        if is_main:
            save_snapshot(ckpt_dir, state, epoch, best, is_best=False,
                          name="ckpt_preempt", step=global_step)
            flush_snapshots()  # about to exit: the snapshot must be on disk
            print("preemption checkpoint written; exiting", flush=True)
        if multi:
            # peers must not reach the jax.distributed shutdown barrier
            # (and its timeout) while process 0 is still writing
            _consensus.barrier("srganfd:preempt_exit")
        raise SystemExit(128 + sig)

    # re-assert the OS-level handler without clearing a pending request:
    # library inits during setup (TF via the tracker, XLA) can install
    # their own sigactions over ours
    _install_preempt_handler(reset=False)

    it = iter(train_loader)
    global_step = start_step
    epoch = start_epoch
    metrics: dict = {}
    last_metrics: dict = {}
    fuse_buffers: dict[tuple, list] = {}
    plain_buf: list = []

    def flush_buffers():
        """Dispatch any buffered K-step groups as single steps (same
        per-step numerics — the scanned multi-step is equivalence-tested
        against singles). Called at epoch end, before every mid-epoch /
        preemption snapshot (applied steps must form a prefix for the
        step-exact resume contract), symmetric across processes."""
        nonlocal state, metrics
        for buf in fuse_buffers.values():
            for gt_b, plan_b, tops_b, lefts_b in buf:
                gt_g = to_global({"gt": gt_b})["gt"]
                state, metrics = trainer.bsrgan_fused_train_step(
                    state, gt_g, plan_b, tops_b, lefts_b, cfg.gt_image_size
                )
            buf.clear()
        for batch_b in plain_buf:
            if needs_pixel_target:
                state, metrics = step_fn(
                    state, batch_b["gt"], batch_b["lr"], batch_b["gt_pixel"]
                )
            else:
                state, metrics = step_fn(state, batch_b["gt"], batch_b["lr"])
        plain_buf.clear()
    for epoch in range(start_epoch, cfg.epochs):
        if profile_dir and epoch == start_epoch:
            jax.profiler.start_trace(profile_dir)
        progress = ProgressMeter(spe, [batch_time, data_time, g_loss_m], prefix=f"Epoch[{epoch}]")
        end = time.time()
        # step-exact resume lands mid-epoch: skip the already-applied slots
        first_slot = start_step - epoch * spe if epoch == start_epoch else 0
        for i in range(max(first_slot, 0), spe):
            _preempt_exit_if_requested()
            host_batch = next(it)
            if fuse_step:
                n = int(np.shape(host_batch["gt"])[0])
                step_rng = train_adapter.step_rng(global_step)
                plan = plan_bsrgan_batch(
                    step_rng, n, cfg.upscale_factor,
                    jpeg_prob=cfg.degradation_params.get("jpeg_prob", 0.9),
                    scale2_prob=cfg.degradation_params.get("scale2_prob", 0.25),
                    per_sample_order=True,
                )
                lr_edge = bsrgan_lr_size(int(np.shape(host_batch["gt"])[1]), plan)
                lim = lr_edge - cfg.gt_image_size // cfg.upscale_factor
                tops = step_rng.integers(0, lim + 1, n)
                lefts = step_rng.integers(0, lim + 1, n)
                data_time.update(time.time() - end)
                if superstep == 1:
                    gt_raw = to_global({"gt": host_batch["gt"]})["gt"]
                    state, metrics = trainer.bsrgan_fused_train_step(
                        state, gt_raw, plan, tops, lefts, cfg.gt_image_size
                    )
                else:
                    # buffer the HOST batch: device placement happens once
                    # per dispatch on the stacked (K,B,...) array (a per-step
                    # to_global here would be pulled back for stacking)
                    skey = (plan.scale2, plan.scale2_interp, plan.effective_upscale)
                    buf = fuse_buffers.setdefault(skey, [])
                    buf.append((host_batch["gt"], plan, tops, lefts))
                    if len(buf) == superstep:
                        gts, plans, topss, leftss = zip(*buf)
                        state, metrics = trainer.bsrgan_fused_train_multi_step(
                            state, gts, plans, topss, leftss, cfg.gt_image_size,
                            batch_sharding=stacked_sharding,
                        )
                        buf.clear()
            else:
                batch = to_global(train_adapter(host_batch, global_step))
                data_time.update(time.time() - end)
                if superstep > 1:
                    plain_buf.append(batch)
                    if len(plain_buf) == superstep:
                        state, metrics = multi_step_fn(state, tuple(plain_buf))
                        plain_buf.clear()
                elif needs_pixel_target:
                    state, metrics = step_fn(
                        state, batch["gt"], batch["lr"], batch["gt_pixel"]
                    )
                else:
                    state, metrics = step_fn(state, batch["gt"], batch["lr"])
            # materialize metrics (a device sync) only at print frequency —
            # pulling them every step would serialize host and device
            # (empty metrics = K-step buffering hasn't dispatched yet)
            if metrics:
                last_metrics = metrics  # epoch-end best-selection reads this
            if metrics and i % cfg.train_print_frequency == 0:
                g_key = "g_loss" if "g_loss" in metrics else "pixel_loss"
                g_loss_m.update(float(metrics[g_key]))
                batch_time.update(time.time() - end)
                progress.display(i)
                tracker.log_metrics(
                    {f"Train/{k}": float(v) for k, v in metrics.items()}, global_step
                )
                # consume: under K-step buffering the same dispatch-mean must
                # not re-log at later print steps as if it were fresh
                metrics = {}
            end = time.time()
            if save_every_steps and global_step and global_step % save_every_steps == 0:
                # flush K-step buffers so applied steps are exactly the
                # prefix 0..global_step (see _preempt_exit_if_requested);
                # all processes flush (collective), only main writes
                flush_buffers()
                if is_main:
                    save_snapshot(ckpt_dir, state, epoch, best, is_best=False,
                                  name="ckpt_step", step=global_step + 1)
            global_step += 1
        # flush buffered K-step groups before validating (keeps per-epoch
        # step counts exact; leftovers run as single dispatches)
        flush_buffers()
        if profile_dir and epoch == start_epoch:
            jax.block_until_ready(jax.tree_util.tree_leaves(state.g_params)[0])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_dir}")

        valid_loader = BatchLoader(
            valid_ds, min(cfg.batch_size, len(valid_ds)), shuffle=False, loop=False,
            seed=cfg.seed, drop_last=True, num_workers=cfg.num_workers,
        )
        # a SIGTERM during validation/epoch-end bookkeeping (which can take
        # minutes) must still be served promptly: check at the flush
        # boundary, let validate bail between batches, and check again
        # after the epoch-end saves
        _preempt_exit_if_requested()
        # the reference validates the raw generator (train_rrdbnet.py:109,
        # train_bsrgan.py:166); the EMA model is checkpointed alongside
        vm = validate(
            cfg, trainer, state.g_params, valid_loader, valid_adapter, lpips_fn=lpips_fn,
            should_stop=lambda: bool(_PREEMPT["signum"]), mesh=mesh if dp else None,
        )
        # unconditional (not flag-guarded): under multi-process the check
        # itself is a collective, so every process must reach it
        _preempt_exit_if_requested()
        psnr, ssim = vm["psnr"], vm["ssim"]
        epoch_metrics = {"Valid/PSNR": psnr, "Valid/SSIM": ssim, "epoch": epoch}
        lpips_str = ""
        if lpips_fn is not None and np.isfinite(vm["lpips"]):
            epoch_metrics["Valid/LPIPS"] = vm["lpips"]
            lpips_str = f"  LPIPS {vm['lpips']:.4f}"
        tracker.log_metrics(epoch_metrics, global_step)
        print(f"[epoch {epoch}] valid PSNR {psnr:.3f} dB  SSIM {ssim:.4f}{lpips_str}", flush=True)

        # best-model selection on the configured metric
        # (BSRGAN/train_bsrgan.py:184-214: LPIPS | PSNR | D SR prob)
        if cfg.optimizing_metric == "LPIPS" and lpips_fn is not None:
            is_best = vm["lpips"] < best["lpips"]
        elif cfg.optimizing_metric == "Discriminator SR Prob":
            d_prob = float(last_metrics.get("d_sr_probability", 0.0))
            is_best = d_prob > best.get("d_sr_prob", -1.0)
            best["d_sr_prob"] = max(best.get("d_sr_prob", -1.0), d_prob)
        else:
            is_best = psnr > best["psnr"]
        best["psnr"] = max(best["psnr"], psnr)
        best["ssim"] = max(best["ssim"], ssim)
        best["lpips"] = min(best["lpips"], vm["lpips"])
        # thinned cadence: best epochs and the final epoch always snapshot
        # (ckpt_best must never miss a best), non-cadence epochs skip the
        # hundreds-of-MB Orbax write entirely
        want_save = (
            is_best
            or (epoch + 1) % max(1, ckpt_every_epochs) == 0
            or epoch == cfg.epochs - 1
        )
        if is_main and want_save:
            save_snapshot(ckpt_dir, state, epoch, best, is_best, step=(epoch + 1) * spe)
            # artifact logging reads the snapshot dirs right below
            flush_snapshots()
            # model artifacts under the reference's names (the orbax snapshot
            # holds g + ema_g + d together; the reference logs three torch
            # models — BSRGAN/train_bsrgan.py:201-214)
            if is_best:
                tracker.log_artifact_dir(os.path.join(ckpt_dir, "ckpt_best"), "best_g_model")
            tracker.log_artifact_dir(os.path.join(ckpt_dir, "ckpt_last"), "last_g_model")
        _preempt_exit_if_requested()
    if writer is not None:
        # drain + surface any writer error; on exception/crash paths the
        # daemon thread may die mid-swap — _sweep_incomplete recovers the
        # newest complete snapshot on the next save/resume
        writer.close()
    tracker.close()
    return {"best_psnr": best["psnr"], "best_ssim": best["ssim"], "state": state}


def main() -> None:
    ap = argparse.ArgumentParser(description="srganfd_tpu trainer")
    ap.add_argument("--config", required=True, help="rrdbnet|esrgan|bsrnet|bsrgan|realesrnet|realesrgan|aesrgan")
    ap.add_argument("--train-dir", default=None)
    ap.add_argument("--valid-dir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--steps-per-epoch", type=int, default=None)
    ap.add_argument("--compute-dtype", default=None, choices=["bfloat16", "float32"])
    ap.add_argument(
        "--resume",
        default="",
        help="checkpoint dir to resume full state from, or 'auto' to pick the "
        "newest complete snapshot in the results dir (fresh start if none)",
    )
    ap.add_argument("--profile-dir", default="", help="capture a jax.profiler trace of epoch 0")
    ap.add_argument("--save-every-steps", type=int, default=0, help="mid-epoch snapshot cadence")
    ap.add_argument(
        "--ckpt-every-epochs",
        type=int,
        default=1,
        help="epoch-end snapshot cadence (best/final epochs always save); "
        "thins the per-epoch Orbax writes when epochs are seconds long",
    )
    ap.add_argument(
        "--grad-accum",
        type=int,
        default=None,
        help="accumulate gradients over N chunks of the batch before each optimizer step",
    )
    ap.add_argument(
        "--skip-nonfinite",
        action="store_true",
        help="failure protection: freeze params/opt/EMA/D-vars on NaN/Inf-gradient steps",
    )
    ap.add_argument(
        "--async-ckpt",
        action="store_true",
        help="write snapshots on a background thread (step loop pays only the device->host copy)",
    )
    ap.add_argument("--d-arch", default=None, help="override discriminator arch (e.g. discriminator_attention_unet_ms)")
    ap.add_argument(
        "--pretrained-g",
        default=None,
        help="initialize the generator from a prior checkpoint (Orbax dir, "
        "ported .npz, or MLflow runs:/<run_id>/best_g_model URI — the "
        "reference's loadsFromMlrun route), name+shape-filtered — the "
        "bsrnet->bsrgan workflow (train_bsrgan.py:63-84); EMA restarts "
        "from it",
    )
    ap.add_argument(
        "--pretrained-d",
        default=None,
        help="initialize the discriminator likewise (train_bsrgan.py:60-68)",
    )
    ap.add_argument("--gt-size", type=int, default=None, help="override gt_image_size (and disable pre-crop)")
    ap.add_argument(
        "--debug-nans",
        action="store_true",
        help="fault detection: raise at the first NaN-producing op (jax_debug_nans)",
    )
    ap.add_argument(
        "--tiny", action="store_true", help="shrink the model for smoke tests (8ch, 1 block)"
    )
    args = ap.parse_args()

    overrides = {}
    if args.train_dir:
        overrides["train_gt_images_dir"] = args.train_dir
    if args.valid_dir:
        overrides["valid_gt_images_dir"] = args.valid_dir
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.d_arch:
        overrides["d_arch"] = args.d_arch
    if args.gt_size:
        overrides["gt_image_size"] = args.gt_size
        overrides["crop_image_size"] = 0
    if args.grad_accum:
        overrides["grad_accum_steps"] = args.grad_accum
    if args.pretrained_g:
        overrides["pretrained_g_model_weights_path"] = args.pretrained_g
    if args.pretrained_d:
        overrides["pretrained_d_model_weights_path"] = args.pretrained_d
    if args.skip_nonfinite:
        overrides["skip_nonfinite_updates"] = True
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = configs.get_config(args.config, **overrides)
    if args.tiny:
        shrink = {"channels": 8, "growth_channels": 4}
        count_key = "num_blocks" if cfg.g_arch.startswith("rrdbnet") else "num_rrdb"
        cfg = cfg.replace(g_kwargs={**cfg.g_kwargs, **shrink, count_key: 1})
    run_train(
        cfg,
        steps_per_epoch=args.steps_per_epoch,
        resume=args.resume,
        profile_dir=args.profile_dir,
        save_every_steps=args.save_every_steps,
        async_ckpt=args.async_ckpt,
        ckpt_every_epochs=args.ckpt_every_epochs,
    )


if __name__ == "__main__":
    main()
