"""Jitted GAN / generator-only train and eval steps.

Parity targets (per-family step structure):
- ESRGAN (G first, relativistic): ``ESRGAN/train_esrgan.py:350-425``
- BSRGAN / A-ESRGAN (D first, plain BCE on label maps, G's adversarial
  term evaluated against the *updated* D): ``BSRGAN/train_bsrgan.py:395-471``
- Real-ESRGAN (G first, plain BCE, losses vs the USM-sharpened GT):
  ``Real_ESRGAN/train_realesrgan.py:392-471``
- generator-only L1 pretrain: ``ESRGAN/train_rrdbnet.py:213-286``

TPU design notes:
- One jitted step covers {G update, D update, EMA}: no AMP GradScaler —
  bf16 compute with f32 params/optimizer needs no loss scaling.
- The generator runs forward exactly once per step via ``jax.vjp``; each
  loss pulls its cotangent back through the saved residuals, matching the
  reference's retained-graph backward instead of recomputing the 23-RRDB
  trunk.
- Discriminator mutable state (spectral-norm u's, BatchNorm stats) is
  threaded through every D forward with ``train=True``, mirroring the
  torch modules living in ``.train()`` mode for the whole step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from srganfd_tpu.configs.base import ExperimentConfig
from srganfd_tpu.losses.content import ContentLoss
from srganfd_tpu.losses.gan import bce_with_logits, relativistic_d_loss, relativistic_g_loss
from srganfd_tpu.models import create_model
from srganfd_tpu.train.schedule import multistep_lr
from srganfd_tpu.train.state import GanTrainState, ema_update

__all__ = ["Trainer"]


def _first(x):
    """Discriminators that expose attention maps return tuples; the loss
    only needs the logit map(s) — which may itself be a tuple of per-scale
    maps for the multi-scale ensemble."""
    return x[0] if isinstance(x, tuple) else x


def _bce_scales(outputs, target: float) -> jax.Array:
    """BCE against a constant label over one logit map or a tuple of
    per-scale maps (multi-scale ensemble losses are summed, per the
    A-ESRGAN paper)."""
    if isinstance(outputs, tuple):
        return sum(
            bce_with_logits(o, jnp.full_like(o, target)) for o in outputs
        )
    return bce_with_logits(outputs, jnp.full_like(outputs, target))


def _mean_sigmoid(outputs) -> jax.Array:
    o = outputs[0] if isinstance(outputs, tuple) else outputs
    return jnp.mean(jax.nn.sigmoid(o))


def _all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of ``tree`` is free of NaN/Inf."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


def _weighted(weights: tuple[float, ...], losses: jax.Array) -> jax.Array:
    """torch.sum(torch.mul(w, losses)) with broadcast semantics
    (``BSRGAN/train_bsrgan.py:450-453``): scalar weight lists scale the
    summed loss; per-node lists dot with per-node losses."""
    w = jnp.asarray(weights, jnp.float32)
    losses = jnp.atleast_1d(losses)
    if w.shape[0] == 1 or losses.shape[0] == 1 or w.shape[0] == losses.shape[0]:
        return jnp.sum(w * losses)
    raise ValueError(f"weight list {w.shape} incompatible with losses {losses.shape}")


class Trainer:
    """Builds models/optimizers from an ExperimentConfig and exposes jitted
    ``train_step`` / ``eval_sr`` functions."""

    def __init__(
        self, cfg: ExperimentConfig, steps_per_epoch: int = 1000, mesh: Any = None
    ) -> None:
        self.cfg = cfg
        # float64 needs jax_enable_x64; it exists for lockstep parity tests
        # (f64 shrinks cross-framework roundoff below Adam's sign-flip
        # amplification threshold), never for TPU execution.
        dtype = {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(
            cfg.compute_dtype, jnp.float32
        )
        self.g_model = create_model(cfg.g_arch, dtype=dtype, **cfg.g_kwargs)
        # pipeline parallelism: a 'pipe' mesh axis stages the RRDB trunk's
        # depth (parallel/pipeline.py); every other axis layout leaves the
        # generator untouched.
        self._pp = None
        if mesh is not None and "pipe" in mesh.axis_names:
            if not getattr(self.g_model, "scan_blocks", False):
                raise ValueError(
                    "a 'pipe' mesh axis needs the scanned trunk layout: set "
                    "g_kwargs={'scan_blocks': True} (RRDB-trunk generators only)"
                )
            from srganfd_tpu.parallel.pipeline import pipelined_full_apply

            batch_axis = "data" if "data" in mesh.axis_names else None
            microbatches = cfg.pipeline_microbatches or mesh.shape["pipe"]
            self._pp = {
                "mesh": mesh,
                "batch_axis": batch_axis,
                "microbatches": microbatches,
                "apply": pipelined_full_apply(
                    self.g_model, mesh,
                    microbatches=microbatches, batch_axis=batch_axis,
                ),
            }
        self.d_model = (
            create_model(cfg.d_arch, dtype=dtype, **cfg.d_kwargs) if cfg.d_arch else None
        )
        self.content_loss = (
            ContentLoss(
                nodes=cfg.feature_nodes,
                weights=cfg.content_weight or 1.0,
                normalize_mean=cfg.feature_normalize_mean,
                normalize_std=cfg.feature_normalize_std,
                detach_bug=cfg.content_detach_bug,
                dtype=dtype,
            )
            if cfg.content_weight
            else None
        )

        milestones = tuple(m * steps_per_epoch for m in cfg.milestones_epochs)

        def tx(lr):
            # reference optimizer (Adam + MultiStepLR) with a production
            # guard the reference lacks (off by default): grad_clip_norm > 0
            # clips the global norm. skip_nonfinite_updates is enforced at
            # the update SITES in make_train_step (a where-select freeze of
            # params/opt-state/EMA/D-vars) rather than via
            # optax.apply_if_finite, which protects only params+opt-state —
            # a NaN forward would still poison EMA and the discriminator's
            # batch_stats / spectral-norm u permanently.
            chain = [
                optax.adamw(
                    multistep_lr(lr, milestones, cfg.lr_scheduler_gamma),
                    b1=cfg.model_betas[0],
                    b2=cfg.model_betas[1],
                    eps=cfg.model_eps,
                    weight_decay=cfg.model_weight_decay,
                )
            ]
            if cfg.grad_clip_norm:
                chain.insert(0, optax.clip_by_global_norm(cfg.grad_clip_norm))
            return optax.chain(*chain) if len(chain) > 1 else chain[0]

        self.g_tx = tx(cfg.model_lr)
        self.d_tx = tx(cfg.discriminator_lr or cfg.model_lr)
        self._train_step = None
        self._fused_step_cache: dict[tuple, Callable] = {}

    # -- initialization ------------------------------------------------------

    def init_state(self, rng: jax.Array, lr_shape: tuple, gt_shape: tuple) -> GanTrainState:
        g_rng, d_rng = jax.random.split(rng)
        g_vars = self.g_model.init(g_rng, jnp.zeros(lr_shape, jnp.float32))
        g_params = g_vars["params"]
        d_params = d_vars = d_opt = None
        if self.d_model is not None:
            dv = self.d_model.init(d_rng, jnp.zeros(gt_shape, jnp.float32))
            d_params = dv["params"]
            d_vars = {k: v for k, v in dv.items() if k != "params"}
            d_opt = self.d_tx.init(d_params)
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_opt_state=self.g_tx.init(g_params),
            # real copy: EMA must not alias g_params (jit donates the state)
            ema_g_params=jax.tree_util.tree_map(jnp.copy, g_params),
            d_params=d_params,
            d_opt_state=d_opt,
            d_vars=d_vars,
            g_vars={k: v for k, v in g_vars.items() if k != "params"} or None,
        )

    # -- pieces ---------------------------------------------------------------

    def _pp_divides(self, n: int) -> bool:
        pp = self._pp
        if n % pp["microbatches"]:
            return False
        mb = n // pp["microbatches"]
        dp = pp["mesh"].shape[pp["batch_axis"]] if pp["batch_axis"] else 1
        return mb % dp == 0

    def _g_apply(self, params: Any, lr_img: jax.Array) -> jax.Array:
        # batches that don't divide into microbatches (e.g. batch-1 eval),
        # or whose microbatch doesn't divide over the data axis, fall
        # through to the sequential trunk — the branch is static per
        # trace, and params stay the FULL tree either way (the pp split is
        # internal), so optimizer/EMA/checkpoints are layout-agnostic.
        if self._pp is not None and self._pp_divides(lr_img.shape[0]):
            return self._pp["apply"](params, lr_img)
        return self.g_model.apply({"params": params}, lr_img)

    def _d_apply(
        self, params: Any, d_vars: Any, x: jax.Array, update_stats: bool
    ) -> tuple[jax.Array, Any]:
        """Discriminator forward in train mode (batch statistics + spectral
        power iteration), matching the reference keeping D in ``.train()``
        for the whole step. ``update_stats=False`` still computes with
        batch stats but DISCARDS the state updates (the reference would
        also advance SN's u during the G step — a negligible divergence
        noted in PARITY.md)."""
        variables = {"params": params, **(d_vars or {})}
        mutable = list(d_vars.keys()) if d_vars else False
        if mutable:
            out, new_vars = self.d_model.apply(variables, x, mutable=mutable, train=True)
            return _first(out), (new_vars if update_stats else d_vars)
        out = self.d_model.apply(variables, x, train=True)
        return _first(out), d_vars

    # -- the step -------------------------------------------------------------

    def make_train_step(self, separate_pixel_target: bool = False) -> Callable:
        """``separate_pixel_target=True`` yields a 4-arg step
        ``(state, gt, lr, gt_pixel)`` where pixel/content losses target
        ``gt_pixel`` (Real-ESRGAN's USM-sharpened GT,
        ``Real_ESRGAN/train_realesrgan.py:424-426``) while the
        discriminator's real input stays the raw ``gt`` (:452)."""
        cfg = self.cfg
        pixel_w = cfg.pixel_weight
        adv_w = cfg.adversarial_weight
        has_d = self.d_model is not None and bool(adv_w)

        def g_losses(sr: jax.Array, gt: jax.Array, d_params, d_vars):
            parts = {}
            pixel = _weighted(pixel_w, jnp.mean(jnp.abs(sr - gt)))
            parts["pixel_loss"] = pixel
            total = pixel
            if self.content_loss is not None:
                content = self.content_loss(sr, gt)
                parts["content_loss"] = content
                total = total + content
            if has_d:
                sr_out, _ = self._d_apply(d_params, d_vars, sr, update_stats=False)
                if cfg.relativistic_gan:
                    gt_out, _ = self._d_apply(d_params, d_vars, gt, update_stats=False)
                    adv = _weighted(
                        adv_w, relativistic_g_loss(jax.lax.stop_gradient(gt_out), sr_out)
                    )
                else:
                    adv = _weighted(adv_w, _bce_scales(sr_out, 1.0))
                parts["adversarial_loss"] = adv
                total = total + adv
            parts["g_loss"] = total
            return total, parts

        def _split_scales(out, n: int):
            """Split a concatenated real|fake forward back into halves
            (handles multi-scale tuple outputs)."""
            if isinstance(out, tuple):
                halves = [(o[:n], o[n:]) for o in out]
                return tuple(h[0] for h in halves), tuple(h[1] for h in halves)
            return out[:n], out[n:]

        # gradient accumulation (grad_accum_steps > 1): each update phase
        # scans its batch in chunks, averaging grads before the single
        # optimizer step — the single-chip route to the reference's
        # multi-GPU effective batches. Exactly linear for mean-type losses
        # (pixel/content/plain BCE); per-chunk divergences exist only where
        # the loss or state is batch-coupled (relativistic opponent means,
        # BN batch stats, SN power-iteration cadence) — see PARITY.md.
        accum = max(1, int(cfg.grad_accum_steps))
        # failure protection (opt-in, beyond reference — SURVEY §5): when a
        # step's gradients contain NaN/Inf, freeze params/opt-state/EMA/
        # D-vars for that update instead of poisoning the run; the skip is
        # a where-select, so guarded finite steps stay bit-identical to
        # unguarded ones and compose with K-step scan / fused dispatch.
        guard = bool(cfg.skip_nonfinite_updates)

        def _pick(finite, new_tree, old_tree):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_tree, old_tree
            )

        def _chunk(x):
            if x.shape[0] % accum:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by grad_accum_steps {accum}"
                )
            return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

        def _unchunk(x):
            return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])

        _zeros = lambda tree: jax.tree_util.tree_map(jnp.zeros_like, tree)
        _add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
        _mean_of = lambda tree: jax.tree_util.tree_map(
            lambda v: jnp.mean(v, axis=0), tree
        )

        def d_update(state: GanTrainState, gt: jax.Array, sr_detached: jax.Array):
            # BatchNorm Ds (ESRGAN's VGG-128) must keep the reference's two
            # forwards: fusing would pool real+fake batch statistics.
            fuse = cfg.fuse_d_forwards and not (state.d_vars and "batch_stats" in state.d_vars)

            def make_d_loss(gt_b, sr_b):
                def d_loss_fn(d_params, d_vars):
                    if fuse:
                        both, d_vars = self._d_apply(
                            d_params, d_vars, jnp.concatenate([gt_b, sr_b], axis=0),
                            update_stats=True,
                        )
                        gt_out, sr_out = _split_scales(both, gt_b.shape[0])
                    else:
                        gt_out, d_vars = self._d_apply(d_params, d_vars, gt_b, update_stats=True)
                        sr_out, d_vars = self._d_apply(
                            d_params, d_vars, sr_b, update_stats=True
                        )
                    if cfg.relativistic_gan:
                        loss = relativistic_d_loss(gt_out, sr_out)
                    else:
                        loss = _bce_scales(gt_out, 1.0) + _bce_scales(sr_out, 0.0)
                    aux = {
                        "d_loss": loss,
                        "d_gt_probability": _mean_sigmoid(gt_out),
                        "d_sr_probability": _mean_sigmoid(sr_out),
                        "d_vars": d_vars,
                    }
                    return loss, aux

                return d_loss_fn

            if accum == 1:
                (_, aux), grads = jax.value_and_grad(
                    make_d_loss(gt, sr_detached), has_aux=True
                )(state.d_params, state.d_vars)
                d_vars_new = aux.pop("d_vars")
            else:

                def body(carry, xs):
                    d_vars, gsum = carry
                    gt_i, sr_i = xs
                    (_, aux_i), g_i = jax.value_and_grad(
                        make_d_loss(gt_i, sr_i), has_aux=True
                    )(state.d_params, d_vars)
                    d_vars = aux_i.pop("d_vars")
                    return (d_vars, _add(gsum, g_i)), aux_i

                (d_vars_new, gsum), auxs = jax.lax.scan(
                    body,
                    (state.d_vars, _zeros(state.d_params)),
                    (_chunk(gt), _chunk(sr_detached)),
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                aux = _mean_of(auxs)

            updates, d_opt_state = self.d_tx.update(
                grads, state.d_opt_state, state.d_params
            )
            d_params = optax.apply_updates(state.d_params, updates)
            if guard:
                finite = _all_finite(grads)
                d_params = _pick(finite, d_params, state.d_params)
                d_opt_state = _pick(finite, d_opt_state, state.d_opt_state)
                d_vars_new = _pick(finite, d_vars_new, state.d_vars)
                aux["d_update_skipped"] = 1.0 - finite.astype(jnp.float32)
            state = state.replace(
                d_params=d_params, d_opt_state=d_opt_state, d_vars=d_vars_new
            )
            return state, aux

        def g_fwd(state: GanTrainState, lr_img: jax.Array):
            return jax.vjp(lambda p: self._g_apply(p, lr_img), state.g_params)

        def g_update(state: GanTrainState, gt_pixel: jax.Array, lr_img: jax.Array, fwd=None):
            # one generator forward; losses pull back through the residuals.
            # ``fwd`` lets the D-first families reuse the forward they fed to
            # the discriminator update (valid: the D update leaves g_params
            # untouched, so the recomputation would be value-identical).
            if accum == 1:
                sr, g_vjp = fwd if fwd is not None else g_fwd(state, lr_img)

                def loss_wrt_sr(sr_in):
                    return g_losses(sr_in, gt_pixel, state.d_params, state.d_vars)

                (_, parts), sr_grad = jax.value_and_grad(loss_wrt_sr, has_aux=True)(sr)
                (g_grads,) = g_vjp(sr_grad)
                sr = jax.lax.stop_gradient(sr)
            else:
                # per-chunk vjp forwards: residuals live only for one chunk
                # (the memory point of accumulation); grads average exactly
                # for the mean-type losses.
                def body(gsum, xs):
                    gt_i, lr_i = xs
                    sr_i, vjp_i = jax.vjp(
                        lambda p: self._g_apply(p, lr_i), state.g_params
                    )
                    (_, parts_i), srg = jax.value_and_grad(
                        lambda s: g_losses(s, gt_i, state.d_params, state.d_vars),
                        has_aux=True,
                    )(sr_i)
                    (g_i,) = vjp_i(srg)
                    return _add(gsum, g_i), (parts_i, jax.lax.stop_gradient(sr_i))

                gsum, (parts_st, srs) = jax.lax.scan(
                    body, _zeros(state.g_params), (_chunk(gt_pixel), _chunk(lr_img))
                )
                g_grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                parts = _mean_of(parts_st)
                sr = _unchunk(srs)
            updates, g_opt_state = self.g_tx.update(g_grads, state.g_opt_state, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            ema = ema_update(
                state.ema_g_params, g_params, cfg.model_ema_decay,
                reference_semantics=cfg.ema_reference_semantics,
                step=state.step,
            )
            if guard:
                finite = _all_finite(g_grads)
                g_params = _pick(finite, g_params, state.g_params)
                g_opt_state = _pick(finite, g_opt_state, state.g_opt_state)
                ema = _pick(finite, ema, state.ema_g_params)
                parts["g_update_skipped"] = 1.0 - finite.astype(jnp.float32)
            state = state.replace(
                g_params=g_params,
                g_opt_state=g_opt_state,
                ema_g_params=ema,
                step=state.step + 1,
            )
            return state, parts, sr

        def step_impl(state: GanTrainState, gt: jax.Array, lr_img: jax.Array, gt_pixel: jax.Array):
            metrics: dict[str, jax.Array] = {}
            if not has_d:
                state, parts, _ = g_update(state, gt_pixel, lr_img)
                metrics.update(parts)
                return state, metrics
            if cfg.g_step_first:
                # ESRGAN/Real-ESRGAN: G update against the old D, then D
                # update on the same sr (ESRGAN/train_esrgan.py:362-425).
                state, parts, sr = g_update(state, gt_pixel, lr_img)
                metrics.update(parts)
                state, d_aux = d_update(state, gt, sr)
                metrics.update(d_aux)
            else:
                # BSRGAN/A-ESRGAN: D update on old-G sr, then G update whose
                # adversarial term sees the new D (train_bsrgan.py:406-471).
                # One G forward total: the vjp forward feeds both updates.
                # Under accumulation the shared vjp would pin full-batch
                # residuals, so the D phase uses a residual-free forward
                # instead (value-identical: g_params are still the old ones).
                if accum == 1:
                    fwd = g_fwd(state, lr_img)
                    state, d_aux = d_update(state, gt, jax.lax.stop_gradient(fwd[0]))
                else:
                    fwd = None
                    sr_d = jax.lax.stop_gradient(self._g_apply(state.g_params, lr_img))
                    state, d_aux = d_update(state, gt, sr_d)
                metrics.update(d_aux)
                state, parts, _ = g_update(state, gt_pixel, lr_img, fwd=fwd)
                metrics.update(parts)
            return state, metrics

        if separate_pixel_target:
            return jax.jit(step_impl, donate_argnums=(0,))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: GanTrainState, gt: jax.Array, lr_img: jax.Array):
            return step_impl(state, gt, lr_img, gt)

        return train_step

    @property
    def train_step(self) -> Callable:
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step

    # -- degradation-fused step ------------------------------------------------

    def _fused_bsrgan_step(
        self, scale2: bool, scale2_interp: int, effective_upscale: int, gt_size: int
    ) -> Callable:
        # Per-instance cache (a class-level functools.cache would key on
        # self and pin every Trainer + its donated-buffer closures for
        # process lifetime — ADVICE r1).
        key = (scale2, scale2_interp, effective_upscale, gt_size)
        cached = self._fused_step_cache.get(key)
        if cached is not None:
            return cached

        from srganfd_tpu.ops.degrade import _apply_chain_cropped

        step = self.train_step
        sf = self.cfg.upscale_factor

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused(state, gt_raw, ka, kb, jq, japply, fjq, pos_arr, tops, lefts):
            gt_c, lr_c = _apply_chain_cropped(
                gt_raw, ka, kb, jq, japply, fjq, pos_arr, tops, lefts,
                0, True, scale2, scale2_interp, effective_upscale, gt_size, sf,
            )
            return step(state, gt_c, lr_c)

        self._fused_step_cache[key] = fused
        return fused

    def bsrgan_fused_train_step(self, state, gt_raw, plan, tops, lefts, gt_size: int):
        """BSRGAN chain + aligned crop + GAN update as ONE jitted program —
        a single device dispatch per step for remote-execution tunnels
        where each dispatch has ~0.1 s fixed latency
        (docs/tpu_performance.md). Requires a per-sample-order plan
        (``plan_bsrgan_batch(..., per_sample_order=True)``) so the JPEG
        slot is an operand; compile variants are only the scale2 branch
        (1 program at x2, <=5 at x4). Accepts uint8 or float GT batches.
        """
        import numpy as np_

        fused = self._fused_bsrgan_step(
            plan.scale2, plan.scale2_interp, plan.effective_upscale, gt_size
        )
        return fused(
            state,
            gt_raw,
            jnp.asarray(plan.kernels_a),
            jnp.asarray(plan.kernels_b),
            jnp.asarray(plan.jpeg_quality),
            jnp.asarray(plan.jpeg_apply),
            jnp.asarray(plan.final_jpeg_quality),
            jnp.asarray(np_.asarray(plan.jpeg_pos)),
            jnp.asarray(tops),
            jnp.asarray(lefts),
        )

    def _fused_bsrgan_multi_step(
        self, scale2: bool, scale2_interp: int, effective_upscale: int,
        gt_size: int, n_steps: int,
    ) -> Callable:
        key = (scale2, scale2_interp, effective_upscale, gt_size, n_steps)
        cached = self._fused_step_cache.get(key)
        if cached is not None:
            return cached

        from srganfd_tpu.ops.degrade import _apply_chain_cropped

        step = self.train_step
        sf = self.cfg.upscale_factor

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_multi(state, gt_raws, kas, kbs, jqs, japplys, fjqs, poss, topss, leftss):
            def body(st, xs):
                gt_raw, ka, kb, jq, japply, fjq, pos, tops, lefts = xs
                gt_c, lr_c = _apply_chain_cropped(
                    gt_raw, ka, kb, jq, japply, fjq, pos, tops, lefts,
                    0, True, scale2, scale2_interp, effective_upscale, gt_size, sf,
                )
                return step(st, gt_c, lr_c)

            state_out, ms = jax.lax.scan(
                body, state,
                (gt_raws, kas, kbs, jqs, japplys, fjqs, poss, topss, leftss),
            )
            return state_out, jax.tree_util.tree_map(lambda v: jnp.mean(v, axis=0), ms)

        self._fused_step_cache[key] = fused_multi
        return fused_multi

    def bsrgan_fused_train_multi_step(
        self, state, gt_raws, plans, tops_list, lefts_list, gt_size: int,
        batch_sharding=None,
    ):
        """K train steps (each with its own degradation chain + crop) as ONE
        jitted ``lax.scan`` program — one device dispatch per K steps. On
        remote-execution tunnels with ~0.1-0.25 s fixed cost per dispatch
        this amortizes the host side K-fold over :meth:`bsrgan_fused_train_step`.

        All K plans must share the same static branch
        ``(scale2, scale2_interp, effective_upscale)`` — the caller groups
        steps by that key (srganfd_tpu/cli/train.py). Returned metrics are
        the MEAN over the K steps. Numerics per step are identical to K
        sequential fused steps (pinned by
        tests/test_train.py::test_bsrgan_fused_multi_step_matches_sequential).
        """
        import numpy as np_

        first = plans[0]
        skey = (first.scale2, first.scale2_interp, first.effective_upscale)
        if any((p.scale2, p.scale2_interp, p.effective_upscale) != skey for p in plans):
            raise ValueError("all plans in a multi-step dispatch must share the static branch")
        fused = self._fused_bsrgan_multi_step(*skey, gt_size, len(plans))

        def stack(xs):
            return jnp.asarray(np_.stack([np_.asarray(x) for x in xs]))

        # callers should pass HOST gt batches (np.stack of device arrays is
        # a device->host pull); under dp the stacked (K, B, ...) array gets
        # the caller's batch-on-dim-1 sharding in ONE placement
        gt_stacked = np_.stack([np_.asarray(x) for x in gt_raws])
        gt_stacked = (
            jax.device_put(gt_stacked, batch_sharding)
            if batch_sharding is not None
            else jnp.asarray(gt_stacked)
        )

        return fused(
            state,
            gt_stacked,
            stack([p.kernels_a for p in plans]),
            stack([p.kernels_b for p in plans]),
            stack([p.jpeg_quality for p in plans]),
            stack([p.jpeg_apply for p in plans]),
            stack([p.final_jpeg_quality for p in plans]),
            stack([p.jpeg_pos for p in plans]),
            stack(tops_list),
            stack(lefts_list),
        )

    # -- generic K-step dispatch (all families) -------------------------------

    def make_train_multi_step(self, separate_pixel_target: bool = False) -> Callable:
        """K pre-degraded train steps scanned into ONE jitted dispatch.

        The family-agnostic analog of :meth:`bsrgan_fused_train_multi_step`:
        takes a tuple of K batch dicts (``{"gt", "lr"[, "gt_pixel"]}``, as
        produced by the CLI's ``DegradationAdapter``), stacks them inside
        the program, and ``lax.scan``s the ordinary train step over them —
        one remote execution per K steps. Per-step numerics are identical
        to K sequential ``train_step`` calls; returned metrics are the
        MEAN over the K steps. K is implicit in the pytree structure (jit
        retraces per K).
        """
        key = ("plain_multi", separate_pixel_target)
        cached = self._fused_step_cache.get(key)
        if cached is not None:
            return cached

        step = self.make_train_step(separate_pixel_target=separate_pixel_target)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi(state, batches):
            gts = jnp.stack([b["gt"] for b in batches])
            lrs = jnp.stack([b["lr"] for b in batches])
            if separate_pixel_target:
                gps = jnp.stack([b["gt_pixel"] for b in batches])

                def body(st, xs):
                    return step(st, xs[0], xs[1], xs[2])

                state_out, ms = jax.lax.scan(body, state, (gts, lrs, gps))
            else:

                def body(st, xs):
                    return step(st, xs[0], xs[1])

                state_out, ms = jax.lax.scan(body, state, (gts, lrs))
            return state_out, jax.tree_util.tree_map(lambda v: jnp.mean(v, axis=0), ms)

        self._fused_step_cache[key] = multi
        return multi

    # -- eval -----------------------------------------------------------------

    @functools.cached_property
    def eval_sr(self) -> Callable:
        """jitted ``(g_params, lr) -> sr`` (pass ``state.ema_g_params`` for
        EMA evaluation, mirroring the reference validating the EMA model)."""
        return jax.jit(self._g_apply)
