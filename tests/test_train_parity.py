"""Optimizer-level lockstep training parity vs the reference trainer.

The strongest end-to-end parity statement available without pretrained
weights: run N full L1-pretrain updates of the reference's training rule
(reference RRDBNet topology in raw torch + ``torch.optim.Adam`` + the
weighted-L1 pixel criterion — the update of ``ESRGAN/train_rrdbnet.py``
driving ``ESRGAN/model.py:144-235``, weights/betas/eps from
``ESRGAN/esrgan_config.py``) and N steps of our jitted ``Trainer`` from
the SAME ported initialization on the SAME batches, then require the
final parameter trees to agree to f32 roundoff.  Passing proves the
model forward, the loss semantics, the gradients through clamp/LeakyReLU
/nearest-upsample, the Adam implementation (bias correction + eps
placement) and the schedule all match the reference simultaneously —
anything off by one epsilon placement diverges measurably within steps.
"""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import port_torch_weights as port  # noqa: E402
from test_generator_arch_parity import _TorchRRDB, _TorchRRDBNetX4  # noqa: E402

from srganfd_tpu.configs import get_config  # noqa: E402
from srganfd_tpu.train.loop import Trainer  # noqa: E402

N_STEPS = 3
BATCH, GT, SF = 2, 24, 4


def _flat(tree):
    return {
        "/".join(str(k.key) for k in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_rrdbnet_pretrain_lockstep_with_reference_trainer():
    torch.manual_seed(0)
    tmodel = _TorchRRDBNetX4(ch=8, gc=4, nb=2)
    sd0 = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    init = port.convert_rrdb_generator(sd0, num_blocks=2)

    cfg = get_config("rrdbnet").replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_blocks": 2},
    )
    # the reference update rule, torch side (ESRGAN/train_rrdbnet.py):
    # weighted-mean L1 + Adam(model_lr, model_betas, model_eps); the
    # MultiStepLR milestones are epochs away, so lr is constant here.
    opt = torch.optim.Adam(
        tmodel.parameters(),
        lr=cfg.model_lr,
        betas=cfg.model_betas,
        eps=cfg.model_eps,
        weight_decay=cfg.model_weight_decay,
    )
    crit = torch.nn.L1Loss()
    w = cfg.pixel_weight[0]

    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(42)
    gts = rng.uniform(size=(N_STEPS, BATCH, GT, GT, 3)).astype(np.float32)
    lrs = gts[:, :, ::SF, ::SF, :]

    state = tr.init_state(
        jax.random.PRNGKey(0), lrs.shape[1:], gts.shape[1:]
    )
    ported = jax.tree_util.tree_map(jnp.asarray, init)
    state = state.replace(
        g_params=ported,
        g_opt_state=tr.g_tx.init(ported),
        ema_g_params=jax.tree_util.tree_map(jnp.copy, ported),
    )

    torch_losses, jax_losses = [], []
    for i in range(N_STEPS):
        gt_t = torch.from_numpy(np.moveaxis(gts[i], -1, 1))
        lr_t = torch.from_numpy(np.moveaxis(lrs[i], -1, 1))
        opt.zero_grad()
        loss = w * crit(tmodel(lr_t), gt_t)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

        state, metrics = tr.train_step(
            state, jnp.asarray(gts[i]), jnp.asarray(lrs[i])
        )
        jax_losses.append(float(metrics["pixel_loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-6, atol=2e-7)

    sdN = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    want = _flat(port.convert_rrdb_generator(sdN, num_blocks=2))
    got = _flat(state.g_params)
    assert set(got) == set(want)
    for name in sorted(want):
        np.testing.assert_allclose(
            got[name], want[name], rtol=5e-4, atol=2e-6,
            err_msg=f"{name} diverged after {N_STEPS} lockstep updates",
        )

    # the updates are real: parameters moved from init by >> tolerance
    init_flat = _flat(init)
    moved = max(
        float(np.max(np.abs(got[n] - init_flat[n]))) for n in sorted(want)
    )
    assert moved > 1e-4, f"suspiciously small update {moved}"


class _TorchBSRGANX2(nn.Module):
    """Reference BSRGAN x2 topology + naming (``BSRGAN/model.py:311-384``:
    RRDBNet where upsampling1 always runs and upsampling2 only at x4)."""

    def __init__(self, ch=8, gc=4, nb=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3, ch, 3, 1, 1)
        self.trunk = nn.Sequential(*[_TorchRRDB(ch, gc) for _ in range(nb)])
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1)
        self.upsampling1 = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.2))
        self.conv3 = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.2))
        self.conv4 = nn.Conv2d(ch, 3, 3, 1, 1)

    def forward(self, x):
        out1 = self.conv1(x)
        out = out1 + self.conv2(self.trunk(out1))
        out = self.upsampling1(F.interpolate(out, scale_factor=2, mode="nearest"))
        return torch.clamp(self.conv4(self.conv3(out)), 0.0, 1.0)


class _TorchUNetD(nn.Module):
    """Reference U-Net SN discriminator topology + naming
    (``Real_ESRGAN/model.py:29-105`` == ``BSRGAN/model.py:91-167``):
    3 spectral-norm /2 down blocks, bilinear-up + SN-conv with skip adds,
    two SN convs, per-pixel logit conv."""

    def __init__(self, c=8):
        super().__init__()
        sn = torch.nn.utils.spectral_norm
        blk = lambda ci, co, k, s: nn.Sequential(
            sn(nn.Conv2d(ci, co, k, s, 1, bias=False)), nn.LeakyReLU(0.2)
        )
        self.conv1 = nn.Conv2d(3, c, 3, 1, 1)
        self.down_block1 = blk(c, c * 2, 4, 2)
        self.down_block2 = blk(c * 2, c * 4, 4, 2)
        self.down_block3 = blk(c * 4, c * 8, 4, 2)
        self.up_block1 = blk(c * 8, c * 4, 3, 1)
        self.up_block2 = blk(c * 4, c * 2, 3, 1)
        self.up_block3 = blk(c * 2, c, 3, 1)
        self.conv2 = blk(c, c, 3, 1)
        self.conv3 = blk(c, c, 3, 1)
        self.conv4 = nn.Conv2d(c, 1, 3, 1, 1)

    def forward(self, x):
        up = lambda t: F.interpolate(
            t, scale_factor=2, mode="bilinear", align_corners=False
        )
        out1 = self.conv1(x)
        down1 = self.down_block1(out1)
        down2 = self.down_block2(down1)
        down3 = self.down_block3(down2)
        up1 = self.up_block1(up(down3)) + down2
        up2 = self.up_block2(up(up1)) + down1
        up3 = self.up_block3(up(up2)) + out1
        return self.conv4(self.conv3(self.conv2(up3)))


_SN_SOURCES = [  # converter order == our SNConv_{i} auto-numbering
    "down_block1.0", "down_block2.0", "down_block3.0",
    "up_block1.0", "up_block2.0", "up_block3.0", "conv2.0", "conv3.0",
]


def _spectral_u_tree(d: nn.Module) -> dict:
    """torch spectral_norm's stored left-singular estimates -> our
    ``spectral`` variable collection (SNConv keeps one ``u`` per conv).
    The ``.copy()`` is load-bearing: ``.numpy()`` shares memory with the
    live buffer and CPU jax can alias numpy arrays zero-copy, so without
    it torch's in-place power iterations would mutate the injected
    'initial' u."""
    sd = d.state_dict()
    return {
        f"SNConv_{i}": {"u": jnp.asarray(sd[f"{src}.weight_u"].numpy().copy())}
        for i, src in enumerate(_SN_SOURCES)
    }


def _snapshot_sn_buffers(d: nn.Module) -> dict:
    return {
        k: v.detach().clone()
        for k, v in d.state_dict().items()
        if k.endswith(("weight_u", "weight_v"))
    }


def _restore_sn_buffers(d: nn.Module, snap: dict) -> None:
    sd = d.state_dict()
    with torch.no_grad():
        for k, v in snap.items():
            sd[k].copy_(v)


def test_bsrgan_gan_lockstep_with_reference_trainer():
    """Full GAN-step lockstep vs the reference update rule
    (``BSRGAN/train_bsrgan.py:387-471``): D-first ordering (d(gt) BCE real
    + d(sr.detach) BCE fake -> Adam), then the G update whose adversarial
    term sees the NEW discriminator, one generator forward per step,
    spectral-norm power iterations advancing exactly as the reference's
    (twice per D step; the G-pass iteration computes sigma but is not
    persisted — our documented PARITY deviation, reproduced torch-side by
    restoring the u/v buffers around the G pass), plus the EMA lerp.
    Content loss is dropped on BOTH sides: the reference's multi-node
    content term is graph-detached (``BSRGAN/model.py:552``) and so
    contributes no gradient anyway (SURVEY §2.10)."""
    torch.manual_seed(0)
    g_t = _TorchBSRGANX2(ch=8, gc=4, nb=1)
    d_t = _TorchUNetD(c=8)
    # .copy() everywhere a torch state dict feeds jax: .numpy() shares
    # memory with the live parameter and opt.step()/power iterations
    # mutate in place (CPU jax may alias numpy arrays zero-copy)
    g_init = port.convert_rrdb_generator(
        {k: v.detach().numpy().copy() for k, v in g_t.state_dict().items()}, num_blocks=1
    )
    d_init = port.convert_unet_discriminator(
        {k: v.detach().numpy().copy() for k, v in d_t.state_dict().items()}
    )

    cfg = get_config(
        "bsrgan",
        compute_dtype="float32",
        content_weight=(),
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 1},
        d_kwargs={"channels": 8},
    )
    pix_w, adv_w, ema_decay = cfg.pixel_weight[0], cfg.adversarial_weight[0], cfg.model_ema_decay

    g_opt = torch.optim.Adam(
        g_t.parameters(), lr=cfg.model_lr, betas=cfg.model_betas, eps=cfg.model_eps
    )
    d_opt = torch.optim.Adam(
        d_t.parameters(), lr=cfg.discriminator_lr, betas=cfg.model_betas, eps=cfg.model_eps
    )
    crit = nn.BCEWithLogitsLoss()
    l1 = nn.L1Loss()
    ema_t = {k: v.detach().clone() for k, v in g_t.state_dict().items()}

    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(7)
    gts = rng.uniform(size=(N_STEPS, BATCH, 16, 16, 3)).astype(np.float32)
    lrs = gts[:, :, ::2, ::2, :]

    state = tr.init_state(jax.random.PRNGKey(0), lrs.shape[1:], gts.shape[1:])
    g_p = jax.tree_util.tree_map(jnp.asarray, g_init)
    d_p = jax.tree_util.tree_map(jnp.asarray, d_init)
    state = state.replace(
        g_params=g_p,
        g_opt_state=tr.g_tx.init(g_p),
        ema_g_params=jax.tree_util.tree_map(jnp.copy, g_p),
        d_params=d_p,
        d_opt_state=tr.d_tx.init(d_p),
        d_vars={"spectral": _spectral_u_tree(d_t)},
    )

    t_losses, j_losses = [], []
    for i in range(N_STEPS):
        gt = torch.from_numpy(np.moveaxis(gts[i], -1, 1))
        lr = torch.from_numpy(np.moveaxis(lrs[i], -1, 1))
        ones = torch.ones((BATCH, 1, 16, 16))
        # --- reference D step: one G forward, two train-mode D forwards
        sr = g_t(lr)
        d_opt.zero_grad()
        d_loss = crit(d_t(gt), ones) + crit(d_t(sr.detach()), torch.zeros_like(ones))
        d_loss.backward()
        d_opt.step()
        # --- reference G step against the updated D; the reference would
        # also persist this forward's power iteration — ours doesn't
        # (PARITY deviation), so restore u/v around it for lockstep
        g_opt.zero_grad()
        snap = _snapshot_sn_buffers(d_t)
        g_loss = pix_w * l1(sr, gt) + adv_w * crit(d_t(sr), ones)
        _restore_sn_buffers(d_t, snap)
        g_loss.backward()
        g_opt.step()
        with torch.no_grad():
            for k, v in g_t.state_dict().items():
                ema_t[k].mul_(ema_decay).add_(v, alpha=1.0 - ema_decay)
        t_losses.append((float(d_loss.detach()), float(g_loss.detach())))

        state, m = tr.train_step(state, jnp.asarray(gts[i]), jnp.asarray(lrs[i]))
        j_losses.append((float(m["d_loss"]), float(m["g_loss"])))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-5, atol=3e-6)

    for label, got_tree, want_sd in [
        ("g", state.g_params, g_t.state_dict()),
        ("ema_g", state.ema_g_params, ema_t),
    ]:
        want = _flat(port.convert_rrdb_generator(
            {k: v.detach().numpy() for k, v in want_sd.items()}, num_blocks=1
        ))
        got = _flat(got_tree)
        assert set(got) == set(want)
        for name in sorted(want):
            np.testing.assert_allclose(
                got[name], want[name], rtol=5e-4, atol=5e-6,
                err_msg=f"{label}/{name} diverged after {N_STEPS} GAN steps",
            )
    want_d = _flat(port.convert_unet_discriminator(
        {k: v.detach().numpy() for k, v in d_t.state_dict().items()}
    ))
    got_d = _flat(state.d_params)
    assert set(got_d) == set(want_d)
    for name in sorted(want_d):
        np.testing.assert_allclose(
            got_d[name], want_d[name], rtol=5e-4, atol=5e-6,
            err_msg=f"d/{name} diverged after {N_STEPS} GAN steps",
        )
    # the spectral-norm power iterates advanced in lockstep too
    sd = d_t.state_dict()
    for i, src in enumerate(_SN_SOURCES):
        np.testing.assert_allclose(
            np.asarray(state.d_vars["spectral"][f"SNConv_{i}"]["u"]),
            sd[f"{src}.weight_u"].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"spectral u of {src} diverged",
        )


class _TorchVGG128D(nn.Module):
    """Reference ESRGAN VGG-style 128px discriminator topology + naming
    (``ESRGAN/model.py:89-141``): a ``features`` Sequential of conv64 +
    9 conv/BN/LeakyReLU stages down to 4x4, flatten (c-major), then a
    ``classifier`` of Linear(512*4*4 -> 100 -> 1) scalar logit."""

    def __init__(self, c=64):
        super().__init__()
        stages = [  # (in, features, kernel, stride) after the first conv
            (c, c, 4, 2), (c, c * 2, 3, 1), (c * 2, c * 2, 4, 2),
            (c * 2, c * 4, 3, 1), (c * 4, c * 4, 4, 2), (c * 4, c * 8, 3, 1),
            (c * 8, c * 8, 4, 2), (c * 8, c * 8, 3, 1), (c * 8, c * 8, 4, 2),
        ]
        seq = [nn.Conv2d(3, c, 3, 1, 1, bias=True), nn.LeakyReLU(0.2, True)]
        for ci, co, k, s in stages:
            seq += [
                nn.Conv2d(ci, co, k, s, 1, bias=False),
                nn.BatchNorm2d(co),
                nn.LeakyReLU(0.2, True),
            ]
        self.features = nn.Sequential(*seq)
        self.classifier = nn.Sequential(
            nn.Linear(c * 8 * 4 * 4, 100), nn.LeakyReLU(0.2, True), nn.Linear(100, 1)
        )

    def forward(self, x):
        return self.classifier(torch.flatten(self.features(x), 1))


def test_esrgan_relativistic_gan_lockstep_with_reference_trainer():
    """ESRGAN-family lockstep vs the reference update rule
    (``ESRGAN/train_esrgan.py:362-425``): G-FIRST ordering (G's
    relativistic adversarial term sees the OLD discriminator), symmetric
    relativistic BCE with half-weighted branches, BatchNorm D in train
    mode, EMA decay 0.99998. Content loss dropped on both sides (its
    gradient correctness is covered by tests/test_feature_arch_parity.py;
    real VGG19 weights are environment-gated).

    Two twin-construction notes. (1) BN running-stat CADENCE differs by
    design — the reference advances running stats on all five D forwards
    per step (incl. the G pass and its duplicated d(sr)), ours only on
    the D update's two (PARITY.md item: stats never affect train-mode
    forwards) — the torch twin applies exactly those two updates. (2) On
    CPU torch, ``native_batch_norm`` records running_mean/var in the
    autograd node, so the reference's literal multi-forward-then-backward
    pattern trips the saved-tensor version counter (CUDA's kernel doesn't
    save them); the twin therefore builds graphs with
    ``track_running_stats=False`` (identical train-mode numerics — batch
    stats either way) and applies the two real stat updates via no-grad
    forwards on the pre-step weights. The reference's duplicated d(sr)
    forward is also collapsed into one: same input and same parameters
    make it output-identical, and summing the two loss branches gives the
    same total derivative. Final batch_stats then pin ours too (up to
    flax's biased vs torch's unbiased running-var convention, corrected
    per layer below).

    Both sides run in FLOAT64 (conftest enables jax x64). In f32, Adam's
    first steps are ~lr*sign(m/sqrt(v)) per parameter, so the ~1e-5
    cross-framework conv roundoff flips the sign of near-zero gradient
    components and produces +/-2*lr per-param divergence within one step
    — numerical chaos, not an update-rule mismatch (measured: f32 grads
    agree to 1e-5 abs / ~1% worst-case rel at init, yet params differ by
    exactly lr=1e-4 after step 1, at any D width). f64 pushes the
    roundoff to ~1e-13, far below any plausible sign-flip threshold, so
    this lockstep genuinely tests the update rule; tolerances are
    correspondingly tight (a real rule mismatch shows up at the 1e-4
    update scale, 5 orders above the bar)."""
    torch.manual_seed(0)
    g_t = _TorchRRDBNetX4(ch=8, gc=4, nb=2).double()
    d_t = _TorchVGG128D(c=8).double()
    g_init = port.convert_rrdb_generator(
        {k: v.detach().numpy().copy() for k, v in g_t.state_dict().items()}, num_blocks=2
    )
    d_init, d_stats = port.convert_vgg_discriminator(
        {k: v.detach().numpy().copy() for k, v in d_t.state_dict().items()}
    )

    # epochs=100 keeps the MultiStepLR milestones genuinely epochs away
    # (the twin trains at constant base lr). The esrgan config's default
    # epochs=1 floors every fractional milestone (0.125..0.75) to epoch 0,
    # and torch's own MultiStepLR then runs epoch 0 at lr*gamma^4 — our
    # step-count schedule reproduces that degenerate case faithfully
    # (verified against torch), but it is not the reference training
    # regime and silently invalidated the twin's constant-lr assumption
    # (the round-2 red test's actual root cause: every update was exactly
    # 16x smaller than the twin's).
    cfg = get_config(
        "esrgan",
        compute_dtype="float64",
        content_weight=(),
        epochs=100,
        g_kwargs={"channels": 8, "growth_channels": 4, "num_blocks": 2},
        d_kwargs={"channels": 8},
    )
    assert cfg.g_step_first and cfg.relativistic_gan
    pix_w, adv_w, ema_decay = cfg.pixel_weight[0], cfg.adversarial_weight[0], cfg.model_ema_decay

    g_opt = torch.optim.Adam(
        g_t.parameters(), lr=cfg.model_lr, betas=cfg.model_betas, eps=cfg.model_eps
    )
    d_opt = torch.optim.Adam(
        d_t.parameters(), lr=cfg.discriminator_lr or cfg.model_lr,
        betas=cfg.model_betas, eps=cfg.model_eps,
    )
    crit = nn.BCEWithLogitsLoss()
    l1 = nn.L1Loss()
    ema_t = {k: v.detach().clone() for k, v in g_t.state_dict().items()}

    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(3)
    gts = rng.uniform(size=(N_STEPS, BATCH, 128, 128, 3))  # float64
    lrs = gts[:, :, ::4, ::4, :]

    state = tr.init_state(jax.random.PRNGKey(0), lrs.shape[1:], gts.shape[1:])
    g_p = jax.tree_util.tree_map(jnp.asarray, g_init)
    d_p = jax.tree_util.tree_map(jnp.asarray, d_init)
    state = state.replace(
        g_params=g_p,
        g_opt_state=tr.g_tx.init(g_p),
        ema_g_params=jax.tree_util.tree_map(jnp.copy, g_p),
        d_params=d_p,
        d_opt_state=tr.d_tx.init(d_p),
        d_vars={"batch_stats": jax.tree_util.tree_map(jnp.asarray, d_stats)},
    )

    d_t.train()

    def _track_stats(on: bool) -> None:
        for m_ in d_t.modules():
            if isinstance(m_, nn.BatchNorm2d):
                m_.track_running_stats = on

    ones = torch.ones((BATCH, 1), dtype=torch.float64)
    zeros = torch.zeros((BATCH, 1), dtype=torch.float64)
    t_losses, j_losses = [], []
    for i in range(N_STEPS):
        gt = torch.from_numpy(np.moveaxis(gts[i], -1, 1))
        lr = torch.from_numpy(np.moveaxis(lrs[i], -1, 1))
        _track_stats(False)  # graph forwards: batch-stat norm, no updates
        # --- reference G step first (train-mode D)
        sr = g_t(lr)
        g_opt.zero_grad()
        gt_out = d_t(gt)
        sr_out = d_t(sr)
        adv = adv_w * (
            0.5 * crit(gt_out - sr_out.mean(), zeros)
            + 0.5 * crit(sr_out - gt_out.mean(), ones)
        )
        g_loss = pix_w * l1(sr, gt) + adv
        g_loss.backward()
        g_opt.step()
        with torch.no_grad():
            for k, v in g_t.state_dict().items():
                ema_t[k].mul_(ema_decay).add_(v, alpha=1.0 - ema_decay)
        # --- reference D step (duplicate d(sr) forward collapsed, see
        # docstring note 2)
        d_opt.zero_grad()
        gt_out = d_t(gt)
        sr_out1 = d_t(sr.detach())
        d_loss_gt = 0.5 * crit(gt_out - sr_out1.mean(), ones)
        d_loss_sr = 0.5 * crit(sr_out1 - gt_out.mean(), zeros)
        d_loss = d_loss_gt + d_loss_sr
        d_loss.backward()
        # the D update's two running-stat advances (pre-step weights),
        # matching our d_update cadence
        _track_stats(True)
        with torch.no_grad():
            d_t(gt)
            d_t(sr.detach())
        d_opt.step()
        t_losses.append((float(g_loss.detach()), float(d_loss.detach())))

        state, m = tr.train_step(state, jnp.asarray(gts[i]), jnp.asarray(lrs[i]))
        j_losses.append((float(m["g_loss"]), float(m["d_loss"])))

    # losses come back through the f32 metrics dict: f32-rounding bound,
    # not an f64-trajectory bound (the param asserts below carry that)
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-7, atol=1e-9)

    for label, got_tree, want_sd, conv in [
        ("g", state.g_params, g_t.state_dict(), None),
        ("ema_g", state.ema_g_params, ema_t, None),
    ]:
        want = _flat(port.convert_rrdb_generator(
            {k: v.detach().numpy() for k, v in want_sd.items()}, num_blocks=2
        ))
        got = _flat(got_tree)
        assert set(got) == set(want)
        for name in sorted(want):
            np.testing.assert_allclose(
                got[name], want[name], rtol=1e-6, atol=1e-9,
                err_msg=f"{label}/{name} diverged after {N_STEPS} relativistic GAN steps",
            )
    want_d, want_stats = port.convert_vgg_discriminator(
        {k: v.detach().numpy() for k, v in d_t.state_dict().items()}
    )
    got_d = _flat(state.d_params)
    want_d = _flat(want_d)
    assert set(got_d) == set(want_d)
    for name in sorted(want_d):
        np.testing.assert_allclose(
            got_d[name], want_d[name], rtol=1e-6, atol=1e-9,
            err_msg=f"d/{name} diverged after {N_STEPS} relativistic GAN steps",
        )
    # BN running stats: means accumulate identically; for variances flax
    # accumulates the BIASED batch variance where torch accumulates the
    # unbiased one (factor n/(n-1), n = N*H*W at that stage). Only the
    # accumulated batch-var terms differ — the decayed initial var
    # (0.9^K * 1.0, K = 2 stat updates per step) is shared by both — so
    # the expected flax value is decay + (torch - decay) * (n-1)/n.
    spatial = [64, 64, 32, 32, 16, 16, 8, 8, 4]
    decay = 0.9 ** (2 * N_STEPS)
    got_stats = state.d_vars["batch_stats"]
    for i, s in enumerate(spatial):
        n = BATCH * s * s
        np.testing.assert_allclose(
            np.asarray(got_stats[f"BatchNorm_{i}"]["mean"]),
            want_stats[f"BatchNorm_{i}"]["mean"], rtol=1e-7, atol=1e-10,
            err_msg=f"BatchNorm_{i} running mean diverged",
        )
        np.testing.assert_allclose(
            np.asarray(got_stats[f"BatchNorm_{i}"]["var"]),
            decay + (want_stats[f"BatchNorm_{i}"]["var"] - decay) * (n - 1) / n,
            rtol=1e-7, atol=1e-10,
            err_msg=f"BatchNorm_{i} running var diverged",
        )


def test_realesrgan_gan_lockstep_with_reference_trainer():
    """Real-ESRGAN family lockstep vs the reference update rule
    (``Real_ESRGAN/train_realesrgan.py:415-474``): G-FIRST ordering with
    plain BCE on full [N,1,H,W] label maps, pixel (content dropped both
    sides — weights env-gated) loss vs the USM-SHARPENED gt while the
    discriminator judges the RAW gt, U-Net SN discriminator whose power
    iterations advance on the D update's two forwards (the G-pass
    iteration is not persisted — PARITY item 6, reproduced torch-side by
    restoring u/v around it), EMA 0.999. Both sides f64 (see the ESRGAN
    docstring: f32 GAN lockstep is chaotic). ``gt_usm`` is an
    independently drawn tensor — the USM operator itself is goldened in
    tests/test_degradation_ops.py; here only the update rule's use of two
    distinct targets is pinned."""
    torch.manual_seed(0)
    g_t = _TorchRRDBNetX4(ch=8, gc=4, nb=2).double()
    d_t = _TorchUNetD(c=8).double()
    g_init = port.convert_rrdb_generator(
        {k: v.detach().numpy().copy() for k, v in g_t.state_dict().items()}, num_blocks=2
    )
    d_init = port.convert_unet_discriminator(
        {k: v.detach().numpy().copy() for k, v in d_t.state_dict().items()}
    )

    cfg = get_config(
        "realesrgan",
        compute_dtype="float64",
        content_weight=(),
        epochs=100,  # milestones genuinely epochs away (see ESRGAN note)
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 2},
        d_kwargs={"channels": 8},
    )
    assert cfg.g_step_first and not cfg.relativistic_gan
    pix_w, adv_w, ema_decay = cfg.pixel_weight[0], cfg.adversarial_weight[0], cfg.model_ema_decay

    g_opt = torch.optim.Adam(
        g_t.parameters(), lr=cfg.model_lr, betas=cfg.model_betas, eps=cfg.model_eps
    )
    d_opt = torch.optim.Adam(
        d_t.parameters(), lr=cfg.discriminator_lr or cfg.model_lr,
        betas=cfg.model_betas, eps=cfg.model_eps,
    )
    crit = nn.BCEWithLogitsLoss()
    l1 = nn.L1Loss()
    ema_t = {k: v.detach().clone() for k, v in g_t.state_dict().items()}

    tr = Trainer(cfg, steps_per_epoch=1000)
    step = tr.make_train_step(separate_pixel_target=True)
    rng = np.random.default_rng(11)
    GT = 32
    gts = rng.uniform(size=(N_STEPS, BATCH, GT, GT, 3))
    usms = np.clip(gts + 0.05 * rng.standard_normal(gts.shape), 0.0, 1.0)
    lrs = gts[:, :, ::4, ::4, :]

    state = tr.init_state(jax.random.PRNGKey(0), lrs.shape[1:], gts.shape[1:])
    g_p = jax.tree_util.tree_map(jnp.asarray, g_init)
    d_p = jax.tree_util.tree_map(jnp.asarray, d_init)
    state = state.replace(
        g_params=g_p,
        g_opt_state=tr.g_tx.init(g_p),
        ema_g_params=jax.tree_util.tree_map(jnp.copy, g_p),
        d_params=d_p,
        d_opt_state=tr.d_tx.init(d_p),
        d_vars={"spectral": _spectral_u_tree(d_t)},
    )

    ones = torch.ones((BATCH, 1, GT, GT), dtype=torch.float64)
    zeros = torch.zeros((BATCH, 1, GT, GT), dtype=torch.float64)
    t_losses, j_losses = [], []
    for i in range(N_STEPS):
        gt = torch.from_numpy(np.moveaxis(gts[i], -1, 1))
        usm = torch.from_numpy(np.moveaxis(usms[i], -1, 1))
        lr = torch.from_numpy(np.moveaxis(lrs[i], -1, 1))
        # --- reference G step first (old D); pixel targets gt_usm
        sr = g_t(lr)
        g_opt.zero_grad()
        snap = _snapshot_sn_buffers(d_t)
        adv = adv_w * crit(d_t(sr), ones)
        _restore_sn_buffers(d_t, snap)
        g_loss = pix_w * l1(sr, usm) + adv
        g_loss.backward()
        g_opt.step()
        with torch.no_grad():
            for k, v in g_t.state_dict().items():
                ema_t[k].mul_(ema_decay).add_(v, alpha=1.0 - ema_decay)
        # --- reference D step: raw gt forward then sr forward (two
        # persisted power iterations, matching our d_update cadence)
        d_opt.zero_grad()
        d_loss = crit(d_t(gt), ones) + crit(d_t(sr.detach()), zeros)
        d_loss.backward()
        d_opt.step()
        t_losses.append((float(g_loss.detach()), float(d_loss.detach())))

        state, m = step(
            state, jnp.asarray(gts[i]), jnp.asarray(lrs[i]), jnp.asarray(usms[i])
        )
        j_losses.append((float(m["g_loss"]), float(m["d_loss"])))

    # f32 metrics-dict rounding bound (see ESRGAN test)
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-7, atol=1e-9)

    for label, got_tree, want_sd in [
        ("g", state.g_params, g_t.state_dict()),
        ("ema_g", state.ema_g_params, ema_t),
    ]:
        want = _flat(port.convert_rrdb_generator(
            {k: v.detach().numpy() for k, v in want_sd.items()}, num_blocks=2
        ))
        got = _flat(got_tree)
        assert set(got) == set(want)
        for name in sorted(want):
            np.testing.assert_allclose(
                got[name], want[name], rtol=1e-6, atol=1e-9,
                err_msg=f"{label}/{name} diverged after {N_STEPS} Real-ESRGAN steps",
            )
    want_d = _flat(port.convert_unet_discriminator(
        {k: v.detach().numpy() for k, v in d_t.state_dict().items()}
    ))
    got_d = _flat(state.d_params)
    assert set(got_d) == set(want_d)
    for name in sorted(want_d):
        np.testing.assert_allclose(
            got_d[name], want_d[name], rtol=1e-6, atol=1e-9,
            err_msg=f"d/{name} diverged after {N_STEPS} Real-ESRGAN steps",
        )
    sd = d_t.state_dict()
    for i, src in enumerate(_SN_SOURCES):
        np.testing.assert_allclose(
            np.asarray(state.d_vars["spectral"][f"SNConv_{i}"]["u"]),
            sd[f"{src}.weight_u"].numpy(), rtol=1e-6, atol=1e-9,
            err_msg=f"spectral u of {src} diverged",
        )


class _TorchAddAttn(nn.Module):
    """Reference A-ESRGAN attention gate topology + naming
    (``A-ESRGAN/model.py:228-254``)."""

    def __init__(self, xc, gc):
        super().__init__()
        self.W = nn.Sequential(
            nn.Conv2d(xc, xc, kernel_size=1, stride=1, padding=0), nn.BatchNorm2d(xc)
        )
        self.theta = nn.Conv2d(xc, xc, kernel_size=2, stride=2, padding=0, bias=False)
        self.phi = nn.Conv2d(gc, xc, kernel_size=1, stride=1, padding=0, bias=True)
        self.psi = nn.Conv2d(xc, 1, kernel_size=1, stride=1, padding=0, bias=True)

    def forward(self, x, g):
        theta_x = self.theta(x)
        phi_g = F.interpolate(
            self.phi(g), size=theta_x.shape[2:], mode="bilinear", align_corners=False
        )
        f = F.relu(theta_x + phi_g)
        sigm = torch.sigmoid(self.psi(f))
        sigm = F.interpolate(sigm, size=x.shape[2:], mode="bilinear", align_corners=False)
        return self.W(sigm.expand_as(x) * x), sigm


class _TorchUNetCat(nn.Module):
    """Reference upsample-then-concat merge (``A-ESRGAN/model.py:258-275``)."""

    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.convU = torch.nn.utils.spectral_norm(
            nn.Conv2d(dim_in, dim_out, 3, 1, 1, bias=False)
        )

    def forward(self, skip, deep):
        deep = F.interpolate(deep, scale_factor=2, mode="bilinear", align_corners=False)
        deep = F.leaky_relu(self.convU(deep), negative_slope=0.2)
        offset = deep.shape[2] - skip.shape[2]
        skip = F.pad(skip, 2 * [offset // 2, offset // 2])
        return torch.cat([skip, deep], 1)


class _TorchAESRGANAttnD(nn.Module):
    """Reference A-ESRGAN attention U-Net SN discriminator topology +
    naming (``A-ESRGAN/model.py:279-352``), incl. the 1x1 ``gating`` conv
    with padding=1 quirk."""

    def __init__(self, f=8):
        super().__init__()
        sn = torch.nn.utils.spectral_norm
        self.conv0 = nn.Conv2d(3, f, 3, 1, 1)
        self.conv1 = sn(nn.Conv2d(f, f * 2, 3, 2, 1, bias=False))
        self.conv2 = sn(nn.Conv2d(f * 2, f * 4, 3, 2, 1, bias=False))
        self.conv3 = sn(nn.Conv2d(f * 4, f * 8, 3, 2, 1, bias=False))
        self.gating = sn(nn.Conv2d(f * 8, f * 4, 1, 1, 1, bias=False))
        self.attn_1 = _TorchAddAttn(f * 4, f * 4)
        self.attn_2 = _TorchAddAttn(f * 2, f * 4)
        self.attn_3 = _TorchAddAttn(f, f * 4)
        self.cat_1 = _TorchUNetCat(f * 8, f * 4)
        self.cat_2 = _TorchUNetCat(f * 4, f * 2)
        self.cat_3 = _TorchUNetCat(f * 2, f)
        self.conv4 = sn(nn.Conv2d(f * 8, f * 4, 3, 1, 1, bias=False))
        self.conv5 = sn(nn.Conv2d(f * 4, f * 2, 3, 1, 1, bias=False))
        self.conv6 = sn(nn.Conv2d(f * 2, f, 3, 1, 1, bias=False))
        self.conv7 = sn(nn.Conv2d(f, f, 3, 1, 1, bias=False))
        self.conv8 = sn(nn.Conv2d(f, f, 3, 1, 1, bias=False))
        self.conv9 = nn.Conv2d(f, 1, 3, 1, 1)

    def forward(self, x):
        lre = lambda t: F.leaky_relu(t, negative_slope=0.2)
        x0 = lre(self.conv0(x))
        x1 = lre(self.conv1(x0))
        x2 = lre(self.conv2(x1))
        x3 = lre(self.conv3(x2))
        gated = lre(self.gating(x3))
        attn1, _ = self.attn_1(x2, gated)
        attn2, _ = self.attn_2(x1, gated)
        attn3, _ = self.attn_3(x0, gated)
        y = lre(self.conv4(self.cat_1(attn1, x3)))
        y = lre(self.conv5(self.cat_2(attn2, y)))
        y = lre(self.conv6(self.cat_3(attn3, y)))
        y = lre(self.conv7(y))
        y = lre(self.conv8(y))
        return self.conv9(y)


_AESRGAN_TOP_SN = [  # torch name per our SNConv_{i} auto-numbering
    "conv1", "conv2", "conv3", "gating", "conv4", "conv5", "conv6", "conv7", "conv8",
]


def _aesrgan_spectral_u(d: nn.Module) -> dict:
    sd = d.state_dict()
    tree = {
        f"SNConv_{i}": {"u": jnp.asarray(sd[f"{src}.weight_u"].numpy().copy())}
        for i, src in enumerate(_AESRGAN_TOP_SN)
    }
    for i, src in enumerate(["cat_1", "cat_2", "cat_3"]):
        tree[f"_UNetCat_{i}"] = {
            "SNConv_0": {"u": jnp.asarray(sd[f"{src}.convU.weight_u"].numpy().copy())}
        }
    return tree


def test_aesrgan_gan_lockstep_with_reference_trainer():
    """A-ESRGAN family lockstep vs the reference update rule
    (``A-ESRGAN/train_aesrgan.py:420-478``): D-FIRST ordering (gt forward,
    then sr from the CURRENT generator, two separate backwards = one
    summed one), plain BCE on full [N,1,H,W] label maps through the
    ATTENTION U-Net SN discriminator (gates with BatchNorm + the 1x1
    gating-padding quirk), then the G update whose adversarial term sees
    the UPDATED discriminator, asymmetric lrs (g 5e-5 / d 1e-5) and Adam
    eps 1e-4, EMA 0.999. Content loss dropped both sides (env-gated).
    Both sides f64 (see the ESRGAN docstring).

    The generator is overridden to the BSRGAN x2 topology: the fork's
    aesrgan config pairs this rule with BSRGANtrans, but the generator
    arch is orthogonal to the UPDATE RULE being pinned here (each G arch's
    forward/grad parity is covered by tests/test_generator_arch_parity.py
    / tests/test_models.py), and the transformer's f32 attention
    accumulators would defeat the f64 lockstep methodology.

    BN cadence torch-side: graph forwards run with
    ``track_running_stats=False`` (CPU autograd saved-tensor workaround,
    see the ESRGAN docstring note 2); the D update's two stat advances are
    applied via no-grad forwards AFTER restoring the spectral u/v to their
    pre-step values, so those forwards re-advance u along exactly the same
    two iterations our d_update persists — stats and u both end bit-equal
    to the single-pass reference semantics."""
    torch.manual_seed(0)
    g_t = _TorchBSRGANX2(ch=8, gc=4, nb=1).double()
    d_t = _TorchAESRGANAttnD(f=8).double().train()
    g_init = port.convert_rrdb_generator(
        {k: v.detach().numpy().copy() for k, v in g_t.state_dict().items()}, num_blocks=1
    )
    d_init, d_stats = port.convert_attention_unet_discriminator(
        {k: v.detach().numpy().copy() for k, v in d_t.state_dict().items()}
    )

    cfg = get_config(
        "aesrgan",
        compute_dtype="float64",
        content_weight=(),
        g_arch="bsrgan_x2",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_rrdb": 1},
        d_kwargs={"num_feat": 8},
    )
    assert not cfg.g_step_first and not cfg.relativistic_gan
    pix_w, adv_w, ema_decay = cfg.pixel_weight[0], cfg.adversarial_weight[0], cfg.model_ema_decay

    g_opt = torch.optim.Adam(
        g_t.parameters(), lr=cfg.model_lr, betas=cfg.model_betas, eps=cfg.model_eps
    )
    d_opt = torch.optim.Adam(
        d_t.parameters(), lr=cfg.discriminator_lr, betas=cfg.model_betas, eps=cfg.model_eps
    )
    crit = nn.BCEWithLogitsLoss()
    l1 = nn.L1Loss()
    ema_t = {k: v.detach().clone() for k, v in g_t.state_dict().items()}

    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(13)
    GT = 16
    gts = rng.uniform(size=(N_STEPS, BATCH, GT, GT, 3))
    lrs = gts[:, :, ::2, ::2, :]

    state = tr.init_state(jax.random.PRNGKey(0), lrs.shape[1:], gts.shape[1:])
    g_p = jax.tree_util.tree_map(jnp.asarray, g_init)
    d_p = jax.tree_util.tree_map(jnp.asarray, d_init)
    state = state.replace(
        g_params=g_p,
        g_opt_state=tr.g_tx.init(g_p),
        ema_g_params=jax.tree_util.tree_map(jnp.copy, g_p),
        d_params=d_p,
        d_opt_state=tr.d_tx.init(d_p),
        d_vars={
            "batch_stats": jax.tree_util.tree_map(jnp.asarray, d_stats),
            "spectral": _aesrgan_spectral_u(d_t),
        },
    )

    def _track_stats(on: bool) -> None:
        for m_ in d_t.modules():
            if isinstance(m_, nn.BatchNorm2d):
                m_.track_running_stats = on

    ones = torch.ones((BATCH, 1, GT, GT), dtype=torch.float64)
    zeros = torch.zeros((BATCH, 1, GT, GT), dtype=torch.float64)
    t_losses, j_losses = [], []
    for i in range(N_STEPS):
        gt = torch.from_numpy(np.moveaxis(gts[i], -1, 1))
        lr = torch.from_numpy(np.moveaxis(lrs[i], -1, 1))
        _track_stats(False)
        # --- reference D step first: d(gt), sr = g(lr), d(sr.detach())
        snap0 = _snapshot_sn_buffers(d_t)  # pre-step u/v for the stat pass
        d_opt.zero_grad()
        sr = g_t(lr)
        d_loss = crit(d_t(gt), ones) + crit(d_t(sr.detach()), zeros)
        d_loss.backward()
        # the two real stat advances (pre-step weights): restore u/v first
        # so these forwards re-run the SAME two power iterations
        _restore_sn_buffers(d_t, snap0)
        _track_stats(True)
        with torch.no_grad():
            d_t(gt)
            d_t(sr.detach())
        _track_stats(False)
        d_opt.step()
        # --- reference G step vs the UPDATED D (same sr graph)
        g_opt.zero_grad()
        snap = _snapshot_sn_buffers(d_t)
        adv = adv_w * crit(d_t(sr), ones)
        _restore_sn_buffers(d_t, snap)
        g_loss = pix_w * l1(sr, gt) + adv
        g_loss.backward()
        g_opt.step()
        with torch.no_grad():
            for k, v in g_t.state_dict().items():
                ema_t[k].mul_(ema_decay).add_(v, alpha=1.0 - ema_decay)
        t_losses.append((float(d_loss.detach()), float(g_loss.detach())))

        state, m = tr.train_step(state, jnp.asarray(gts[i]), jnp.asarray(lrs[i]))
        j_losses.append((float(m["d_loss"]), float(m["g_loss"])))

    # f32 metrics-dict rounding bound (see ESRGAN test)
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-7, atol=1e-9)

    for label, got_tree, want_sd in [
        ("g", state.g_params, g_t.state_dict()),
        ("ema_g", state.ema_g_params, ema_t),
    ]:
        want = _flat(port.convert_rrdb_generator(
            {k: v.detach().numpy() for k, v in want_sd.items()}, num_blocks=1
        ))
        got = _flat(got_tree)
        assert set(got) == set(want)
        for name in sorted(want):
            np.testing.assert_allclose(
                got[name], want[name], rtol=1e-6, atol=1e-9,
                err_msg=f"{label}/{name} diverged after {N_STEPS} A-ESRGAN steps",
            )
    want_d, want_stats = port.convert_attention_unet_discriminator(
        {k: v.detach().numpy() for k, v in d_t.state_dict().items()}
    )
    got_d = _flat(state.d_params)
    want_d = _flat(want_d)
    assert set(got_d) == set(want_d)
    for name in sorted(want_d):
        np.testing.assert_allclose(
            got_d[name], want_d[name], rtol=1e-6, atol=1e-9,
            err_msg=f"d/{name} diverged after {N_STEPS} A-ESRGAN steps",
        )
    # spectral u's advanced in lockstep (top-level + the cat convs)
    sd = d_t.state_dict()
    spectral = state.d_vars["spectral"]
    for i, src in enumerate(_AESRGAN_TOP_SN):
        np.testing.assert_allclose(
            np.asarray(spectral[f"SNConv_{i}"]["u"]),
            sd[f"{src}.weight_u"].numpy(), rtol=1e-6, atol=1e-9,
            err_msg=f"spectral u of {src} diverged",
        )
    for i, src in enumerate(["cat_1", "cat_2", "cat_3"]):
        np.testing.assert_allclose(
            np.asarray(spectral[f"_UNetCat_{i}"]["SNConv_0"]["u"]),
            sd[f"{src}.convU.weight_u"].numpy(), rtol=1e-6, atol=1e-9,
            err_msg=f"spectral u of {src}.convU diverged",
        )
    # gate BN running stats (biased/unbiased var correction, see the
    # ESRGAN test): spatial sizes of the three attn gates' W inputs
    decay = 0.9 ** (2 * N_STEPS)
    got_stats = state.d_vars["batch_stats"]
    for i, s in enumerate([GT // 4, GT // 2, GT]):
        n = BATCH * s * s
        bn_got = got_stats[f"_AddAttn_{i}"]["BatchNorm_0"]
        bn_want = want_stats[f"_AddAttn_{i}"]["BatchNorm_0"]
        np.testing.assert_allclose(
            np.asarray(bn_got["mean"]), bn_want["mean"], rtol=1e-7, atol=1e-10,
            err_msg=f"_AddAttn_{i} BN running mean diverged",
        )
        np.testing.assert_allclose(
            np.asarray(bn_got["var"]),
            decay + (bn_want["var"] - decay) * (n - 1) / n, rtol=1e-7, atol=1e-10,
            err_msg=f"_AddAttn_{i} BN running var diverged",
        )
