"""CPU-normalized torch-vs-JAX step-time ratio for the bench config.

bench.py's ``vs_baseline`` anchors to an estimated 2.5 steps/s for the
PyTorch reference on A100. The reference publishes no steps/s
(BASELINE.md), so the anchor cannot be measured directly in this
zero-egress image; this harness firms it two ways:

1. **Same-hardware framework ratio**: run the exact bench GAN step
   (bsrgan_x4 23-RRDB generator + SN U-Net discriminator, pixel + BCE
   adversarial, Adam both sides, EMA, D-first) in PyTorch *and* in
   srganfd_tpu on THIS host's CPU. If the two frameworks are within a
   small factor on identical hardware, the TPU-vs-A100 headline is
   dominated by hardware + the TPU-first program structure, not by a
   framework artifact.
2. **Roofline derivation** (printed): conv MACs per step vs A100 peak at
   realistic conv utilization brackets the achievable torch step rate —
   the written derivation BASELINE.md cites.

The torch model here is OUR topology twin (same layout as
tests/test_generator_arch_parity.py), not reference code.

Usage:
    python tools/torch_anchor.py [--batch 4] [--gt 128] [--steps 3] \
        [--skip-jax] [--full]   # --full = the exact bench shape (slow on CPU)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------------------
# FLOPs derivation (independent of any framework)
# ---------------------------------------------------------------------------


def conv_macs(cin: int, cout: int, k: int, h: int, w: int) -> int:
    return cin * cout * k * k * h * w


# torchvision vgg19.features conv layout: (features index, cin, cout);
# maxpool halves the resolution after the relus of indices {2,7,16,25}
# on the way to features.34 (srganfd_tpu/losses/content.py layout twin).
_VGG19_LAYOUT = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
    (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
    (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512),
]
_VGG19_POOL_AFTER = {2, 7, 16, 25}


def vgg19_feature_macs(h: int, w: int, upto: int = 34) -> int:
    """MACs of one VGG19 ``features`` forward to node ``features.{upto}``
    (the multi-node ContentLoss pays exactly this — the deepest requested
    node dominates; shallower nodes are taps on the same trunk)."""
    macs = 0
    for idx, cin, cout in _VGG19_LAYOUT:
        if idx > upto:
            break
        macs += conv_macs(cin, cout, 3, h, w)
        if idx in _VGG19_POOL_AFTER and idx < upto:
            h //= 2
            w //= 2
    return macs


def content_forward_macs(batch: int, gt: int) -> int:
    """Per-step MACs of the BSRGAN-family multi-node content loss: VGG19
    forwards on BOTH sr and gt at full GT resolution every G step
    (``BSRGAN/train_bsrgan.py:450-453`` via ``BSRGAN/model.py:501-554``).
    The reference's ``torch.Tensor([losses])`` detach bug (SURVEY §2.10)
    means no VGG backward is ever paid — so the symmetric enumeration
    (and the bench step, run with ``content_detach_bug=True``) counts the
    two forwards only."""
    return batch * 2 * vgg19_feature_macs(gt, gt)


def bench_step_flops_x2(batch: int = 16, gt: int = 144, upscale: int = 2,
                        ch: int = 64, gc: int = 32, nb: int = 23,
                        content: bool = True) -> dict:
    """MACs for one full GAN step of the x2 thesis shape
    (``BSRGAN/bsrgan_config.py:97-101``: gt 144, batch 16). The x2
    generator runs ONE upsampling stage (``BSRGAN/model.py:311-384``), so
    the enumeration drops the x4 arch's second upsample conv; everything
    else mirrors :func:`bench_step_flops`, including the multi-node VGG19
    content forwards (``content=True``; the reference pays them every G
    step, ``BSRGAN/train_bsrgan.py:450-453``). At the x4 anchor's implied
    utilization (2.5 steps/s * 4.80 TFLOPs / 312 TFLOP/s ~ 3.85% of bf16
    peak, derived pre-content — BASELINE.md) the 16.88 TFLOPs/step here
    anchor the x2 bench line at ~0.71 steps/s."""
    lr = gt // upscale
    g = conv_macs(3, ch, 3, lr, lr)
    for k in range(5):
        cin = ch + gc * k
        cout = gc if k < 4 else ch
        g += nb * 3 * conv_macs(cin, cout, 3, lr, lr)
    g += conv_macs(ch, ch, 3, lr, lr)
    g += conv_macs(ch, ch, 3, gt, gt)  # single upsampling1 (2x == gt res)
    g += conv_macs(ch, ch, 3, gt, gt) + conv_macs(ch, 3, 3, gt, gt)
    d = conv_macs(3, ch, 3, gt, gt)
    d += conv_macs(ch, ch * 2, 4, gt // 2, gt // 2)
    d += conv_macs(ch * 2, ch * 4, 4, gt // 4, gt // 4)
    d += conv_macs(ch * 4, ch * 8, 4, gt // 8, gt // 8)
    d += conv_macs(ch * 8, ch * 4, 3, gt // 4, gt // 4)
    d += conv_macs(ch * 4, ch * 2, 3, gt // 2, gt // 2)
    d += conv_macs(ch * 2, ch, 3, gt, gt)
    d += 2 * conv_macs(ch, ch, 3, gt, gt) + conv_macs(ch, 1, 3, gt, gt)
    step_macs = batch * (3 * g + 3 * 2 * d + 2 * g + 3 * d)
    if content:
        step_macs += content_forward_macs(batch, gt)
    flops = 2 * step_macs
    # utilization stays DEFINED by the original pre-content x4 derivation
    # (2.5 steps/s at 4.8034 TFLOPs/step — BASELINE.md); adding the VGG
    # work at the same utilization slows the anchor proportionally
    x4_util = 2.5 * 4.80343228416e12 / 312e12
    return {
        "step_tflops": flops / 1e12,
        "a100_anchor_steps_per_sec_at_x4_util": round(312e12 * x4_util / flops, 3),
    }


def bench_step_flops(batch: int = 16, gt: int = 128, upscale: int = 4,
                     ch: int = 64, gc: int = 32, nb: int = 23,
                     content: bool = True) -> dict:
    """MACs for one full GAN step of the bench config (``content=True``
    adds the reference's per-step multi-node VGG19 content forwards,
    ``BSRGAN/train_bsrgan.py:450-453``)."""
    lr = gt // upscale
    # G forward: conv1 + trunk (nb * 3 RDBs * 5 convs) + conv2 at LR res,
    # 2 upsample convs at 2x/4x, conv3/conv4 at GT res
    g = conv_macs(3, ch, 3, lr, lr)
    for k in range(5):
        cin = ch + gc * k
        cout = gc if k < 4 else ch
        g += nb * 3 * conv_macs(cin, cout, 3, lr, lr)
    g += conv_macs(ch, ch, 3, lr, lr)
    g += conv_macs(ch, ch, 3, lr * 2, lr * 2)
    g += conv_macs(ch, ch, 3, gt, gt)
    g += conv_macs(ch, ch, 3, gt, gt) + conv_macs(ch, 3, 3, gt, gt)
    # D forward (SN U-Net at GT res)
    d = conv_macs(3, ch, 3, gt, gt)
    d += conv_macs(ch, ch * 2, 4, gt // 2, gt // 2)
    d += conv_macs(ch * 2, ch * 4, 4, gt // 4, gt // 4)
    d += conv_macs(ch * 4, ch * 8, 4, gt // 8, gt // 8)
    d += conv_macs(ch * 8, ch * 4, 3, gt // 4, gt // 4)
    d += conv_macs(ch * 4, ch * 2, 3, gt // 2, gt // 2)
    d += conv_macs(ch * 2, ch, 3, gt, gt)
    d += 2 * conv_macs(ch, ch, 3, gt, gt) + conv_macs(ch, 1, 3, gt, gt)
    # step = D update (2 D fwd + bwd ~ 3x fwd each) + G fwd (shared) +
    # G update (G fwd already done: bwd ~ 2x fwd; D fwd for adv + its bwd
    # through D)  -> conservative total in MACs:
    step_macs = batch * (3 * g + 3 * 2 * d + 2 * g + 3 * d)
    if content:
        step_macs += content_forward_macs(batch, gt)
    flops = 2 * step_macs
    a100_peak = 312e12  # bf16/tf32 tensor-core peak
    x4_util = 2.5 * 4.80343228416e12 / a100_peak  # pre-content derivation
    return {
        "step_tflops": flops / 1e12,
        "a100_anchor_steps_per_sec_at_x4_util": round(a100_peak * x4_util / flops, 3),
        "a100_steps_per_sec_at_util": {
            f"{int(u * 100)}%": round(a100_peak * u / flops, 2)
            for u in (0.05, 0.10, 0.20, 0.35)
        },
    }


# ---------------------------------------------------------------------------
# torch twin of the bench GAN step
# ---------------------------------------------------------------------------


def build_torch_models(ch: int, gc: int, nb: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class RDB(nn.Module):
        def __init__(self):
            super().__init__()
            for k in range(5):
                cin, cout = ch + gc * k, gc if k < 4 else ch
                setattr(self, f"conv{k + 1}", nn.Conv2d(cin, cout, 3, 1, 1))
            self.act = nn.LeakyReLU(0.2)

        def forward(self, x):
            feats = [x]
            for k in range(5):
                y = getattr(self, f"conv{k + 1}")(torch.cat(feats, 1))
                if k < 4:
                    y = self.act(y)
                feats.append(y)
            return feats[-1] * 0.2 + x

    class RRDB(nn.Module):
        def __init__(self):
            super().__init__()
            self.r1, self.r2, self.r3 = RDB(), RDB(), RDB()

        def forward(self, x):
            return self.r3(self.r2(self.r1(x))) * 0.2 + x

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, ch, 3, 1, 1)
            self.trunk = nn.Sequential(*[RRDB() for _ in range(nb)])
            self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1)
            self.up1 = nn.Conv2d(ch, ch, 3, 1, 1)
            self.up2 = nn.Conv2d(ch, ch, 3, 1, 1)
            self.conv3 = nn.Conv2d(ch, ch, 3, 1, 1)
            self.conv4 = nn.Conv2d(ch, 3, 3, 1, 1)
            self.act = nn.LeakyReLU(0.2)

        def forward(self, x):
            o1 = self.conv1(x)
            o = o1 + self.conv2(self.trunk(o1))
            o = self.act(self.up1(F.interpolate(o, scale_factor=2, mode="nearest")))
            o = self.act(self.up2(F.interpolate(o, scale_factor=2, mode="nearest")))
            return torch.clamp(self.conv4(self.act(self.conv3(o))), 0, 1)

    sn = nn.utils.spectral_norm

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Conv2d(3, ch, 3, 1, 1)
            self.d1 = sn(nn.Conv2d(ch, ch * 2, 4, 2, 1, bias=False))
            self.d2 = sn(nn.Conv2d(ch * 2, ch * 4, 4, 2, 1, bias=False))
            self.d3 = sn(nn.Conv2d(ch * 4, ch * 8, 4, 2, 1, bias=False))
            self.u3 = sn(nn.Conv2d(ch * 8, ch * 4, 3, 1, 1, bias=False))
            self.u2 = sn(nn.Conv2d(ch * 4, ch * 2, 3, 1, 1, bias=False))
            self.u1 = sn(nn.Conv2d(ch * 2, ch, 3, 1, 1, bias=False))
            self.c1 = sn(nn.Conv2d(ch, ch, 3, 1, 1, bias=False))
            self.c2 = sn(nn.Conv2d(ch, ch, 3, 1, 1, bias=False))
            self.c3 = nn.Conv2d(ch, 1, 3, 1, 1)
            self.act = nn.LeakyReLU(0.2)

        def forward(self, x):
            x0 = self.act(self.conv0(x))
            x1 = self.act(self.d1(x0))
            x2 = self.act(self.d2(x1))
            x3 = self.act(self.d3(x2))
            u = F.interpolate(x3, scale_factor=2, mode="bilinear", align_corners=False)
            u = self.act(self.u3(u)) + x2
            u = F.interpolate(u, scale_factor=2, mode="bilinear", align_corners=False)
            u = self.act(self.u2(u)) + x1
            u = F.interpolate(u, scale_factor=2, mode="bilinear", align_corners=False)
            u = self.act(self.u1(u)) + x0
            return self.c3(self.act(self.c2(self.act(self.c1(u)))))

    return G(), D()


def measure_torch(batch: int, gt: int, upscale: int, ch: int, gc: int, nb: int,
                  warmup: int, steps: int) -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    g, d = build_torch_models(ch, gc, nb)
    g_opt = torch.optim.Adam(g.parameters(), lr=8e-5, betas=(0.9, 0.99), eps=1e-4)
    d_opt = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.9, 0.99), eps=1e-4)
    ema = torch.optim.swa_utils.AveragedModel(
        g, avg_fn=lambda a, b, n: 0.999 * a + 0.001 * b
    )
    bce = nn.BCEWithLogitsLoss()
    l1 = nn.L1Loss()

    lr_img = torch.rand(batch, 3, gt // upscale, gt // upscale)
    gt_img = torch.rand(batch, 3, gt, gt)
    real = torch.ones(batch, 1, gt, gt)
    fake = torch.zeros(batch, 1, gt, gt)

    def step():
        # D first (BSRGAN ordering, train_bsrgan.py:406-438)
        d_opt.zero_grad(set_to_none=True)
        sr = g(lr_img)
        (bce(d(gt_img), real) + bce(d(sr.detach()), fake)).backward()
        d_opt.step()
        # G step
        g_opt.zero_grad(set_to_none=True)
        sr = g(lr_img)
        (20.0 * l1(sr, gt_img) + 0.5 * bce(d(sr), real)).backward()
        g_opt.step()
        ema.update_parameters(g)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return steps / (time.perf_counter() - t0)


def measure_jax(batch: int, gt: int, upscale: int, ch: int, gc: int, nb: int,
                warmup: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.configs import get_config
    from srganfd_tpu.train.loop import Trainer

    cfg = get_config("bsrgan").replace(
        upscale_factor=upscale,
        g_arch="bsrgan_x4" if upscale == 4 else "bsrgan_x2",
        g_kwargs={"channels": ch, "growth_channels": gc, "num_rrdb": nb,
                  "scan_blocks": True},
        gt_image_size=gt,
        batch_size=batch,
        content_weight=(),
        compute_dtype="float32",  # fair CPU comparison (torch conv is f32)
    )
    trainer = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    gt_b = jnp.asarray(rng.uniform(size=(batch, gt, gt, 3)).astype(np.float32))
    lr_b = jnp.asarray(
        rng.uniform(size=(batch, gt // upscale, gt // upscale, 3)).astype(np.float32)
    )
    state = trainer.init_state(jax.random.PRNGKey(0), lr_b.shape, gt_b.shape)
    for _ in range(warmup):
        state, metrics = trainer.train_step(state, gt_b, lr_b)
    jax.block_until_ready(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, gt_b, lr_b)
    jax.block_until_ready(metrics["g_loss"])
    return steps / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--gt", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--blocks", type=int, default=23)
    ap.add_argument("--full", action="store_true", help="exact bench shape (batch 16)")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()
    batch = 16 if args.full else args.batch

    out = {"config": {"batch": batch, "gt": args.gt, "upscale": 4,
                      "ch": 64, "gc": 32, "nb": args.blocks}}
    out["roofline"] = bench_step_flops(batch, args.gt, 4, 64, 32, args.blocks)
    out["torch_cpu_steps_per_sec"] = round(
        measure_torch(batch, args.gt, 4, 64, 32, args.blocks, args.warmup, args.steps), 4
    )
    if not args.skip_jax:
        out["jax_cpu_steps_per_sec"] = round(
            measure_jax(batch, args.gt, 4, 64, 32, args.blocks, args.warmup, args.steps), 4
        )
        out["jax_over_torch_cpu"] = round(
            out["jax_cpu_steps_per_sec"] / out["torch_cpu_steps_per_sec"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
