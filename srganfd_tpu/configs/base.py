"""Frozen experiment configuration shared by all model families.

Field names track the reference config-module surface (SURVEY.md §2 L0):
``ESRGAN/esrgan_config.py``, ``BSRGAN/bsrgan_config.py``,
``Real_ESRGAN/realesrgan_config.py``, ``A-ESRGAN/aesrgan_config.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    # identity
    name: str = "experiment"
    mode: str = "train"  # "train" | "test"
    seed: int = 0
    exp_name: str = ""

    # model
    g_arch: str = "rrdbnet_x4"
    d_arch: str | None = None
    upscale_factor: int = 4
    g_kwargs: dict[str, Any] = dataclasses.field(default_factory=dict)
    d_kwargs: dict[str, Any] = dataclasses.field(default_factory=dict)
    compute_dtype: str = "bfloat16"  # model compute dtype on TPU

    # data
    train_gt_images_dir: str = "data/train"
    valid_gt_images_dir: str = "data/valid"
    train_lr_images_dir: str = ""  # paired mode (PairedImageDataset)
    valid_lr_images_dir: str = ""
    test_gt_images_dir: str = ""
    test_lr_images_dir: str = ""
    crop_image_size: int = 0  # BSRGAN host-side pre-crop (0 = disabled)
    gt_image_size: int = 128
    batch_size: int = 16
    num_workers: int = 2

    # degradation pipeline feeding LR from GT
    degradation: str = "bicubic"  # "bicubic" | "bsrgan" | "realesrgan" | "paired"
    degradation_params: dict[str, Any] = dataclasses.field(default_factory=dict)

    # losses
    pixel_weight: tuple[float, ...] = (1.0,)
    content_weight: tuple[float, ...] = ()
    adversarial_weight: tuple[float, ...] = ()
    feature_nodes: tuple[str, ...] = ("features.34",)
    feature_normalize_mean: tuple[float, ...] = (0.485, 0.456, 0.406)
    feature_normalize_std: tuple[float, ...] = (0.229, 0.224, 0.225)
    relativistic_gan: bool = False  # ESRGAN uses relativistic pairing
    g_step_first: bool = True  # ESRGAN/Real-ESRGAN: G first; BSRGAN: D first
    content_detach_bug: bool = False  # replicate BSRGAN-family detach bug
    # one concatenated real|fake D forward in the D update (TPU batching
    # win). Auto-disabled for discriminators with BatchNorm statistics;
    # for SN-only Ds the sole divergence is one fewer power iteration per
    # step (PARITY.md item 6). Default False = the reference's literal two
    # forwards; perf configs (bench.py) opt in explicitly.
    fuse_d_forwards: bool = False

    # optimizer / schedule
    epochs: int = 1
    steps_per_epoch: int = 0  # 0 = derive from dataset
    model_lr: float = 1e-4
    discriminator_lr: float | None = None
    model_betas: tuple[float, float] = (0.9, 0.99)
    model_eps: float = 1e-8
    model_weight_decay: float = 0.0
    model_ema_decay: float = 0.999
    # reproduce the reference's literal AveragedModel EMA: INVERTED lerp
    # ((1-decay)*avg + decay*p, ESRGAN/train_esrgan.py:249 — its "EMA" is
    # ~the raw model) + first-update copy. Off = conventional EMA
    # (PARITY.md deviation 11).
    ema_reference_semantics: bool = False
    lr_scheduler_milestones: tuple[float, ...] = (0.125, 0.25, 0.5, 0.75)  # epoch fractions
    lr_scheduler_gamma: float = 0.5

    # evaluation / selection
    only_test_y_channel: bool = True
    optimizing_metric: str = "PSNR"  # "PSNR" | "LPIPS" | "Discriminator SR Prob"
    niqe_model_path: str = ""
    lpips_net: str = "alex"

    # checkpoints / tracking
    results_dir: str = "results"
    samples_dir: str = "samples"
    pretrained_g_model_weights_path: str = ""
    pretrained_d_model_weights_path: str = ""
    resume_g_model_weights_path: str = ""
    resume_d_model_weights_path: str = ""
    experience_name: str = ""
    run_name: str = ""
    run_id: str = ""
    tags: str = ""
    description: str = ""
    train_print_frequency: int = 100
    valid_print_frequency: int = 100

    # parallelism
    mesh_shape: tuple[int, ...] = (-1,)  # -1 = all local devices on 'data'
    mesh_axes: tuple[str, ...] = ("data",)
    # with a 'pipe' mesh axis (e.g. mesh_shape=(-1, 2),
    # mesh_axes=('data', 'pipe')) the generator's RRDB trunk is depth-
    # staged over it (parallel/pipeline.py; requires scan_blocks=True in
    # g_kwargs). 0 = one microbatch per pipeline stage.
    pipeline_microbatches: int = 0
    # multi-slice pods: per-axis DCN factors (same rank as mesh_shape).
    # When set, the mesh is built by make_hybrid_mesh so each axis's slow
    # DCN hops sit on its outer factor — put >1 only on the data axis.
    dcn_mesh_shape: tuple[int, ...] | None = None

    # training guards beyond the reference (both off by default so the
    # reference's exact optimizer semantics remain the baseline)
    grad_clip_norm: float = 0.0  # >0: clip grads by global norm (G and D)
    skip_nonfinite_updates: bool = False  # drop inf/nan update steps

    # gradient accumulation: each update phase scans the batch in this
    # many chunks and averages grads before one optimizer step — the
    # single-chip route to the reference's multi-GPU effective batches
    # (e.g. Real-ESRGAN's batch 48 on 4xA100). Exact for mean-type
    # losses; see PARITY.md for the batch-coupled caveats.
    grad_accum_steps: int = 1

    def replace(self, **kw: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    @property
    def milestones_epochs(self) -> tuple[int, ...]:
        return tuple(int(self.epochs * f) for f in self.lr_scheduler_milestones)

    @property
    def is_gan(self) -> bool:
        return self.d_arch is not None and len(self.adversarial_weight) > 0
