"""srganfd_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution GAN framework.

A ground-up rebuild of the capabilities of the SR-GAN-FD reference
(ESRGAN / BSRGAN / Real-ESRGAN / A-ESRGAN pipelines for fluid-dynamics
super-resolution), designed TPU-first:

- NHWC layouts, bf16 matmul/conv compute with f32 parameters,
- everything on the hot path jitted; degradations run on-device as fused
  XLA pipelines instead of per-sample CPU numpy/OpenCV,
- data parallelism via ``jax.sharding.Mesh`` + collective gradient sync,
- Pallas kernels for ops XLA does not fuse well.

Layout (mirrors SURVEY.md §7.1):
  configs/   per-model config modules preserving the reference config surface
  ops/       resize / color / degradation / JPEG / kernel-synthesis compute ops
  models/    Flax generators & discriminators + string-keyed registry
  losses/    GAN, VGG content, LPIPS-style perceptual losses
  metrics/   PSNR / SSIM / NIQE (bit-faithful vs. the PyTorch reference)
  data/      host-side datasets and batch assembly
  parallel/  device mesh, sharding helpers, host->HBM prefetch
  train/     jitted GAN train/eval steps, EMA, LR schedules, checkpointing
  track/     experiment tracking (JSONL always; MLflow/TensorBoard if present)
  cli/       train / test / inference entry points
"""

__version__ = "0.1.0"
