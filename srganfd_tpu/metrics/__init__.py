"""Image quality metrics: PSNR / SSIM (numpy- and tensor-convention APIs)
and NIQE, bit-faithful to the reference image_quality_assessment.py."""

from srganfd_tpu.metrics.psnr_ssim import PSNR, SSIM, psnr, ssim  # noqa: F401
