"""Shared utilities: progress meters, image IO."""

from srganfd_tpu.utils.meters import AverageMeter, ProgressMeter, Summary  # noqa: F401
