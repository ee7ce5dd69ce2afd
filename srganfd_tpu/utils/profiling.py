"""Tracing / profiling hooks.

The reference's only profiler is wall-clock AverageMeters
(``ESRGAN/train_esrgan.py:319-320``; SURVEY.md §5). This module keeps that
meter surface (utils.meters) and adds the TPU-native layer: jax.profiler
traces viewable in TensorBoard/Perfetto, plus per-step device timing via
block_until_ready deltas.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (open with
    TensorBoard's profile plugin or Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Device-accurate step timing: blocks on the step's outputs, so the
    measured interval covers the full dispatch+execute, unlike the
    reference's host-side meters which can hide async execution."""

    def __init__(self) -> None:
        self.last = time.perf_counter()

    def lap(self, *block_on) -> float:
        for x in block_on:
            jax.block_until_ready(x)
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        return dt
