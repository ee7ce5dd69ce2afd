"""Pallas TPU kernels for ops XLA schedules poorly.

Current kernels:
- ``filter2d_pallas``: per-sample 2-D filtering (the degradation chains'
  blur with a different kernel per batch element). The XLA lowering is a
  depthwise conv with N*C feature groups — VPU-bound with poor reuse;
  the Pallas kernel keeps the image tile and its kernel in VMEM and
  accumulates the KxK taps in registers.

Kernels ship with a jittable XLA fallback and an ``implementation=`` switch;
the default stays XLA until the Pallas path benchmarks faster on real
hardware (see bench notes in each module).
"""

from srganfd_tpu.ops.pallas.attention import flash_attention  # noqa: F401
from srganfd_tpu.ops.pallas.filter2d import filter2d_pallas  # noqa: F401
