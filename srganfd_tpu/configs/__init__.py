"""Per-model config modules preserving the reference's ``<model>_config.py``
surface (module-level names like ``g_model_arch_name``, ``upscale_factor``,
``mode``, loss weights, MLflow naming), each backed by a frozen
``ExperimentConfig`` dataclass via ``get_config()``.

Unlike the reference configs (which seed global RNGs and pick a CUDA
device at import time, e.g. ``BSRGAN/bsrgan_config.py:35-42``), these are
side-effect free: the seed and device mesh live in the dataclass.
"""

import importlib

from srganfd_tpu.configs.base import ExperimentConfig  # noqa: F401

_KNOWN = (
    "rrdbnet",
    "esrgan",
    "bsrnet",
    "bsrgan",
    "realesrnet",
    "realesrgan",
    "aesrgan",
)


def get_config(name: str, **overrides) -> ExperimentConfig:
    """Load ``srganfd_tpu.configs.<name>`` and return its config, applying
    keyword overrides (e.g. ``mode='train'``, ``epochs=1``)."""
    if name not in _KNOWN:
        raise KeyError(f"unknown config {name!r}; known: {_KNOWN}")
    mod = importlib.import_module(f"srganfd_tpu.configs.{name}")
    cfg = mod.get_config()
    return cfg.replace(**overrides) if overrides else cfg
