"""Jitted training/eval steps, EMA, schedules, checkpointing."""

from srganfd_tpu.train.state import GanTrainState  # noqa: F401
from srganfd_tpu.train.schedule import multistep_lr  # noqa: F401
