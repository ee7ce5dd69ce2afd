"""Experiment tracking adapters."""

from srganfd_tpu.track.tracker import Tracker  # noqa: F401
