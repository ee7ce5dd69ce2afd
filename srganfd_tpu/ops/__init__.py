"""Compute ops: resize, color, filtering, degradations, JPEG, kernel synthesis.

All public functions here are pure, shape-static, and jittable unless
explicitly documented as host-side planners.
"""
