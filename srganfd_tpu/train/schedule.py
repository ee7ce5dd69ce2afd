"""Learning-rate schedules.

Parity target: torch ``MultiStepLR`` stepped once per epoch
(``ESRGAN/train_esrgan.py:180-181``-style ``scheduler.step()`` calls):
lr = base * gamma^(number of milestones passed).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def multistep_lr(
    base_lr: float, milestones_steps: tuple[int, ...], gamma: float
) -> optax.Schedule:
    """MultiStepLR over optimizer step count. ``milestones_steps`` are
    global step indices (epoch milestones x steps_per_epoch)."""
    ms = jnp.asarray(sorted(milestones_steps), jnp.int32)

    def schedule(count):
        passed = jnp.sum(count >= ms) if ms.size else 0
        return base_lr * (gamma ** passed)

    return schedule
