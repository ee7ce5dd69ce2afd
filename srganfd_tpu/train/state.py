"""Training state pytrees.

The reference keeps (model, ema_model, optimizer, scheduler, epoch,
best metrics) in ad-hoc checkpoint dicts (``ESRGAN/utils.py:85-101``);
here it's one flax.struct pytree that jit can donate.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class GanTrainState:
    step: jax.Array  # global optimizer step
    g_params: Any
    g_opt_state: Any
    ema_g_params: Any
    d_params: Any = None  # None for generator-only pretrain phases
    d_opt_state: Any = None
    d_vars: Any = None  # mutable collections: spectral u's, batch_stats
    g_vars: Any = None  # mutable collections of the generator (if any)


def ema_update(ema_params: Any, new_params: Any, decay: float) -> Any:
    """torch ``AveragedModel`` ema_avg fn: decay*avg + (1-decay)*p
    (``ESRGAN/train_esrgan.py:248-250``)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )
