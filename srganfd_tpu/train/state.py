"""Training state pytrees.

The reference keeps (model, ema_model, optimizer, scheduler, epoch,
best metrics) in ad-hoc checkpoint dicts (``ESRGAN/utils.py:85-101``);
here it's one flax.struct pytree that jit can donate.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


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


def ema_update(
    ema_params: Any,
    new_params: Any,
    decay: float,
    reference_semantics: bool = False,
    step: Any = None,
) -> Any:
    """EMA lerp. Default: the CONVENTIONAL ``decay*avg + (1-decay)*p``.

    The reference's ``AveragedModel`` ema_avg is defined INVERTED —
    ``(1-decay)*avg + decay*p`` (``ESRGAN/train_esrgan.py:249``), so with
    decay 0.999/0.99998 its "EMA" is >=99.9% the current raw model — and
    torch's ``AveragedModel`` COPIES the model on the first
    ``update_parameters`` call instead of lerping. We default to the
    clearly intended conventional EMA (PARITY.md deviation 11);
    ``reference_semantics=True`` (+ the pre-update ``step`` counter for
    the first-call copy) reproduces the reference's literal behavior for
    parity studies."""
    if reference_semantics:
        def lerp(e, p):
            out = (1.0 - decay) * e + decay * p
            return jnp.where(step == 0, p, out) if step is not None else out

        return jax.tree_util.tree_map(lerp, ema_params, new_params)
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )
