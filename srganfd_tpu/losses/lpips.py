"""LPIPS (AlexNet backbone) perceptual distance in JAX.

Parity target: the external ``lpips.LPIPS(net='alex')`` package used as a
validation metric and model-selection criterion
(``ESRGAN/train_esrgan.py:34,101``; ``BSRGAN/train_bsrgan.py:115,185-188``).

Reference quirk preserved as the default: the train scripts prepare
[-1,1]-normalized tensors but then pass the *unnormalized* [0,1] images to
``lpips()`` (``ESRGAN/train_esrgan.py:524-526``,
``BSRGAN/train_bsrgan.py:569-571``). ``Lpips.__call__(..., assume_unit_range=True)``
reproduces that; pass ``False`` when feeding [-1,1] inputs.

Weights: the pip package's pretrained AlexNet + linear-head weights are not
downloadable here. ``load_lpips_params`` loads from an .npz
(``$SRGANFD_LPIPS_NPZ``) when present; otherwise a deterministic seeded
surrogate is used (``pretrained=False``) — random-feature perceptual
distances remain a usable relative selection signal, but absolute values
differ from the torch package.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Lpips", "AlexNetFeatures", "load_lpips_params"]

# LPIPS input scaling layer constants (applied to [-1,1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ALEX_STAGES = [
    # (features, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool(3, s2) after relu of these stage indices


class AlexNetFeatures(nn.Module):
    """AlexNet ``features`` trunk returning the 5 post-ReLU taps LPIPS uses."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        x = x.astype(self.dtype)
        taps = []
        for i, (feats, k, s, p) in enumerate(_ALEX_STAGES):
            x = nn.Conv(
                feats,
                (k, k),
                strides=(s, s),
                padding=((p, p), (p, p)),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            taps.append(x.astype(jnp.float32))
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


def load_lpips_params(npz_path: str | None = None) -> tuple[dict, list[np.ndarray], bool]:
    """Returns ``(alexnet_variables, linear_head_weights, pretrained)``.

    npz keys: ``alex.{i}.weight``/``alex.{i}.bias`` (OIHW) for the five
    convs, ``lin.{i}.weight`` with shape (1, C, 1, 1) for the heads.
    """
    path = npz_path or os.environ.get("SRGANFD_LPIPS_NPZ", "")
    module = AlexNetFeatures()
    variables = module.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
    chans = [64, 192, 384, 256, 256]
    if path and os.path.exists(path):
        data = np.load(path)
        params = dict(variables["params"])
        for i in range(5):
            w = data[f"alex.{i}.weight"]
            b = data[f"alex.{i}.bias"]
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(b),
            }
        lins = [np.asarray(data[f"lin.{i}.weight"]).reshape(-1) for i in range(5)]
        return {"params": params}, lins, True
    rng = np.random.default_rng(7)
    lins = [np.abs(rng.normal(0, 1, c)).astype(np.float32) / c for c in chans]
    return variables, lins, False


class Lpips:
    """Callable LPIPS distance over NHWC images; returns shape (N,)."""

    def __init__(self, npz_path: str | None = None) -> None:
        self.module = AlexNetFeatures()
        self.variables, lins, self.pretrained = load_lpips_params(npz_path)
        self.lins = [jnp.asarray(l) for l in lins]

    def _feats(self, x: jax.Array) -> list[jax.Array]:
        x = (x - _SHIFT) / _SCALE
        return self.module.apply(self.variables, x)

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Inputs pass straight into the LPIPS scaling layer, exactly like
        the torch package: feed [-1,1] for the LPIPS convention, or [0,1]
        to reproduce the reference scripts' quirk of passing unnormalized
        images (``ESRGAN/train_esrgan.py:524-526``)."""
        fa, fb = self._feats(a), self._feats(b)
        total = 0.0
        for xa, xb, lin in zip(fa, fb, self.lins):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff2 = (na - nb) ** 2
            val = jnp.mean(jnp.sum(diff2 * lin, axis=-1), axis=(1, 2))
            total = total + val
        return total
