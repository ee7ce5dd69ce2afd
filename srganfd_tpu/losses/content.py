"""VGG19 perceptual (content) loss in JAX.

Parity targets:
- single-node ContentLoss at ``features.34`` with ImageNet normalization
  and L1 on features (``ESRGAN/model.py:246-292``);
- multi-node variant at ``["features.2","features.7","features.16",
  "features.25","features.34"]`` returning a per-node loss vector
  (``BSRGAN/model.py:501-554``). The reference rebuilds that list via
  ``torch.Tensor([losses])`` which silently detaches the graph, so content
  loss contributes no gradient there (SURVEY.md §2.10); here gradients
  flow by default and ``detach_bug=True`` reproduces the reference
  behavior for parity runs.

Weights: torchvision's IMAGENET1K_V1 VGG19 weights cannot be downloaded in
this environment; ``load_vgg19_params`` loads them from an .npz (path or
``SRGANFD_VGG19_NPZ`` env var) when available and otherwise falls back to
deterministic He-init features (flagged via ``pretrained=False`` in the
returned metadata). Random-feature perceptual losses still train; metric
parity versus the torch reference requires the real weights.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VGG19Features", "ContentLoss", "load_vgg19_params", "VGG19_NODES"]

# torchvision vgg19.features layout: conv indices per stage.
_VGG19_CONV_LAYOUT: list[tuple[int, int]] = [
    # (torchvision features index, out_channels)
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512), (30, 512), (32, 512), (34, 512),
]
_POOL_AFTER = {2, 7, 16, 25, 34}  # maxpool follows the relu after these convs

VGG19_NODES = [f"features.{i}" for i, _ in _VGG19_CONV_LAYOUT]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """VGG19 ``features`` trunk (convs + ReLU + maxpool), NHWC, returning
    the raw conv outputs (pre-ReLU) at the requested torchvision node
    names — matching ``create_feature_extractor`` semantics where node
    ``features.N`` is the conv module's output."""

    nodes: Sequence[str] = ("features.34",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        x = x.astype(self.dtype)
        wanted = set(self.nodes)
        max_idx = max(int(n.split(".")[1]) for n in self.nodes)
        outputs: dict[str, jax.Array] = {}
        for idx, feats in _VGG19_CONV_LAYOUT:
            x = nn.Conv(
                feats,
                (3, 3),
                padding=((1, 1), (1, 1)),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.he_normal(),
                name=f"conv{idx}",
            )(x)
            name = f"features.{idx}"
            if name in wanted:
                outputs[name] = x.astype(jnp.float32)
            if idx >= max_idx:
                break
            x = nn.relu(x)
            if idx in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return [outputs[n] for n in self.nodes]


def load_vgg19_params(
    nodes: Sequence[str], npz_path: str | None = None
) -> tuple[dict, bool]:
    """Build the VGG19Features param pytree.

    Returns ``(variables, pretrained)``. Looks for an .npz with keys
    ``features.{i}.weight`` (OIHW) / ``features.{i}.bias`` at ``npz_path``
    or ``$SRGANFD_VGG19_NPZ``; falls back to seeded He-init when absent.
    """
    path = npz_path or os.environ.get("SRGANFD_VGG19_NPZ", "")
    module = VGG19Features(nodes=tuple(nodes))
    variables = module.init(jax.random.PRNGKey(42), jnp.zeros((1, 32, 32, 3)))
    if path and os.path.exists(path):
        data = np.load(path)
        params = dict(variables["params"])
        for idx, _ in _VGG19_CONV_LAYOUT:
            key = f"conv{idx}"
            if key not in params:
                continue
            w = data[f"features.{idx}.weight"]  # (O, I, kH, kW)
            b = data[f"features.{idx}.bias"]
            params[key] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
                "bias": jnp.asarray(b),
            }
        return {"params": params}, True
    return variables, False


class ContentLoss:
    """VGG19 feature L1 loss.

    - ``nodes=["features.34"]`` + scalar weight: ESRGAN behavior
      (``ESRGAN/model.py:246-292``) — returns a scalar.
    - multiple nodes + weight list: BSRGAN-family behavior
      (``BSRGAN/model.py:501-554``) — returns the weighted sum over nodes
      (what ``torch.sum(torch.mul(w, losses))`` computes in the train
      scripts, ``BSRGAN/train_bsrgan.py:450-453``).
    """

    def __init__(
        self,
        nodes: Sequence[str] = ("features.34",),
        weights: Sequence[float] | float = 1.0,
        normalize_mean: Sequence[float] = tuple(_IMAGENET_MEAN),
        normalize_std: Sequence[float] = tuple(_IMAGENET_STD),
        npz_path: str | None = None,
        detach_bug: bool = False,
        dtype: Any = jnp.float32,
    ) -> None:
        self.nodes = tuple(nodes)
        if isinstance(weights, (int, float)):
            weights = [float(weights)] * len(self.nodes)
        if len(weights) == 1:
            # torch.mul broadcast semantics: the configs ship length-1
            # weight lists against 5 per-node losses
            # (BSRGAN/train_bsrgan.py:450-453, bsrgan_config.py pixel/content)
            weights = list(weights) * len(self.nodes)
        if len(weights) != len(self.nodes):
            raise ValueError("weights must match nodes length")
        self.weights = jnp.asarray(list(weights), jnp.float32)
        self.mean = jnp.asarray(normalize_mean, jnp.float32)
        self.std = jnp.asarray(normalize_std, jnp.float32)
        self.module = VGG19Features(nodes=self.nodes, dtype=dtype)
        self.variables, self.pretrained = load_vgg19_params(self.nodes, npz_path)
        self.detach_bug = detach_bug

    def _normalize(self, x: jax.Array) -> jax.Array:
        return (x - self.mean) / self.std

    def per_node(self, sr: jax.Array, gt: jax.Array) -> jax.Array:
        """Vector of per-node L1 feature distances (NHWC [0,1] inputs)."""
        sr_feats = self.module.apply(self.variables, self._normalize(sr))
        gt_feats = self.module.apply(self.variables, self._normalize(gt))
        losses = jnp.stack(
            [jnp.mean(jnp.abs(a - b)) for a, b in zip(sr_feats, gt_feats)]
        )
        if self.detach_bug:
            losses = jax.lax.stop_gradient(losses)
        return losses

    def __call__(self, sr: jax.Array, gt: jax.Array) -> jax.Array:
        return jnp.sum(self.weights * self.per_node(sr, gt))
