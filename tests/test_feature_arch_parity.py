"""Architecture parity of the perceptual backbones: build the same conv
stacks in raw torch (same layout torchvision uses), port random weights
into our Flax modules, and require identical features. Proves conv
padding/stride/pool semantics match, independent of pretrained weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from srganfd_tpu.losses.content import VGG19Features, load_vgg19_params  # noqa: E402
from srganfd_tpu.losses.lpips import AlexNetFeatures, load_lpips_params  # noqa: E402


def _torch_vgg19_features():
    """torchvision vgg19.features layer stack (cfg 'E'), random init."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


def test_vgg19_feature_parity_with_torch_layout():
    torch.manual_seed(0)
    tmodel = _torch_vgg19_features().eval()

    # port torch weights (OIHW) into our param tree
    nodes = ("features.2", "features.7", "features.16", "features.25", "features.34")
    variables, _ = load_vgg19_params(nodes)
    params = dict(variables["params"])
    conv_idx = [i for i, l in enumerate(tmodel) if isinstance(l, torch.nn.Conv2d)]
    for i in conv_idx:
        key = f"conv{i}"
        if key in params:
            params[key] = {
                "kernel": jnp.asarray(
                    tmodel[i].weight.detach().numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(tmodel[i].bias.detach().numpy()),
            }

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feats_t = {}
        h = torch.from_numpy(x)
        for i, layer in enumerate(tmodel):
            h = layer(h)
            feats_t[f"features.{i}"] = h.numpy()

    module = VGG19Features(nodes=nodes)
    feats_j = module.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    for node, got in zip(nodes, feats_j):
        want = np.moveaxis(feats_t[node], 1, -1)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_alexnet_feature_parity_with_torch_layout():
    import torch.nn as nn

    torch.manual_seed(1)
    tmodel = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
    ).eval()

    variables, _, _ = load_lpips_params()
    params = dict(variables["params"])
    convs = [l for l in tmodel if isinstance(l, nn.Conv2d)]
    for i, conv in enumerate(convs):
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        taps_t = []
        h = torch.from_numpy(x)
        for layer in tmodel:
            h = layer(h)
            if isinstance(layer, nn.ReLU):
                taps_t.append(h.numpy())

    module = AlexNetFeatures()
    taps_j = module.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    assert len(taps_j) == len(taps_t) == 5
    for got, want in zip(taps_j, taps_t):
        np.testing.assert_allclose(
            np.asarray(got), np.moveaxis(want, 1, -1), atol=2e-4, rtol=1e-4
        )
