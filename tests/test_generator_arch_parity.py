"""End-to-end generator parity: build the reference RRDBNet topology in
raw torch (reference module naming), port its random weights through
tools/port_torch_weights, and require identical SR outputs from our Flax
generator — the guarantee that published reference checkpoints reproduce
reference outputs in this framework."""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
import port_torch_weights as port  # noqa: E402

from srganfd_tpu.models import create_model  # noqa: E402


class _TorchRDB(nn.Module):
    """Reference RDB topology (ESRGAN/model.py:29-60), reference naming."""

    def __init__(self, ch, gc):
        super().__init__()
        for k in range(5):
            cin = ch + gc * k
            cout = gc if k < 4 else ch
            setattr(self, f"conv{k + 1}", nn.Conv2d(cin, cout, 3, 1, 1))
        self.act = nn.LeakyReLU(0.2)

    def forward(self, x):
        feats = [x]
        for k in range(5):
            y = getattr(self, f"conv{k + 1}")(torch.cat(feats, 1))
            if k < 4:
                y = self.act(y)
            feats.append(y)
        return feats[-1] * 0.2 + x


class _TorchRRDB(nn.Module):
    def __init__(self, ch, gc):
        super().__init__()
        self.rdb1 = _TorchRDB(ch, gc)
        self.rdb2 = _TorchRDB(ch, gc)
        self.rdb3 = _TorchRDB(ch, gc)

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class _TorchRRDBNetX4(nn.Module):
    """Reference RRDBNet x4 topology + naming (ESRGAN/model.py:144-235)."""

    def __init__(self, ch=8, gc=4, nb=2):
        super().__init__()
        self.conv1 = nn.Conv2d(3, ch, 3, 1, 1)
        self.trunk = nn.Sequential(*[_TorchRRDB(ch, gc) for _ in range(nb)])
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1)
        self.upsampling1 = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.2))
        self.upsampling2 = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.2))
        self.conv3 = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1), nn.LeakyReLU(0.2))
        self.conv4 = nn.Conv2d(ch, 3, 3, 1, 1)

    def forward(self, x):
        out1 = self.conv1(x)
        out = out1 + self.conv2(self.trunk(out1))
        out = self.upsampling1(F.interpolate(out, scale_factor=2, mode="nearest"))
        out = self.upsampling2(F.interpolate(out, scale_factor=2, mode="nearest"))
        out = self.conv4(self.conv3(out))
        return torch.clamp(out, 0.0, 1.0)


def test_rrdbnet_outputs_match_reference_topology():
    torch.manual_seed(0)
    tmodel = _TorchRRDBNetX4().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted = port.convert_rrdb_generator(sd, num_blocks=2)

    model = create_model("rrdbnet_x4", channels=8, growth_channels=4, num_blocks=2)
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(1, 3, 12, 12)).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(lr)).numpy()

    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        jnp.asarray(np.moveaxis(lr, 1, -1)),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want, 1, -1), atol=3e-5, rtol=1e-4
    )
