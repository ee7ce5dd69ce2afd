"""Reference-topology torch twins of the RRDB generator family.

These re-implement the reference generators in torch AS THE PARITY
ORACLE for ``tools/parity_table.py``: a reference ``.pth`` checkpoint
loads into the twin 1:1 (state-dict names match the reference's), so the
twin's outputs ARE "the PyTorch reference's outputs" for the 0.1 dB
parity gate — without importing (or copying) code from the reference
tree. Topology citations:

- ESRGAN RRDBNet x1/2/4/8: ``ESRGAN/model.py:29-243``
- BSRGAN x2/x4 (upsampling1 always, upsampling2 iff x4):
  ``BSRGAN/model.py:311-384``
- Real-ESRGAN RRDBNet (PixelUnshuffle front, fixed two x2 stages):
  ``Real_ESRGAN/model.py:108-263``

The RDB/RRDB blocks and the 0.2-scaled residuals are shared by all
three; naming (conv1, trunk.{i}.rdb{j}.conv{k}, conv2, upsampling{n}.0,
conv3.0, conv4) matches the reference state dicts and
``tools/port_torch_weights.py``'s converter.
"""

from __future__ import annotations

import torch
from torch import nn
from torch.nn import functional as F


class _RDB(nn.Module):
    def __init__(self, ch: int, gc: int):
        super().__init__()
        for k in range(5):
            cout = gc if k < 4 else ch
            setattr(self, f"conv{k + 1}", nn.Conv2d(ch + gc * k, cout, 3, 1, 1))
        self.act = nn.LeakyReLU(0.2, True)

    def forward(self, x):
        feats = [x]
        for k in range(4):
            out = self.act(getattr(self, f"conv{k + 1}")(torch.cat(feats, 1)))
            feats.append(out)
        out = self.conv5(torch.cat(feats, 1))
        return out * 0.2 + x


class _RRDB(nn.Module):
    def __init__(self, ch: int, gc: int):
        super().__init__()
        self.rdb1 = _RDB(ch, gc)
        self.rdb2 = _RDB(ch, gc)
        self.rdb3 = _RDB(ch, gc)

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class TorchRRDBGenerator(nn.Module):
    """One parametrized twin covering all three reference variants.

    ``flavor``: 'esrgan' (upsampling stages by scale, x1 has none),
    'bsrgan' (upsampling1 always + upsampling2 iff x4), 'realesrgan'
    (PixelUnshuffle front by scale + fixed two upsampling stages)."""

    def __init__(
        self,
        flavor: str,
        upscale: int,
        channels: int = 64,
        growth_channels: int = 32,
        num_blocks: int = 23,
        in_channels: int = 3,
        out_channels: int = 3,
    ):
        super().__init__()
        self.flavor = flavor
        self.upscale = upscale
        cin = in_channels
        self.downscale = 1
        if flavor == "realesrgan":
            self.downscale = {2: 2, 1: 4}.get(upscale, 1)
            cin = in_channels * self.downscale**2
            self.downsampling = nn.PixelUnshuffle(self.downscale)
        self.conv1 = nn.Conv2d(cin, channels, 3, 1, 1)
        self.trunk = nn.Sequential(*[_RRDB(channels, growth_channels) for _ in range(num_blocks)])
        self.conv2 = nn.Conv2d(channels, channels, 3, 1, 1)
        if flavor == "esrgan":
            n_up = {1: 0, 2: 1, 4: 2, 8: 3}[upscale]
        elif flavor == "bsrgan":
            n_up = 2 if upscale == 4 else 1
        else:
            n_up = 2
        self.n_up = n_up
        for i in range(n_up):
            setattr(
                self,
                f"upsampling{i + 1}",
                nn.Sequential(nn.Conv2d(channels, channels, 3, 1, 1), nn.LeakyReLU(0.2, True)),
            )
        self.conv3 = nn.Sequential(
            nn.Conv2d(channels, channels, 3, 1, 1), nn.LeakyReLU(0.2, True)
        )
        self.conv4 = nn.Conv2d(channels, out_channels, 3, 1, 1)

    def forward(self, x):
        if self.flavor == "realesrgan":
            x = self.downsampling(x)
        out1 = self.conv1(x)
        out = torch.add(out1, self.conv2(self.trunk(out1)))
        for i in range(self.n_up):
            out = getattr(self, f"upsampling{i + 1}")(
                F.interpolate(out, scale_factor=2, mode="nearest")
            )
        return torch.clamp(self.conv4(self.conv3(out)), 0.0, 1.0)


def build_twin(arch: str, **kwargs) -> TorchRRDBGenerator:
    """arch like rrdbnet_x4 / bsrgan_x2 / realesrgan_x4; kwargs forward
    channels/growth_channels/num_blocks overrides (tiny-model testing)."""
    family, _, scale = arch.rpartition("_x")
    upscale = int(scale)
    flavor = {"rrdbnet": "esrgan", "bsrgan": "bsrgan", "realesrgan": "realesrgan"}[family]
    return TorchRRDBGenerator(flavor, upscale, **kwargs)
