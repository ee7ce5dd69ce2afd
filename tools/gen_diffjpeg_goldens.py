import sys, types
import numpy as np
import torch

# torchvision shims (same as kernel goldens)
tv = types.ModuleType("torchvision"); tvt = types.ModuleType("torchvision.transforms")
tvf = types.ModuleType("torchvision.transforms.functional"); tvft = types.ModuleType("torchvision.transforms.functional_tensor")
def rgb_to_grayscale(img, num_output_channels=1):
    w = torch.tensor([0.299, 0.587, 0.114], dtype=img.dtype, device=img.device)
    gray = (img * w.view(1, 3, 1, 1)).sum(1, keepdim=True)
    return gray.repeat(1, num_output_channels, 1, 1) if num_output_channels > 1 else gray
tvft.rgb_to_grayscale = rgb_to_grayscale; tvf.rgb_to_grayscale = rgb_to_grayscale
for n, m in [("torchvision", tv), ("torchvision.transforms", tvt),
             ("torchvision.transforms.functional", tvf), ("torchvision.transforms.functional_tensor", tvft)]:
    sys.modules[n] = m
tv.transforms = tvt; tvt.functional = tvf; tvt.functional_tensor = tvft

sys.path.insert(0, "/root/reference/Real_ESRGAN")
import imgproc as ref

rng = np.random.default_rng(0)
x = rng.uniform(0, 1, size=(2, 3, 32, 32)).astype(np.float32)
jp = ref.DiffJPEG(differentiable=False)
jp_d = ref.DiffJPEG(differentiable=True)
out = {}
for q in (30, 60, 95):
    # NB: the reference mutates the quality tensor in place (quality ->
    # factor), so each call needs a fresh tensor
    out[f"q{q}"] = jp(torch.from_numpy(x), quality=torch.full((2,), float(q))).detach().numpy()
    out[f"q{q}_diff"] = jp_d(torch.from_numpy(x), quality=torch.full((2,), float(q))).detach().numpy()
out["x"] = x
np.savez("/root/repo/tests/goldens/diffjpeg.npz", **out)
print("wrote diffjpeg goldens", {k: v.shape for k, v in out.items()})
