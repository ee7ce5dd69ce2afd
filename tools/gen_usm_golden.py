import sys, types
import numpy as np
import torch

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
# structured image so the threshold mask has both states
base = rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32)
import cv2
img = np.clip(cv2.resize(base, (64, 64), interpolation=cv2.INTER_CUBIC), 0, 1).astype(np.float32)
x = torch.from_numpy(np.moveaxis(img, -1, 0)[None])
usm = ref.USMSharp()
out = usm(x, weight=0.5, threshold=10).detach().numpy()
np.savez("/root/repo/tests/goldens/usm.npz", x=img, out=np.moveaxis(out[0], 0, -1))
print("usm golden written", out.shape)
