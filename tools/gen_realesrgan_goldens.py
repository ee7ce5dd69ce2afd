"""Golden Real-ESRGAN kernels from the reference, with torchvision shims."""
import sys, types, pathlib
import numpy as np

# shim torchvision pieces Real_ESRGAN/imgproc.py imports
tv = types.ModuleType("torchvision")
tvt = types.ModuleType("torchvision.transforms")
tvf = types.ModuleType("torchvision.transforms.functional")
tvft = types.ModuleType("torchvision.transforms.functional_tensor")
def rgb_to_grayscale(img, num_output_channels=1):
    import torch
    w = torch.tensor([0.299, 0.587, 0.114], dtype=img.dtype, device=img.device)
    gray = (img * w.view(1, 3, 1, 1)).sum(1, keepdim=True)
    return gray.repeat(1, num_output_channels, 1, 1) if num_output_channels > 1 else gray
tvft.rgb_to_grayscale = rgb_to_grayscale
tvf.rgb_to_grayscale = rgb_to_grayscale
for name, mod in [("torchvision", tv), ("torchvision.transforms", tvt),
                  ("torchvision.transforms.functional", tvf),
                  ("torchvision.transforms.functional_tensor", tvft)]:
    sys.modules[name] = mod
tv.transforms = tvt; tvt.functional = tvf; tvt.functional_tensor = tvft

sys.path.insert(0, "/root/reference/Real_ESRGAN")
import imgproc as ref

out = {}
out["iso_21_1p7"] = ref._generate_bivariate_gaussian_kernel(21, 1.7, 1.7, 0.0, isotropic=True)
out["aniso_21"] = ref._generate_bivariate_gaussian_kernel(21, 1.7, 0.4, 0.8, isotropic=False)
out["gen_iso_17"] = ref._generate_bivariate_generalized_gaussian_kernel(17, 1.2, 1.2, 0.0, 2.5, isotropic=True)
out["gen_aniso_17"] = ref._generate_bivariate_generalized_gaussian_kernel(17, 1.2, 2.0, 0.3, 2.5, isotropic=False)
out["plateau_iso_13"] = ref._generate_bivariate_plateau_gaussian_kernel(13, 0.8, 0.8, 0.0, 1.5, isotropic=True)
out["plateau_aniso_13"] = ref._generate_bivariate_plateau_gaussian_kernel(13, 0.8, 1.1, -0.5, 1.5, isotropic=False)
out["sinc_21"] = ref.generate_sinc_kernel(np.pi/3, 21)
out["sinc_13_pad21"] = ref.generate_sinc_kernel(2.0, 13, padding=21)
np.savez("/root/repo/tests/goldens/realesrgan_kernels.npz", **{k: np.asarray(v, np.float64) for k, v in out.items()})
print("wrote", {k: v.shape for k, v in out.items()})
