import sys, types
import numpy as np
import scipy, scipy.ndimage
# scipy shims for old imports
if not hasattr(scipy, "finfo"): scipy.finfo = np.finfo
filters = types.ModuleType("scipy.ndimage.filters"); filters.convolve = scipy.ndimage.convolve
sys.modules.setdefault("scipy.ndimage.filters", filters); scipy.ndimage.filters = filters
sys.path.insert(0, "/root/reference/ESRGAN")
import image_quality_assessment as iqa

rng = np.random.default_rng(5)
vec = rng.normal(0, 1.3, 5000) * (1 + 0.5*np.sign(rng.normal(size=5000)))
a, bl, br = iqa._estimate_aggd_parameters(vec.copy())
block = rng.normal(0, 1, (48, 48))
feats = np.asarray(iqa._get_mscn_feature(block.copy()), np.float64)
np.savez("/root/repo/tests/goldens/niqe_internals.npz",
         vec=vec, aggd=np.array([a, bl, br], np.float64),
         block=block, feats=feats)
print("aggd:", a, bl, br, "feats:", feats.shape)
