from . import transforms, sh, gaussians, sampling
