"""Gaussian diffusion processes (SR3-style, continuous noise-level conditioning).

Variants mirror /root/reference/model/diffusion.py:
  GaussianDiffusion              diffusion.py:73-343
  PerceptualGaussianDiffusion    diffusion.py:348-387
  ResiGaussianDiffusion          diffusion.py:393-432
  ResiGaussianGuideDY            diffusion.py:436-478  (the shipped config)
  ResiGaussianGuideDY_de         diffusion.py:481-523
  ResiGaussianGuideDY_initxloss  diffusion.py:528-571
  ResiPercepGaussianDiffusion    diffusion.py:573-622
  NoDiffusion                    diffusion.py:625-662
"""
from ucdir_tpu.diffusion.base import (GaussianDiffusion,
                                      PerceptualGaussianDiffusion,
                                      ResiGaussianDiffusion,
                                      ResiGaussianGuideDY,
                                      ResiGaussianGuideDY_de,
                                      ResiGaussianGuideDY_initxloss,
                                      ResiPercepGaussianDiffusion,
                                      NoDiffusion,
                                      DIFFUSIONS)
from ucdir_tpu.diffusion.sampler import (p_sample_loop, ddim_sample,
                                         super_resolution, unconditional_sample,
                                         sample_continuous_gamma)
