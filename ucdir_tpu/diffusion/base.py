"""Diffusion process variants as Flax modules.

Each variant owns the denoiser (`denoise_fn`, a DY3h-style UNet) and, for the
residual variants, the guidance `predictor` (UNetSeeInDark) — the parameter
tree therefore mirrors the reference state_dict layout
({denoise_fn.*, predictor.*}, /root/reference/model/diffusion.py:393-442),
which keeps the torch->jax checkpoint converter mechanical.

Methods:
  * `p_losses(x_in, gammas, noise)` — the training loss, *sum*-reduced exactly
    like the reference (nn.L1Loss(reduction='sum'), diffusion.py:93-99); the
    trainer divides by b*c*h*w (model/model.py:107-109). Randomness (t, gamma
    segment, noise) is sampled in the train step (see sampler.py:
    sample_continuous_gamma) and passed in — keeps this module pure.
  * `denoise(x, noise_level, guide)` — one eps prediction; the sampling loop in
    sampler.py drives it inside a lax.scan.
  * `predict_init(x)` — guidance prediction (residual variants).
  * `sample_guide(x_in, initx)` — which tensor conditions AKGM at sampling
    time (initx for GuideDY, the degraded input for GuideDY_de, None otherwise).

Images are NHWC in [-1, 1].
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ucdir_tpu.models.seeindark import UNetSeeInDark


def _loss(loss_type: str, a, b):
    # f32 accumulation regardless of compute dtype (bf16 sums drift)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if loss_type == 'l1':
        return jnp.sum(jnp.abs(a - b))
    if loss_type == 'l2':
        return jnp.sum((a - b) ** 2)
    raise NotImplementedError(loss_type)


class GaussianDiffusion(nn.Module):
    """Base conditional DDPM (diffusion.py:73-343)."""
    denoise_fn: nn.Module
    image_size: int = 128
    channels: int = 3
    loss_type: str = 'l1'
    conditional: bool = True
    # static hook for perceptual variants: fn(pred, target) -> scalar
    perceptual_fn: Optional[Callable[[Any, Any], Any]] = None

    has_predictor: bool = False
    guide_in_train: Optional[str] = None   # None | 'initx' | 'degraded'
    guide_in_sample: Optional[str] = None
    sample_mode: str = 'reverse'           # 'reverse' | 'refine' (NoDiffusion)

    def setup(self):
        if self.has_predictor:
            self.predictor = UNetSeeInDark()

    # --- pieces -----------------------------------------------------------
    def q_sample(self, x_start, continuous_sqrt_alpha_cumprod, noise):
        """diffusion.py:306-313 — continuous-gamma forward noising."""
        g = continuous_sqrt_alpha_cumprod
        return g * x_start + jnp.sqrt(1 - g ** 2) * noise

    def denoise(self, x, noise_level, guide=None, deterministic: bool = True,
                guide_maps=None):
        if guide is None:
            # non-guided nets still need a placeholder for the AKGM resname;
            # base GaussianDiffusion is used with resname='ResnetBlock' where
            # guide is ignored, so feed the input itself.
            guide = x[..., :3]
        return self.denoise_fn(x, noise_level, guide,
                               deterministic=deterministic,
                               guide_maps=guide_maps)

    def predict_init(self, x):
        if not self.has_predictor:
            raise NotImplementedError('no predictor in %s' % type(self).__name__)
        return self.predictor(x)

    # --- per-variant structure hooks ---------------------------------------
    def _x_start(self, x_in, x_init):
        return x_in['HR']

    def _train_guide(self, x_in, x_init):
        if self.guide_in_train == 'initx':
            return x_init
        if self.guide_in_train == 'degraded':
            return x_in['SR']
        return None

    def _extra_loss(self, x_in, x_init, x_recon, x_noisy, gammas):
        return 0.0

    # --- loss ---------------------------------------------------------------
    def p_losses(self, x_in, gammas, noise, deterministic: bool = False):
        """x_in: {'HR': (b,h,w,c), 'SR': (b,h,w,c)}; gammas: (b,1); noise like HR."""
        x_init = self.predictor(x_in['SR']) if self.has_predictor else None
        x_start = self._x_start(x_in, x_init)
        g = gammas.reshape(-1, 1, 1, 1)
        x_noisy = self.q_sample(x_start, g, noise)

        guide = self._train_guide(x_in, x_init)
        if self.conditional:
            net_in = jnp.concatenate([x_in['SR'], x_noisy], axis=-1)
        else:
            net_in = x_noisy
        x_recon = self.denoise(net_in, gammas, guide=guide,
                               deterministic=deterministic)

        loss = _loss(self.loss_type, noise, x_recon)
        return loss + self._extra_loss(x_in, x_init, x_recon, x_noisy, gammas)

    def __call__(self, x_in, gammas, noise, deterministic: bool = False):
        return self.p_losses(x_in, gammas, noise, deterministic=deterministic)


class PerceptualGaussianDiffusion(GaussianDiffusion):
    """+ LPIPS(vgg) on the reconstructed x0 (diffusion.py:348-387)."""

    def _extra_loss(self, x_in, x_init, x_recon, x_noisy, gammas):
        if self.perceptual_fn is None:
            raise ValueError(
                'PerceptualGaussianDiffusion needs perceptual_fn (an LPIPS '
                'callable, see ucdir_tpu.metrics.lpips).')
        factor = gammas.reshape(-1, 1, 1, 1)
        x_start_recon = (x_noisy - jnp.sqrt(1 - factor ** 2) * x_recon) / factor
        return 1.0 * jnp.sum(self.perceptual_fn(x_start_recon, x_in['HR']))


class ResiGaussianDiffusion(GaussianDiffusion):
    """Diffusion over the residual HR - predictor(SR) (diffusion.py:393-432)."""
    has_predictor: bool = True

    def _x_start(self, x_in, x_init):
        return x_in['HR'] - x_init


class ResiGaussianGuideDY(ResiGaussianDiffusion):
    """Residual + initx guides AKGM each call (diffusion.py:436-478)."""
    guide_in_train: Optional[str] = 'initx'
    guide_in_sample: Optional[str] = 'initx'


class ResiGaussianGuideDY_de(ResiGaussianDiffusion):
    """Residual + the *degraded input* guides AKGM (diffusion.py:481-523)."""
    guide_in_train: Optional[str] = 'degraded'
    guide_in_sample: Optional[str] = 'degraded'


class ResiGaussianGuideDY_initxloss(ResiGaussianGuideDY):
    """+ 0.5 * loss(initx, HR) predictor supervision (diffusion.py:528-571)."""

    def _extra_loss(self, x_in, x_init, x_recon, x_noisy, gammas):
        return 0.5 * _loss(self.loss_type, x_init, x_in['HR'])


class ResiPercepGaussianDiffusion(ResiGaussianDiffusion):
    """Residual + 0.5 * loss(x0_recon + initx, HR) (diffusion.py:573-622)."""

    def _extra_loss(self, x_in, x_init, x_recon, x_noisy, gammas):
        factor = gammas.reshape(-1, 1, 1, 1)
        x_start_recon = (x_noisy - jnp.sqrt(1 - factor ** 2) * x_recon) / factor
        return 0.5 * _loss(self.loss_type, x_start_recon + x_init, x_in['HR'])


class NoDiffusion(GaussianDiffusion):
    """Ablation: predictor output refined once, regression loss
    (diffusion.py:625-662). gammas must be the fixed noise level
    sqrt_alphas_cumprod_prev[1] — the train step (train/step.py) feeds that
    constant instead of random continuous gammas, and sampling routes through
    `refine` (sampler.py super_resolution), matching diffusion.py:638-662."""
    has_predictor: bool = True
    sample_mode: str = 'refine'

    def p_losses(self, x_in, gammas, noise, deterministic: bool = False):
        x_init = self.predictor(x_in['SR'])
        x_recon = self.denoise(x_init, gammas, guide=None,
                               deterministic=deterministic)
        return _loss(self.loss_type, x_in['HR'], x_recon)

    def refine(self, x_in, gammas):
        x_init = self.predictor(x_in)
        return self.denoise(x_init, gammas, guide=None, deterministic=True)


DIFFUSIONS = {
    'GaussianDiffusion': GaussianDiffusion,
    'PerceptualGaussianDiffusion': PerceptualGaussianDiffusion,
    'ResiGaussianDiffusion': ResiGaussianDiffusion,
    'ResiGaussianGuideDY': ResiGaussianGuideDY,
    'ResiGaussianGuideDY_de': ResiGaussianGuideDY_de,
    'ResiGaussianGuideDY_initxloss': ResiGaussianGuideDY_initxloss,
    'ResiPercepGaussianDiffusion': ResiPercepGaussianDiffusion,
    'NoDiffusion': NoDiffusion,
}
