"""Network factory — `define_G` equivalent.

Parity target: /root/reference/model/networks.py:88-95 — string dispatch on
`unet_name` / `diffusion_name`, UNet kwargs threaded from opt['model']['unet'],
diffusion kwargs from opt['model']['diffusion'].
"""
from __future__ import annotations

from typing import Any, Dict

from ucdir_tpu.models.dy3h import DY3h

UNETS = {'DY3h': DY3h}


def define_G(opt: Dict[str, Any], use_pallas: bool = False,
             remat: bool = False):
    """Build the diffusion module from a parsed config (opt['model'])."""
    # deferred: diffusion.base imports models.seeindark (circular otherwise)
    from ucdir_tpu.diffusion.base import DIFFUSIONS

    model_opt = opt['model']
    assert model_opt['which_model_G'] == 'ucdir', model_opt['which_model_G']

    unet_cfg = dict(model_opt['unet'])
    unet_cfg['channel_mults'] = tuple(unet_cfg.get('channel_mults') or (1, 2, 4, 8, 8))
    unet_cfg['attn_res'] = tuple(unet_cfg.get('attn_res') or (8,))
    unet_cfg.setdefault('image_size', model_opt['diffusion']['image_size'])
    unet_cls = UNETS[model_opt.get('unet_name', 'DY3h')]
    unet = unet_cls(use_pallas=use_pallas, remat=remat,
                    **{k: v for k, v in unet_cfg.items() if v is not None})

    diff_cfg = dict(model_opt['diffusion'])
    diffusion_name = model_opt.get('diffusion_name', 'GaussianDiffusion')
    diff_cls = DIFFUSIONS[diffusion_name]

    perceptual_fn = None
    if diffusion_name == 'PerceptualGaussianDiffusion':
        # the reference builds lpips.LPIPS(net='vgg'|'alex') inside the
        # variant (diffusion.py:355); here the jax-ported LPIPS is injected
        # (weights from UCDIR_TPU_LPIPS_WEIGHTS or model.lpips_weights)
        from ucdir_tpu.metrics.lpips import make_lpips
        perceptual_fn = make_lpips(model_opt.get('lpips_weights'))

    return diff_cls(
        denoise_fn=unet,
        image_size=diff_cfg.get('image_size', 128),
        channels=diff_cfg.get('channels', 3),
        conditional=bool(diff_cfg.get('conditional', True)),
        loss_type=diff_cfg.get('loss_type', 'l1'),
        perceptual_fn=perceptual_fn,
    )
