"""LPIPS (Learned Perceptual Image Patch Similarity) in JAX.

The reference uses the `lpips` pip package (alex for eval, vgg for the
perceptual training loss; /root/reference/eval1.py:133-169,
model/diffusion.py:348-387). That package and its pretrained weights are not
available in this image (zero egress), so:

  * the AlexNet-feature LPIPS forward is implemented here in JAX;
  * weights load from a torch `lpips.LPIPS(net='alex')` state_dict saved to
    disk (`convert_lpips_torch`) or a pre-converted .npz — supply via
    `UCDIR_TPU_LPIPS_WEIGHTS`;
  * without weights, `make_lpips` raises with instructions.

Inputs are NHWC in [-1, 1] (the lpips convention).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

# AlexNet feature stages: (out_channels, kernel, stride, padding) per conv,
# with ReLU after each and maxpool(3,2) after stages 0, 1, 4 of torchvision's
# features module. LPIPS taps the ReLU outputs of stages 1..5.
_ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}
# ImageNet scaling layer used by lpips
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def _conv(x, w, b, stride, pad):
    import jax.numpy as jnp
    from jax import lax
    y = lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b if b is not None else y


def _maxpool(x):
    import jax.numpy as jnp
    from jax import lax
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             'VALID')


def alex_features(x, weights: Dict[str, Any]):
    """x: NHWC [-1,1]. Returns the 5 tapped relu outputs."""
    import jax
    import jax.numpy as jnp
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (c, k, s, p) in enumerate(_ALEX_CFG):
        x = _conv(x, weights[f'conv{i}_w'], weights[f'conv{i}_b'], s, p)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def lpips_distance(x, y, weights: Dict[str, Any]):
    """Scalar LPIPS per batch element (N,)."""
    import jax.numpy as jnp
    fx, fy = alex_features(x, weights), alex_features(y, weights)
    total = 0.
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / (jnp.sqrt(jnp.sum(a ** 2, -1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f'lin{i}_w']  # (C,) nonnegative 1x1 weights
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


def convert_lpips_torch(state_dict) -> Dict[str, np.ndarray]:
    """Convert a torch lpips.LPIPS(net='alex') state_dict."""
    out = {}
    conv_idx = {0: 0, 3: 1, 6: 2, 8: 3, 10: 4}  # torchvision features indices
    for k, v in state_dict.items():
        v = v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v)
        if k.startswith('net.slice'):
            # net.sliceN.<idx>.weight — idx is the global features index
            idx = int(k.split('.')[2])
            if idx in conv_idx:
                tag = f'conv{conv_idx[idx]}'
                if k.endswith('.weight'):
                    out[tag + '_w'] = v.transpose(2, 3, 1, 0)
                else:
                    out[tag + '_b'] = v
        elif k.startswith('lin') and k.endswith('.model.1.weight'):
            i = int(k[3])
            out[f'lin{i}_w'] = v.reshape(-1)  # (1,C,1,1) -> (C,)
    return out


def load_lpips_weights(path: Optional[str] = None) -> Dict[str, np.ndarray]:
    path = path or os.environ.get('UCDIR_TPU_LPIPS_WEIGHTS')
    if not path or not os.path.exists(path):
        raise RuntimeError(
            'LPIPS weights unavailable. Save a torch lpips state_dict '
            "(torch.save(lpips.LPIPS(net='alex').state_dict(), p)) or a "
            'converted .npz, and point UCDIR_TPU_LPIPS_WEIGHTS at it.')
    if path.endswith('.npz'):
        return dict(np.load(path))
    import torch
    return convert_lpips_torch(torch.load(path, map_location='cpu',
                                          weights_only=True))


def make_lpips(path: Optional[str] = None):
    """Returns fn(x, y) -> (N,) LPIPS, jittable. Raises without weights."""
    import jax
    weights = {k: np.asarray(v) for k, v in load_lpips_weights(path).items()}
    return jax.jit(lambda x, y: lpips_distance(x, y, weights))
