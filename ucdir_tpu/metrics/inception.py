"""InceptionV3 (FID variant) in JAX/flax.

The reference computes FID/KID through clean-fid's InceptionV3 pool3 features
(/root/reference/eval1.py:246-250). This is the same architecture as
pytorch-fid's FIDInceptionV3 (tf-style InceptionV3 with the FID tweaks: the
InceptionA/C pool branches use count-exclude-padding average pooling, and the
two InceptionE variants differ in their pool branch). Weights convert from a
pytorch-fid / torchvision state_dict (`convert_inception_torch`); supply via
`UCDIR_TPU_INCEPTION_NPZ` (converted) or a .pth path.

Input: NHWC uint8/float images; resized to 299x299 bilinear and scaled to
[-1, 1], matching the FID preprocessing. Output: 2048-d pool3 features.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv(nn.Module):
    """Conv + BN(eps 1e-3, no scale-learnable? torchvision BN has affine) + ReLU."""
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, name='conv')(x)
        # inference-mode batchnorm folded as scale/bias (converter computes
        # them from running stats; eps 1e-3 like torchvision inception)
        scale = self.param('bn_scale', nn.initializers.ones, (self.features,))
        bias = self.param('bn_bias', nn.initializers.zeros, (self.features,))
        return jax.nn.relu(x * scale + bias)


def _avg_pool_cep(x, window=3, stride=1, pad=1):
    """count-exclude-padding 3x3 avg pool (FID inception semantics)."""
    ones = jnp.ones_like(x[..., :1])
    sum_ = jax.lax.reduce_window(
        x, 0., jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    cnt = jax.lax.reduce_window(
        ones, 0., jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return sum_ / cnt


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name='branch1x1')(x)
        b5 = BasicConv(48, (1, 1), name='branch5x5_1')(x)
        b5 = BasicConv(64, (5, 5), padding=2, name='branch5x5_2')(b5)
        b3 = BasicConv(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = BasicConv(96, (3, 3), padding=1, name='branch3x3dbl_2')(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name='branch3x3dbl_3')(b3)
        bp = _avg_pool_cep(x)
        bp = BasicConv(self.pool_features, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name='branch3x3')(x)
        bd = BasicConv(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv(96, (3, 3), padding=1, name='branch3x3dbl_2')(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name='branch3x3dbl_3')(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name='branch1x1')(x)
        b7 = BasicConv(c7, (1, 1), name='branch7x7_1')(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7_2')(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7_3')(b7)
        bd = BasicConv(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7dbl_2')(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7dbl_3')(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7dbl_4')(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7dbl_5')(bd)
        bp = _avg_pool_cep(x)
        bp = BasicConv(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name='branch3x3_1')(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name='branch3x3_2')(b3)
        b7 = BasicConv(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7x3_2')(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7x3_3')(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name='branch7x7x3_4')(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str  # 'avg' (FID E_1) or 'max' (FID E_2 uses max pool)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name='branch1x1')(x)
        b3 = BasicConv(384, (1, 1), name='branch3x3_1')(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name='branch3x3_2a')(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv(384, (3, 3), padding=1, name='branch3x3dbl_2')(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name='branch3x3dbl_3a')(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == 'avg':
            bp = _avg_pool_cep(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """pool3 (2048-d) feature extractor."""

    @nn.compact
    def __call__(self, x):
        # x: NHWC in [-1, 1], 299x299
        x = BasicConv(32, (3, 3), strides=(2, 2), name='Conv2d_1a_3x3')(x)
        x = BasicConv(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = BasicConv(64, (3, 3), padding=1, name='Conv2d_2b_3x3')(x)
        x = _max_pool(x)
        x = BasicConv(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = BasicConv(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = _max_pool(x)
        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, name='Mixed_6b')(x)
        x = InceptionC(160, name='Mixed_6c')(x)
        x = InceptionC(160, name='Mixed_6d')(x)
        x = InceptionC(192, name='Mixed_6e')(x)
        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE('avg', name='Mixed_7b')(x)
        x = InceptionE('max', name='Mixed_7c')(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> (N, 2048)


def inception_probs(params, images) -> np.ndarray:
    """Softmax class probabilities (N, 1000) — the classifier head the
    reference's inception score uses (/root/reference/eval1.py:74-130).

    `params`: the convert_inception_torch tree INCLUDING 'fc' (kernel/bias
    from torchvision's `fc.weight/bias`). Feed the result to
    `metrics.fid.inception_score`."""
    if 'fc' not in params:
        raise RuntimeError('params lack the fc head — convert a full '
                           'torchvision inception_v3 state_dict (not the '
                           'headless pytorch-fid variant) for IS.')
    feat_params = {k: v for k, v in params.items() if k != 'fc'}
    return np.asarray(_probs_jit(feat_params, params['fc'],
                                 preprocess(images)))


@jax.jit
def _probs_jit(feat_params, fc, z):
    # module-level jit: eval loops reuse the compiled program across batches
    # (a per-call closure would recompile the full InceptionV3 every call)
    feats = InceptionV3Features().apply({'params': feat_params}, z)
    logits = feats @ fc['kernel'] + fc['bias']
    return jax.nn.softmax(logits, axis=-1)


def preprocess(images: np.ndarray) -> jnp.ndarray:
    """NHWC uint8/[0,255] or [0,1] float -> 299x299 [-1,1] f32."""
    x = jnp.asarray(images, jnp.float32)
    if x.max() > 1.5:
        x = x / 255.
    b, h, w, c = x.shape
    if (h, w) != (299, 299):
        x = jax.image.resize(x, (b, 299, 299, c), 'bilinear', antialias=False)
    return x * 2. - 1.


def convert_inception_torch(state_dict) -> Dict[str, Any]:
    """pytorch-fid / torchvision inception_v3 state_dict -> flax params with
    BN folded into per-channel scale/bias (inference only)."""
    tree: Dict[str, Any] = {}

    def put(path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)

    # group keys per BasicConv prefix
    prefixes = sorted({k.rsplit('.', 2)[0] for k in state_dict
                       if k.endswith('conv.weight')})
    for pref in prefixes:
        w = np_(state_dict[pref + '.conv.weight']).transpose(2, 3, 1, 0)
        gamma = np_(state_dict[pref + '.bn.weight'])
        beta = np_(state_dict[pref + '.bn.bias'])
        mean = np_(state_dict[pref + '.bn.running_mean'])
        var = np_(state_dict[pref + '.bn.running_var'])
        eps = 1e-3
        scale = gamma / np.sqrt(var + eps)
        bias = beta - mean * scale
        path = tuple(pref.split('.'))
        put(path + ('conv', 'kernel'), w)
        put(path + ('bn_scale',), scale.astype(np.float32))
        put(path + ('bn_bias',), bias.astype(np.float32))
    # classifier head (torchvision fc) — used by the inception score
    # (reference eval1.py:74-130 classifies with the full inception_v3)
    if 'fc.weight' in state_dict:
        put(('fc', 'kernel'), np_(state_dict['fc.weight']).T)
        put(('fc', 'bias'), np_(state_dict['fc.bias']))
    return tree


def load_inception_params(path: Optional[str] = None) -> Dict[str, Any]:
    path = path or os.environ.get('UCDIR_TPU_INCEPTION_NPZ')
    if not path or not os.path.exists(path):
        raise RuntimeError(
            'InceptionV3 weights unavailable. Save a pytorch-fid/torchvision '
            'inception state_dict (.pth) or a converted .npz and point '
            'UCDIR_TPU_INCEPTION_NPZ at it.')
    if path.endswith('.npz'):
        flat = dict(np.load(path))
        tree: Dict[str, Any] = {}
        for k, v in flat.items():
            node = tree
            parts = k.split('/')
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return tree
    import torch
    return convert_inception_torch(
        torch.load(path, map_location='cpu', weights_only=True))


def make_feature_fn(path: Optional[str] = None, batch_size: int = 64):
    """Returns fn(images NHWC) -> (N, 2048) pool3 features, batched."""
    params = load_inception_params(path)
    model = InceptionV3Features()
    feat_params = {k: v for k, v in params.items() if k != 'fc'}
    fwd = jax.jit(lambda x: model.apply({'params': feat_params}, x))

    def features(images):
        outs = []
        for i in range(0, len(images), batch_size):
            outs.append(np.asarray(fwd(preprocess(images[i:i + batch_size]))))
        return np.concatenate(outs, axis=0)

    return features


def make_classifier_fn(path: Optional[str] = None, batch_size: int = 64):
    """Returns fn(images NHWC) -> (N, 1000) softmax class probabilities —
    pool3 features through the torchvision fc head (the reference's
    inception-score classifier, eval1.py:74-130 / :106). Requires a
    state_dict that includes fc.weight/fc.bias."""
    params = load_inception_params(path)
    if 'fc' not in params:
        raise RuntimeError('inception checkpoint has no fc head; the '
                           'inception score needs a full torchvision '
                           'inception_v3 state_dict')
    model = InceptionV3Features()
    feat_params = {k: v for k, v in params.items() if k != 'fc'}
    w, b = params['fc']['kernel'], params['fc']['bias']

    fwd = jax.jit(lambda x: jax.nn.softmax(
        model.apply({'params': feat_params}, x) @ w + b, axis=-1))

    def probs(images):
        outs = []
        for i in range(0, len(images), batch_size):
            outs.append(np.asarray(fwd(preprocess(images[i:i + batch_size]))))
        return np.concatenate(outs, axis=0)

    return probs
