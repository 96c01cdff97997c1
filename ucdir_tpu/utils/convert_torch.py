"""PyTorch -> JAX checkpoint converter for the released UCDIR weights.

Maps the reference state_dict layout (ResiGaussianGuideDY: `denoise_fn.*` DY3h
keys + `predictor.*` UNetSeeInDark keys, /root/reference/model/diffusion.py:436-442,
model/ucdir.py:103-416) onto this package's flax param tree. Layout transforms:

  torch Conv2d   (O, I, kh, kw)  -> HWIO (kh, kw, I, O)
  grouped Conv2d (O, I/G, kh, kw)-> (kh, kw, I/G, O)   (same group-major order)
  Linear         (O, I)          -> (I, O)
  GroupNorm      weight/bias     -> scale/bias
  ConvTranspose2d(I, O, kh, kw)  -> (kh, kw, I, O)     (ConvTranspose2x2 kernel)

Diffusion buffers registered on the torch module (betas, alphas_cumprod, ...)
are schedule-derived and skipped — the NoiseSchedule pytree recomputes them.

Usage:
  params = convert_state_dict(torch_load(path))            # flax params dict
  variables = {'params': params}
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

_SKIP_BUFFERS = (
    'betas', 'alphas_cumprod', 'alphas_cumprod_prev', 'sqrt_alphas_cumprod',
    'sqrt_one_minus_alphas_cumprod', 'log_one_minus_alphas_cumprod',
    'sqrt_recip_alphas_cumprod', 'sqrt_recipm1_alphas_cumprod',
    'posterior_variance', 'posterior_log_variance_clipped',
    'posterior_mean_coef1', 'posterior_mean_coef2',
)


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w):
    return _to_np(w).transpose(2, 3, 1, 0)


def _dense(w):
    return _to_np(w).transpose(1, 0)


def _convT(w):
    return _to_np(w).transpose(2, 3, 0, 1)


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_resblock_key(rest: str, kind: str):
    """Map a torch ResnetBlockDY3h / ResnetBlock sub-key to (path, transform).

    rest examples: 'noise_func.0.weight', 'conv1.bias', 'spdyconv.weight',
    'conv2.0.weight', 'block1.block.0.weight' (plain ResnetBlock).
    """
    m = re.match(r'noise_func\.(\d)\.(weight|bias)$', rest)
    if m:
        # guided block: Sequential(Linear, Swish, Linear) -> noise_func_{0,2}
        idx, wb = m.groups()
        tf = _dense if wb == 'weight' else _to_np
        return (f'noise_func_{idx}', 'kernel' if wb == 'weight' else 'bias'), tf
    m = re.match(r'noise_func\.noise_func\.0\.(weight|bias)$', rest)
    if m:
        # plain ResnetBlock's FeatureWiseAffine(nn.Sequential(nn.Linear))
        wb = m.group(1)
        tf = _dense if wb == 'weight' else _to_np
        return ('noise_func', 'noise_func',
                'kernel' if wb == 'weight' else 'bias'), tf
    m = re.match(r'(norm1|norm2)\.(weight|bias)$', rest)
    if m:
        name, wb = m.groups()
        return (name, 'scale' if wb == 'weight' else 'bias'), _to_np
    m = re.match(r'(conv1|res_conv)\.(weight|bias)$', rest)
    if m:
        name, wb = m.groups()
        tf = _conv if wb == 'weight' else _to_np
        return (name, 'kernel' if wb == 'weight' else 'bias'), tf
    m = re.match(r'conv2\.(\d)\.(weight|bias)$', rest)
    if m:
        idx, wb = m.groups()
        tf = _conv if wb == 'weight' else _to_np
        return (f'conv2_{idx}', 'kernel' if wb == 'weight' else 'bias'), tf
    m = re.match(r'spdyconv\.(weight|bias)$', rest)
    if m:
        wb = m.group(1)
        if wb == 'weight':
            return ('spdyconv_kernel',), _conv
        return ('spdyconv_bias',), _to_np
    m = re.match(r'block(\d)\.block\.(\d)\.(weight|bias)$', rest)
    if m:
        # plain ResnetBlock: block = Sequential(GN, Swish, [Dropout], Conv)
        bidx, lidx, wb = m.groups()
        if lidx == '0':
            return (f'block{bidx}', 'norm',
                    'scale' if wb == 'weight' else 'bias'), _to_np
        tf = _conv if wb == 'weight' else _to_np
        return (f'block{bidx}', 'conv',
                'kernel' if wb == 'weight' else 'bias'), tf
    raise KeyError(rest)


def _map_attn_key(rest: str):
    m = re.match(r'(norm|qkv|out)\.(weight|bias)$', rest)
    if not m:
        raise KeyError(rest)
    name, wb = m.groups()
    if name == 'norm':
        return (name, 'scale' if wb == 'weight' else 'bias'), _to_np
    tf = _conv if wb == 'weight' else _to_np
    return (name, 'kernel' if wb == 'weight' else 'bias'), tf


def convert_dy3h(sd: Dict[str, Any], prefix: str = '') -> Dict[str, Any]:
    """Convert DY3h keys (optionally under `prefix`, e.g. 'denoise_fn.')."""
    tree: Dict[str, Any] = {}
    for key, val in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        if key.split('.')[0] in _SKIP_BUFFERS:
            continue

        m = re.match(r'noise_level_mlp\.(\d)\.(weight|bias)$', key)
        if m:
            idx, wb = m.groups()
            tf = _dense if wb == 'weight' else _to_np
            _set(tree, (f'noise_level_mlp_{idx}',
                        'kernel' if wb == 'weight' else 'bias'), tf(val))
            continue
        m = re.match(r'downs\.0\.(weight|bias)$', key)
        if m:
            wb = m.group(1)
            tf = _conv if wb == 'weight' else _to_np
            _set(tree, ('downs_0', 'kernel' if wb == 'weight' else 'bias'),
                 tf(val))
            continue
        m = re.match(r'(downs|ups|mid)\.(\d+)\.(.+)$', key)
        if m:
            group, idx, rest = m.groups()
            idx = int(idx)
            name = f'{group}_{idx}' if group != 'downs' else f'downs_{idx}'
            if rest.startswith('res_block.'):
                path, tf = _map_resblock_key(rest[len('res_block.'):], 'res')
                _set(tree, (name, 'res_block') + path, tf(val))
            elif rest.startswith('attn.'):
                path, tf = _map_attn_key(rest[len('attn.'):])
                _set(tree, (name, 'attn') + path, tf(val))
            elif rest.startswith('conv.'):  # Up/Downsample
                wb = rest.split('.')[-1]
                tf = _conv if wb == 'weight' else _to_np
                _set(tree, (name, 'conv',
                            'kernel' if wb == 'weight' else 'bias'), tf(val))
            else:
                raise KeyError(key)
            continue
        m = re.match(r'final_conv\.(\d)\.(weight|bias)$', key)
        if m:
            idx, wb = m.groups()
            if idx == '0':
                _set(tree, ('final_conv_norm',
                            'scale' if wb == 'weight' else 'bias'), _to_np(val))
            else:
                tf = _conv if wb == 'weight' else _to_np
                _set(tree, ('final_conv_conv',
                            'kernel' if wb == 'weight' else 'bias'), tf(val))
            continue
        raise KeyError('unmapped DY3h key: %s' % key)
    return tree


def convert_seeindark(sd: Dict[str, Any], prefix: str = '') -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        m = re.match(r'(conv\d+_\d)\.(weight|bias)$', key)
        if m:
            name, wb = m.groups()
            tf = _conv if wb == 'weight' else _to_np
            _set(tree, (name, 'kernel' if wb == 'weight' else 'bias'), tf(val))
            continue
        m = re.match(r'(upv\d)\.(weight|bias)$', key)
        if m:
            name, wb = m.groups()
            tf = _convT if wb == 'weight' else _to_np
            _set(tree, (name, 'kernel' if wb == 'weight' else 'bias'), tf(val))
            continue
        raise KeyError('unmapped UNetSeeInDark key: %s' % key)
    return tree


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Full diffusion-module state dict -> flax params tree."""
    params: Dict[str, Any] = {}
    has_denoise = any(k.startswith('denoise_fn.') for k in sd)
    has_pred = any(k.startswith('predictor.') for k in sd)
    if has_denoise:
        params['denoise_fn'] = convert_dy3h(sd, 'denoise_fn.')
    else:
        params['denoise_fn'] = convert_dy3h(
            {k: v for k, v in sd.items() if not k.startswith('predictor.')})
    if has_pred:
        params['predictor'] = convert_seeindark(sd, 'predictor.')
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference *_gen.pth / *_gen_ema.pth -> flax params."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    return convert_state_dict(sd)


def main():
    """CLI: convert a released reference checkpoint prefix to an orbax dir.

        python -m ucdir_tpu.utils.convert_torch <prefix> <out_dir>

    <prefix> is reference-style (e.g. experiments/sid/checkpoint/I_Elatest) —
    both `_gen.pth` and `_gen_ema.pth` are converted when present.
    """
    import argparse
    import os

    import numpy as np

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument('prefix', help='reference checkpoint prefix '
                        '(appends _gen.pth / _gen_ema.pth)')
    parser.add_argument('out', help='output orbax checkpoint directory')
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    payload = {}
    gen = args.prefix + '_gen.pth'
    ema = args.prefix + '_gen_ema.pth'
    if os.path.exists(gen):
        payload['params'] = load_torch_checkpoint(gen)
        print('converted', gen)
    if os.path.exists(ema):
        payload['ema_params'] = load_torch_checkpoint(ema)
        print('converted', ema)
    if not payload:
        raise SystemExit('no %s / %s found' % (gen, ema))
    payload.setdefault('params', payload.get('ema_params'))
    payload.setdefault('ema_params', payload.get('params'))
    payload['step'] = np.asarray(0)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.out), payload, force=True)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
