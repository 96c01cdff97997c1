"""Random-weight torch oracles for the LPIPS-alex and InceptionV3 ports.

VERDICT r1 item 6: the converters' transposes and BN-folding math must be
numerically pinned, not just shape-checked — a silent transpose bug would
only surface as a wrong FID at weight-load time. torchvision/lpips are not in
the image, so the torch module graphs are hand-built here with random weights
(layouts and state_dict key names match the real packages), run in torch, and
compared against the JAX ports fed through the existing converters.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# LPIPS (alex) — oracle replicates lpips.LPIPS(net='alex') exactly:
# ScalingLayer -> alexnet features taps relu1..5 -> unit-normalize ->
# squared diff -> 1x1 nonneg lin -> spatial mean -> sum over taps.
# --------------------------------------------------------------------------

_ALEX_TORCH = [  # (in, out, kernel, stride, pad), torchvision features idx
    (3, 64, 11, 4, 2, 0), (64, 192, 5, 1, 2, 3), (192, 384, 3, 1, 1, 6),
    (384, 256, 3, 1, 1, 8), (256, 256, 3, 1, 1, 10)]
_SHIFT = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)


def _random_lpips_state_dict(gen):
    sd = {}
    slices = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    for (cin, cout, k, s, p, idx) in _ALEX_TORCH:
        sd[f'net.slice{slices[idx]}.{idx}.weight'] = torch.randn(
            cout, cin, k, k, generator=gen) * 0.05
        sd[f'net.slice{slices[idx]}.{idx}.bias'] = torch.randn(
            cout, generator=gen) * 0.05
    for i, (_, cout, *_rest) in enumerate(_ALEX_TORCH):
        sd[f'lin{i}.model.1.weight'] = torch.rand(
            1, cout, 1, 1, generator=gen) * 0.1
    return sd


def _torch_lpips(x, y, sd):
    def feats(z):
        z = (z - _SHIFT) / _SCALE
        out = []
        for (cin, cout, k, s, p, idx) in _ALEX_TORCH:
            sl = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}[idx]
            z = F.conv2d(z, sd[f'net.slice{sl}.{idx}.weight'],
                         sd[f'net.slice{sl}.{idx}.bias'], stride=s, padding=p)
            z = F.relu(z)
            out.append(z)
            if idx in (0, 3):
                z = F.max_pool2d(z, 3, 2)
        return out

    fx, fy = feats(x), feats(y)
    total = 0.
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (a - b) ** 2
        lin = sd[f'lin{i}.model.1.weight']
        total = total + F.conv2d(d, lin).mean(dim=(2, 3)).squeeze(1)
    return total


def test_lpips_alex_matches_torch_oracle():
    from ucdir_tpu.metrics.lpips import convert_lpips_torch, lpips_distance
    gen = torch.Generator().manual_seed(0)
    sd = _random_lpips_state_dict(gen)
    x = torch.rand(2, 3, 64, 64, generator=gen) * 2 - 1
    y = torch.rand(2, 3, 64, 64, generator=gen) * 2 - 1

    want = _torch_lpips(x, y, sd).numpy()
    weights = convert_lpips_torch(sd)
    got = np.asarray(jax.jit(
        lambda a, b: lpips_distance(a, b, weights))(
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            jnp.asarray(y.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


# --------------------------------------------------------------------------
# InceptionV3 (FID variant) — torch graph hand-built with torchvision's
# module/state_dict naming and pytorch-fid's FID tweaks (count-exclude-pad
# avg pools; Mixed_7c pool branch is max pool).
# --------------------------------------------------------------------------

class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class IncA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avgp(x))], 1)


class IncB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class IncC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avgp(x))], 1)


class IncD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                          F.max_pool2d(x, 3, 2)], 1)


class IncE(tnn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = _avgp(x) if self.pool_mode == 'avg' else F.max_pool2d(
            x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TorchFIDInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, 'avg')
        self.Mixed_7c = IncE(2048, 'max')

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for name in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d', 'Mixed_6a',
                     'Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e',
                     'Mixed_7a', 'Mixed_7b', 'Mixed_7c'):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def test_inception_v3_matches_torch_oracle():
    from ucdir_tpu.metrics.inception import (InceptionV3Features,
                                             convert_inception_torch)
    torch.manual_seed(0)
    net = TorchFIDInception()
    # randomize BN running stats so the folding math is actually exercised
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()

    x = torch.rand(1, 3, 299, 299) * 2 - 1
    with torch.no_grad():
        want = net(x).numpy()

    params = convert_inception_torch(net.state_dict())
    model = InceptionV3Features()
    got = np.asarray(jax.jit(lambda z: model.apply({'params': params}, z))(
        jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert got.shape == want.shape == (1, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_inception_classifier_probs_matches_torch_oracle():
    """fc head + softmax vs the torch composition (the reference IS path,
    eval1.py:74-130): converter transposes + probs pipeline verified."""
    from ucdir_tpu.metrics.inception import (InceptionV3Features,
                                             convert_inception_torch)
    torch.manual_seed(1)
    net = TorchFIDInception()
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    fc = tnn.Linear(2048, 1000)
    net.eval()

    x = torch.rand(1, 3, 299, 299) * 2 - 1
    with torch.no_grad():
        want = torch.softmax(fc(net(x)), dim=-1).numpy()

    sd = dict(net.state_dict())
    sd['fc.weight'] = fc.weight
    sd['fc.bias'] = fc.bias
    params = convert_inception_torch(sd)
    assert 'fc' in params
    feat_params = {k: v for k, v in params.items() if k != 'fc'}

    def probs(z):
        feats = InceptionV3Features().apply({'params': feat_params}, z)
        logits = feats @ params['fc']['kernel'] + params['fc']['bias']
        return jax.nn.softmax(logits, axis=-1)
    got = np.asarray(jax.jit(probs)(jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert got.shape == (1, 1000)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    # and the IS math consumes it end-to-end
    from ucdir_tpu.metrics.fid import inception_score
    is_mean, is_std = inception_score(np.repeat(got, 20, axis=0), splits=2)
    assert np.isfinite(is_mean) and is_mean >= 1.0 - 1e-5
