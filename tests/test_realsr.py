"""Real-ESRGAN degradation path tests: dataset kernels, the two-stage on-device
feed pipeline, and the training-pair queue."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from ucdir_tpu.realsr import (RealESRGANDataset, TrainerRealSR, dopt, param,
                              paired_random_crop_np)


@pytest.fixture(scope='module')
def imagenet_fixture(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp('realsr'))
    root = os.path.join(tmp, 'imgs')
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        img = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
        name = f'{i:03d}.png'
        Image.fromarray(img).save(os.path.join(root, name))
        names.append(name)
    txt = os.path.join(tmp, 'list.txt')
    with open(txt, 'w') as f:
        f.write('\n'.join(names))
    return root, txt


def test_dataset_kernels(imagenet_fixture):
    root, txt = imagenet_fixture
    ds = RealESRGANDataset({'root': root, 'txt': txt}, split='train',
                           crop_size=64)
    item = ds[0]
    assert item['gt'].shape == (64, 64, 3)
    assert item['kernel1'].shape == (21, 21)
    assert item['kernel2'].shape == (21, 21)
    assert item['sinc_kernel'].shape == (21, 21)
    assert item['kernel1'].sum() == pytest.approx(1.0, abs=1e-4)
    # sinc is either a generated filter or the identity pulse
    assert item['sinc_kernel'].sum() == pytest.approx(1.0, abs=1e-4)


def test_paired_random_crop_alignment(rng):
    gt = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    lq = gt[:, ::4, ::4, :]  # perfectly aligned 4x downsample (nearest)
    g, l = paired_random_crop_np(gt, lq, 32, 4)
    assert g.shape == (1, 32, 32, 3) and l.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(g[:, ::4, ::4]), np.asarray(l))


def _tiny_realsr_opt(root, txt, tmp):
    from ucdir_tpu.config import dict_to_nonedict
    return dict_to_nonedict({
        'name': 'realsr-tiny', 'phase': 'train', 'dopt': 'dopt_tiny_test',
        'path': {'checkpoint': tmp, 'resume_state': None},
        'datasets': {'train': {'batch_size': 2}},
        'model': {
            'which_model_G': 'ucdir', 'unet_name': 'DY3h',
            'diffusion_name': 'ResiGaussianGuideDY',
            'unet': {'in_channel': 6, 'out_channel': 3, 'inner_channel': 8,
                     'channel_mults': [1, 2], 'attn_res': [],
                     'res_blocks': 1, 'dropout': 0.0, 'norm_groups': 1},
            'beta_schedule': {
                'train': {'schedule': 'linear', 'n_timestep': 10,
                          'linear_start': 1e-6, 'linear_end': 1e-2},
                'val': {'schedule': 'linear', 'n_timestep': 5,
                        'linear_start': 1e-6, 'linear_end': 0.4}},
            'diffusion': {'image_size': 32, 'channels': 3, 'conditional': True}},
        'train': {'n_iter': 2, 'optimizer': {'type': 'adamw', 'lr': 1e-4},
                  'ema_scheduler': {'use': False}},
    })


def test_realsr_feed_and_train_step(imagenet_fixture, tmp_path):
    root, txt = imagenet_fixture
    import ucdir_tpu.realsr as realsr_mod
    # tiny preset: 64-px gt crops -> 16-px lq, queue of 4
    realsr_mod.DOPTS['dopt_tiny_test'] = dict(realsr_mod.dopt1,
                                              gt_size=32, queue_size=4)
    opt = _tiny_realsr_opt(root, txt, str(tmp_path))
    trainer = TrainerRealSR(opt)

    ds = RealESRGANDataset({'root': root, 'txt': txt}, split='train',
                           crop_size=64)
    batch = {k: np.stack([ds[i][k] for i in (0, 1)])
             for k in ('gt', 'kernel1', 'kernel2', 'sinc_kernel')}
    trainer.feed_data(batch)
    assert trainer.data['SR'].shape == (2, 32, 32, 3)
    assert trainer.data['HR'].shape == (2, 32, 32, 3)
    assert trainer.data['SR'].min() >= -1 and trainer.data['SR'].max() <= 1
    assert np.isfinite(trainer.data['SR']).all()

    trainer.optimize_parameters()
    assert np.isfinite(trainer.log_dict['l_pix'])

    # second feed exercises the queue path
    trainer.feed_data(batch)
    assert trainer.data['SR'].shape == (2, 32, 32, 3)


@pytest.mark.parametrize('mode', ['area', 'bilinear', 'bicubic'])
@pytest.mark.parametrize('scale', [0.37, 0.5, 1.5])
def test_interpolate_matches_torch(mode, scale, rng):
    """Exact parity with torch F.interpolate defaults (antialias=False;
    'area' = adaptive average pooling) — the degradation distribution the
    model learns to invert must match the reference's (ADVICE r1)."""
    import torch
    import torch.nn.functional as F
    from ucdir_tpu.data.degradations import interpolate

    x = rng.standard_normal((2, 17, 23, 3)).astype(np.float32)
    ours = np.asarray(interpolate(jnp.asarray(x), scale_factor=scale,
                                  mode=mode))
    theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                           scale_factor=scale, mode=mode)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_interpolate_size_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    from ucdir_tpu.data.degradations import interpolate

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    for mode, size in [('bicubic', (21, 45)), ('bilinear', (9, 9)),
                       ('area', (13, 29))]:
        ours = np.asarray(interpolate(jnp.asarray(x), size=size, mode=mode))
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               size=size, mode=mode)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
