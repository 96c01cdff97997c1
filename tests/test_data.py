"""Data layer tests: sampler determinism/sharding, loader batching, datasets,
masks, and the eval1 CLI end-to-end."""
import os
import sys

import numpy as np
import pytest
from PIL import Image

from ucdir_tpu.data import (EnlargedSampler, DataLoader, create_dataset,
                            create_dataloader, PairDataset, LRHRDataset,
                            SingleDataset, ImagenetJPGDataset)
from ucdir_tpu.data.mask import (bbox2mask, random_bbox, brush_stroke_mask,
                                 get_irregular_mask)


class _FakeDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'HR': np.full((4, 4, 3), i, np.float32), 'Index': i}


def test_sampler_deterministic_and_sharded():
    ds = _FakeDS(10)
    samplers = [EnlargedSampler(ds, 4, r) for r in range(4)]
    all_indices = [list(s) for s in samplers]
    assert all(len(ix) == 3 for ix in all_indices)  # ceil(10/4)
    # same epoch -> same permutation
    assert list(samplers[0]) == all_indices[0]
    # different epoch -> different permutation
    samplers[0].set_epoch(1)
    assert list(samplers[0]) != all_indices[0]
    # rank shards are disjoint positions of one global permutation
    flat = [i for ix in all_indices for i in ix]
    assert len(flat) == 12  # 4 * ceil(10/4), wraps modulo dataset len


def test_sampler_enlarge_ratio():
    ds = _FakeDS(4)
    s = EnlargedSampler(ds, 1, 0, ratio=3)
    assert len(s) == 12
    assert all(0 <= i < 4 for i in s)


def test_loader_batching_and_drop_last():
    ds = _FakeDS(10)
    loader = DataLoader(ds, batch_size=4, sampler=EnlargedSampler(ds, 1, 0),
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]['HR'].shape == (4, 4, 4, 3)
    assert batches[0]['Index'].shape == (4,)
    loader2 = DataLoader(ds, batch_size=4, sampler=EnlargedSampler(ds, 1, 0),
                         drop_last=False)
    assert len(list(loader2)) == 3


@pytest.fixture(scope='module')
def img_dirs(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp('data'))
    rng = np.random.default_rng(0)
    for sub in ('lq', 'gt'):
        os.makedirs(os.path.join(tmp, sub))
        for i in range(3):
            arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(tmp, sub, f'{i}.png'))
    return tmp


def test_pair_dataset_and_factory(img_dirs):
    opt = {'name': 'x', 'datasetname': 'PairDataset',
           'data_args': {'datatype': 'img',
                         'dataroot': {'lq': f'{img_dirs}/lq',
                                      'gt': f'{img_dirs}/gt'},
                         'crop_size': 32, 'split': 'train'}}
    ds = create_dataset(opt, 'train')
    item = ds[0]
    assert item['HR'].shape == (32, 32, 3)
    assert item['SR'].shape == (32, 32, 3)
    assert -1 <= item['HR'].min() and item['HR'].max() <= 1
    loader = create_dataloader(ds, {'batch_size': 2, 'num_workers': 1},
                               'train')
    batch = next(iter(loader))
    assert batch['HR'].shape == (2, 32, 32, 3)


def test_single_dataset(img_dirs):
    ds = SingleDataset({'gt': f'{img_dirs}/gt'}, split='val')
    item = ds[0]
    assert item['HR'].shape == (48, 48, 3)


def test_imagenet_jpg_dataset(img_dirs, tmp_path):
    txt = str(tmp_path / 'list.txt')
    with open(txt, 'w') as f:
        f.write('0.png\n1.png\n2.png\n')
    ds = ImagenetJPGDataset({'root': f'{img_dirs}/gt', 'txt': txt},
                            split='val', crop_size=32, factor=[10, 10])
    item = ds[0]
    assert item['HR'].shape == (32, 32, 3)
    # JPEG at q10 must differ visibly from the clean image
    assert np.abs(item['HR'] - item['SR']).mean() > 1e-3


def test_masks():
    m = bbox2mask((64, 64), random_bbox((64, 64)))
    assert m.shape == (64, 64, 1) and m.max() == 1
    m = brush_stroke_mask((64, 64))
    assert m.shape == (64, 64, 1) and set(np.unique(m)) <= {0, 1}
    m = get_irregular_mask((64, 64))
    assert m.shape == (64, 64, 1)


def test_eval1_cli(img_dirs, tmp_path, capsys, monkeypatch):
    """eval1.py over a fake results dir (hr/sr pairs) — PSNR/SSIM/NIQE run,
    LPIPS/FID report skipped without weights."""
    res = str(tmp_path / 'results')
    os.makedirs(res)
    rng = np.random.default_rng(1)
    for i in range(2):
        hr = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        sr = np.clip(hr.astype(int) + rng.normal(0, 10, hr.shape),
                     0, 255).astype(np.uint8)
        Image.fromarray(hr).save(os.path.join(res, f'{i}_hr.png'))
        Image.fromarray(sr).save(os.path.join(res, f'{i}_sr.png'))
    import eval1
    monkeypatch.setattr(sys, 'argv', ['eval1.py', '-s', res])
    eval1.main()
    out = capsys.readouterr().out
    assert 'PSNR' in out and 'SSIM' in out and 'niqe' in out
    assert 'LPIPS skipped' in out and 'FID/KID skipped' in out


def test_lrhr_triplet_dataset(tmp_path):
    """sr_N_M / hr_M / lr_N triplet layout (LRHR_dataset.py:133-227)."""
    rng = np.random.default_rng(0)
    root = str(tmp_path / 'trip')
    for sub, size in (('lr_16', 16), ('hr_32', 32), ('sr_16_32', 32)):
        os.makedirs(os.path.join(root, sub))
        for i in range(2):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(root, sub, f'{i}.png'))
    ds = LRHRDataset(root, l_resolution=16, r_resolution=32, split='val',
                     need_LR=True)
    item = ds[0]
    assert item['HR'].shape == (32, 32, 3)
    assert item['SR'].shape == (32, 32, 3)
    assert item['LR'].shape == (16, 16, 3)
    # factory fallback path (no datasetname -> LRHRDataset)
    opt = {'name': 'x', 'dataroot': root, 'datatype': 'img',
           'l_resolution': 16, 'r_resolution': 32, 'data_len': -1,
           'mode': 'LRHR'}
    ds2 = create_dataset(opt, 'val')
    assert len(ds2) == 2


@pytest.mark.parametrize('mode', ['bbox', 'center', 'irregular', 'free_form',
                                  'hybrid'])
def test_get_mask_modes(mode):
    """Mode dispatch parity with the reference get_mask
    (LRHR_dataset.py:304-322): every mode yields a nonempty uint8 HW1 mask."""
    from ucdir_tpu.data.mask import get_mask
    m = get_mask(mode, (64, 64))
    assert m.shape == (64, 64, 1) and m.dtype == np.uint8
    assert 0 < m.mean() < 1
    if mode == 'center':
        # deterministic center box: exactly the middle h/2 x w/2
        assert m[16:48, 16:48].all() and m.sum() == 32 * 32


def test_get_mask_unknown_mode():
    from ucdir_tpu.data.mask import get_mask
    with pytest.raises(NotImplementedError):
        get_mask('nope', (64, 64))


def test_pair_dataset_mask_mode(img_dirs):
    """PairDataset honors mask + mask_mode config (reference defaults to
    free_form, LRHR_dataset.py:292)."""
    from ucdir_tpu.data.datasets import PairDataset
    ds = PairDataset(dataroot={'lq': f'{img_dirs}/lq', 'gt': f'{img_dirs}/gt'},
                     split='train', crop_size=32, mask=1, mask_mode='center')
    item = ds[0]
    m = item['mask']
    assert m.shape == (32, 32, 1)
    assert m[8:24, 8:24].all() and m.sum() == 16 * 16
