"""End-to-end val-phase runs for the gop-deblur and jpg-restore task configs
(VERDICT r2 item 7): config.parse's per-task val overrides
(/root/reference/core/logger.py:63-136 semantics — GoPro test dataroot rewrite,
imagenet val txt rewrite + quality factor [10,10] + crop_size=-1) must drive
`sr.py -p val` end-to-end on synthetic fixtures."""
import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image


def _model_block():
    return {
        'which_model_G': 'ucdir', 'unet_name': 'DY3h',
        'diffusion_name': 'ResiGaussianGuideDY', 'finetune_norm': False,
        'unet': {'in_channel': 6, 'out_channel': 3, 'inner_channel': 8,
                 'channel_mults': [1, 2], 'attn_res': [],
                 'res_blocks': 1, 'dropout': 0.0, 'norm_groups': 1},
        'beta_schedule': {
            'train': {'schedule': 'linear', 'n_timestep': 10,
                      'linear_start': 1e-6, 'linear_end': 1e-2},
            'val': {'schedule': 'linear', 'n_timestep': 200,
                    'linear_start': 1e-6, 'linear_end': 0.1}},
        'diffusion': {'image_size': 32, 'channels': 3, 'conditional': True},
    }


def _train_block():
    return {'n_iter': 2, 'val_freq': 1000, 'save_checkpoint_freq': 2,
            'save_models': 1000000, 'print_freq': 2,
            'optimizer': {'type': 'adamw', 'lr': 1e-4},
            'ema_scheduler': {'use': True, 'step_start_ema': 1,
                              'update_ema_every': 1, 'ema_decay': 0.999}}


def _write_images(d, n, size=48, pair=False):
    rng = np.random.default_rng(1)
    os.makedirs(d, exist_ok=True)
    names = []
    for i in range(n):
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        name = f'{i:03d}.png'
        Image.fromarray(img).save(os.path.join(d, name))
        names.append(name)
    return names


def _run_sr(tmp, argv):
    import sr as sr_main
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp)
    sys.argv = ['sr.py'] + argv
    try:
        sr_main.main()
    finally:
        sys.argv, _ = old_argv, os.chdir(old_cwd)


def _find(root, suffix):
    return [os.path.join(dp, f) for dp, _, fs in os.walk(root)
            for f in fs if f.endswith(suffix)]


def _latest_ckpt(exp):
    cks = [os.path.join(p, d) for p, dirs, _ in os.walk(exp)
           for d in dirs if d.startswith('I_Elatest')]
    assert cks, 'no checkpoint from the train phase'
    return cks[-1]


@pytest.mark.parametrize('task', ['gop', 'jpg'])
def test_task_val_e2e(task, tmp_path, monkeypatch):
    tmp = str(tmp_path)

    if task == 'gop':
        # train pair dirs + the GoPro test split the gop- override points at
        for sub in ('input', 'target'):
            _write_images(os.path.join(tmp, 'gtrain', sub), 3)
            _write_images(os.path.join(tmp, 'gtest', sub), 2)
        monkeypatch.setenv('UCDIR_TPU_GOPRO_TEST_ROOT',
                           os.path.join(tmp, 'gtest'))
        datasets = {
            'train': {'name': 'GoPro', 'datasetname': 'PairDataset',
                      'data_args': {'datatype': 'img',
                                    'dataroot': {
                                        'lq': f'{tmp}/gtrain/input',
                                        'gt': f'{tmp}/gtrain/target'},
                                    'crop_size': 32},
                      'batch_size': 2, 'num_workers': 1, 'use_shuffle': True},
            # val dataroot points at the TRAIN dirs: parse's gop- branch must
            # rewrite it to the test split above (logger.py:63-112); the
            # config-level assert below proves the rewrite happened
            'val': {'name': 'GoProVal', 'datasetname': 'PairDataset',
                    'data_args': {'datatype': 'img',
                                  'dataroot': {'lq': f'{tmp}/gtrain/input',
                                               'gt': f'{tmp}/gtrain/target'},
                                  'data_len': -1, 'split': 'val'}},
        }
        name = 'gop-tiny'
    else:
        names = _write_images(os.path.join(tmp, 'imgs', 'val'), 2)
        _write_images(os.path.join(tmp, 'imgs', 'train'), 3)
        with open(os.path.join(tmp, 'val.txt'), 'w') as f:
            f.write('\n'.join(names))
        with open(os.path.join(tmp, 'train.txt'), 'w') as f:
            f.write('\n'.join(names))
        monkeypatch.setenv('UCDIR_TPU_IMAGENET_VAL_ROOT',
                           os.path.join(tmp, 'imgs', 'val'))
        monkeypatch.setenv('UCDIR_TPU_IMAGENET_VAL_TXT',
                           os.path.join(tmp, 'val.txt'))
        datasets = {
            'train': {'name': 'ImagenetJPG',
                      'datasetname': 'ImagenetJPGDataset',
                      'data_args': {'dataroot': {
                          'root': f'{tmp}/imgs/train',
                          'txt': f'{tmp}/train.txt'},
                          'crop_size': 32, 'factor': [5, 30]},
                      'batch_size': 2, 'num_workers': 1, 'use_shuffle': True},
            'val': {'name': 'ImagenetJPGVal',
                    'datasetname': 'ImagenetJPGDataset',
                    'data_args': {'dataroot': {'root': f'{tmp}/imgs/train',
                                               'txt': f'{tmp}/train.txt'},
                                  'crop_size': 256, 'factor': [5, 30],
                                  'data_len': -1, 'split': 'val'}},
        }
        name = 'jpg-tiny'

    cfg = {'name': name, 'phase': 'train',
           'path': {'log': 'logs', 'tb_logger': 'tb', 'results': 'results',
                    'checkpoint': 'checkpoint', 'resume_state': None},
           'datasets': datasets, 'model': _model_block(),
           'train': _train_block(), 'wandb': {'project': 'test'}}
    cfg_path = os.path.join(tmp, f'{name}.yaml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    # sanity on the override itself (no jax needed)
    from ucdir_tpu.config import parse
    opt = parse(cfg_path, phase='val', checkpoint='x', debug=True,
                make_dirs=False, num_processes=1)
    if task == 'gop':
        assert opt['datasets']['val']['data_args']['dataroot']['lq'] == \
            os.path.join(tmp, 'gtest', 'input')
        assert opt['path']['experiments_root'].endswith('full')
    else:
        assert opt['datasets']['val']['data_args']['dataroot']['txt'] == \
            os.path.join(tmp, 'val.txt')
        assert opt['datasets']['val']['data_args']['factor'] == [10, 10]
        assert opt['datasets']['val']['data_args']['crop_size'] == -1
        assert opt['path']['experiments_root'].endswith('fullimage10')
    # both tasks: forced 50-step/0.4 val schedule, then the -debug cap to 10
    assert opt['model']['beta_schedule']['val']['n_timestep'] == 10
    assert opt['model']['beta_schedule']['val']['linear_end'] == 4e-1

    # train 2 steps -> checkpoint, then the val phase end-to-end
    _run_sr(tmp, ['-p', 'train', '-c', cfg_path])
    exp = os.path.join(tmp, 'experiments')
    ckpt = _latest_ckpt(exp)
    _run_sr(tmp, ['-p', 'val', '-c', cfg_path, '--checkpoint', ckpt,
                  '-debug'])

    joined = ''.join(open(p).read() for p in sorted(_find(exp, 'val.log')))
    assert 'psnr' in joined and 'ssim' in joined
    # save_jpg renames .png -> .jpg (reference core/metrics.py behavior)
    assert _find(exp, '_sr.jpg'), 'no val result images saved'
