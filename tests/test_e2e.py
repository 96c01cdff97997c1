"""End-to-end debug-mode run on synthetic fixture data (SURVEY.md §4:
the reference's `-debug` flag is its built-in smoke test; this is ours,
exercising config -> data -> trainer -> checkpoint -> val loop)."""
import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image


def _write_pairs(root, n, size=40):
    rng = np.random.default_rng(0)
    for sub in ('input', 'target'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        clean = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        noisy = np.clip(clean.astype(int) +
                        rng.normal(0, 25, clean.shape), 0, 255).astype(np.uint8)
        Image.fromarray(clean).save(os.path.join(root, 'target', f'{i:03d}.png'))
        Image.fromarray(noisy).save(os.path.join(root, 'input', f'{i:03d}.png'))


def _fixture_config(tmp, data_root):
    cfg = {
        'name': 'sid-tiny',
        'phase': 'train',
        'path': {'log': 'logs', 'tb_logger': 'tb', 'results': 'results',
                 'checkpoint': 'checkpoint', 'resume_state': None},
        'datasets': {
            'train': {'name': 'fx', 'datasetname': 'PairDataset',
                      'data_args': {'datatype': 'img',
                                    'dataroot': {'lq': f'{data_root}/input',
                                                 'gt': f'{data_root}/target'},
                                    'crop_size': 32},
                      'batch_size': 2, 'num_workers': 1, 'use_shuffle': True},
            'val': {'name': 'fxval', 'datasetname': 'PairDataset',
                    'data_args': {'datatype': 'img',
                                  'dataroot': {'lq': f'{data_root}/input',
                                               'gt': f'{data_root}/target'},
                                  'data_len': 2, 'split': 'val'}},
        },
        'model': {
            'which_model_G': 'ucdir', 'unet_name': 'DY3h',
            'diffusion_name': 'ResiGaussianGuideDY', 'finetune_norm': False,
            # attn_res empty: full spatial attention at val-padded sizes is
            # prohibitively slow on the CPU test backend (covered by the
            # torch-parity and model tests instead)
            'unet': {'in_channel': 6, 'out_channel': 3, 'inner_channel': 8,
                     'channel_mults': [1, 2], 'attn_res': [],
                     'res_blocks': 1, 'dropout': 0.0, 'norm_groups': 1},
            'beta_schedule': {
                'train': {'schedule': 'linear', 'n_timestep': 10,
                          'linear_start': 1e-6, 'linear_end': 1e-2},
                'val': {'schedule': 'linear', 'n_timestep': 5,
                        'linear_start': 1e-6, 'linear_end': 0.4}},
            'diffusion': {'image_size': 32, 'channels': 3, 'conditional': True},
        },
        'train': {'n_iter': 4, 'val_freq': 4, 'save_checkpoint_freq': 2,
                  'save_models': 1000000, 'print_freq': 2,
                  'optimizer': {'type': 'adamw', 'lr': 1e-4},
                  'ema_scheduler': {'use': True, 'step_start_ema': 2,
                                    'update_ema_every': 1,
                                    'ema_decay': 0.999}},
        'wandb': {'project': 'test'},
    }
    path = os.path.join(tmp, 'tiny.yaml')
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp('e2e'))
    data_root = os.path.join(tmp, 'data')
    _write_pairs(data_root, 6)
    # separate tiny val split: the val phase forces data_len=-1 (parse() sid
    # branch), so keep the val dirs small to bound the 50-step sampling cost
    val_root = os.path.join(tmp, 'valdata')
    _write_pairs(val_root, 2)
    cfg_path = _fixture_config(tmp, data_root)
    import yaml as _yaml
    with open(cfg_path) as f:
        cfg = _yaml.safe_load(f)
    cfg['datasets']['val']['data_args']['dataroot'] = {
        'lq': f'{val_root}/input', 'gt': f'{val_root}/target'}
    with open(cfg_path, 'w') as f:
        _yaml.safe_dump(cfg, f)
    return tmp, cfg_path


def _run_sr(tmp, argv):
    import sr as sr_main
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp)  # experiments/ tree lands in tmp
    sys.argv = ['sr.py'] + argv
    try:
        sr_main.main()
    finally:
        sys.argv, _ = old_argv, os.chdir(old_cwd)


def _find(root, suffix):
    hits = []
    for dirpath, _, files in os.walk(root):
        hits += [os.path.join(dirpath, f) for f in files if f.endswith(suffix)]
    return hits


def test_train_loop_e2e(workspace):
    tmp, cfg_path = workspace
    _run_sr(tmp, ['-p', 'train', '-c', cfg_path])
    exp = os.path.join(tmp, 'experiments')
    # training log with loss lines
    logs = _find(exp, 'train.log')
    assert logs, 'no train log'
    text = open(sorted(logs)[-1]).read()
    assert 'l_pix' in text
    # in-train validation ran and saved images
    assert _find(exp, '_sr.png')
    # checkpoint saved ('latest' at steps 2 and 4)
    assert any('I_Elatest' in d for d in
               [p for p, _, _ in os.walk(exp)]), 'no latest checkpoint dir'


def test_val_phase_with_orbax_checkpoint(workspace):
    tmp, cfg_path = workspace
    exp = os.path.join(tmp, 'experiments')
    ckpts = [os.path.join(p, d) for p, dirs, _ in os.walk(exp)
             for d in dirs if d.startswith('I_Elatest')]
    assert ckpts, 'train test must run first'
    # -debug caps the sid-forced 50-step val schedule at 10 steps
    # (core/logger.py:171-179 applies the debug shrink after val overrides)
    _run_sr(tmp, ['-p', 'val', '-c', cfg_path, '--checkpoint', ckpts[-1],
                  '-debug'])
    val_logs = _find(exp, 'val.log')
    joined = ''.join(open(p).read() for p in sorted(val_logs))
    assert 'psnr' in joined and 'ssim' in joined


def test_val_patch_alt_driver(workspace):
    """--val_patch (outer-loop tiled sampling, reference sr.py:17-57) through
    the real CLI at a tiny tile size (VERDICT r3 item 8)."""
    tmp, cfg_path = workspace
    exp = os.path.join(tmp, 'experiments')
    ckpts = [os.path.join(p, d) for p, dirs, _ in os.walk(exp)
             for d in dirs if d.startswith('I_Elatest')]
    assert ckpts, 'train test must run first'
    # skip=72 keeps the trainer's 64-px reflect pad legal on each tile
    # (jnp reflect needs pad < dim) while still exercising a 2x2 tile grid;
    # ddim-2-step bounds the per-tile sampling cost on the 1-core CPU host
    # (the grid geometry itself is unit-tested in test_tiled/test_resident)
    _run_sr(tmp, ['-p', 'val', '-c', cfg_path, '--checkpoint', ckpts[-1],
                  '-debug', '--val_patch', '--patch_skip', '72',
                  '--patch_padding', '8', '--sampler', 'ddim',
                  '--sampling_timesteps', '2'])
    logs = _find(exp, 'train.log')
    joined = ''.join(open(p).read() for p in sorted(logs))
    assert 'val_patch # PSNR' in joined
    assert _find(exp, '_sr.png')


def test_search_params_alt_driver(workspace):
    """--search_params (sampler hyperparameter grid, reference sr.py:60-126)
    through the real CLI on a 2x2 tiny grid (VERDICT r3 item 8)."""
    tmp, cfg_path = workspace
    exp = os.path.join(tmp, 'experiments')
    ckpts = [os.path.join(p, d) for p, dirs, _ in os.walk(exp)
             for d in dirs if d.startswith('I_Elatest')]
    assert ckpts, 'train test must run first'
    _run_sr(tmp, ['-p', 'val', '-c', cfg_path, '--checkpoint', ckpts[-1],
                  '-debug', '--search_params', '--search_steps', '2,3',
                  '--search_ends', '0.4'])
    logs = _find(exp, 'train.log')
    joined = ''.join(open(p).read() for p in sorted(logs))
    for cell in ('steps=2 linear_end=0.40', 'steps=3 linear_end=0.40'):
        assert '# search %s PSNR' % cell in joined, cell


def test_val_phase_dpmpp_sde_sampler(workspace):
    """Few-step SDE-DPM-Solver++ val through the real CLI (the alt-driver
    surface: reference sr.py:17-92's dpm variant, here --sampler)."""
    tmp, cfg_path = workspace
    exp = os.path.join(tmp, 'experiments')
    ckpts = [os.path.join(p, d) for p, dirs, _ in os.walk(exp)
             for d in dirs if d.startswith('I_Elatest')]
    assert ckpts, 'train test must run first'
    _run_sr(tmp, ['-p', 'val', '-c', cfg_path, '--checkpoint', ckpts[-1],
                  '-debug', '--sampler', 'dpmpp_sde',
                  '--sampling_timesteps', '3'])
    val_logs = _find(exp, 'val.log')
    joined = ''.join(open(p).read() for p in sorted(val_logs))
    assert 'psnr' in joined and 'ssim' in joined
