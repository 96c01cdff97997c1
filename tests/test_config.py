"""Config parse behavior vs /root/reference/core/logger.py:22-199."""
import os

import pytest

from ucdir_tpu.config import parse, NoneDict, dict_to_nonedict, dict2str

CFG = os.path.join(os.path.dirname(__file__), '..', 'ucdir_tpu', 'configs', 'sid.yaml')


def test_nonedict_missing_returns_none():
    d = dict_to_nonedict({'a': {'b': 1}})
    assert d['missing'] is None
    assert d['a']['also_missing'] is None
    assert d['a']['b'] == 1


def test_train_parse_batch_division():
    opt = parse(CFG, phase='train', num_processes=8, make_dirs=False)
    assert opt['datasets']['train']['batch_size'] == 4  # 32 / 8
    assert opt['phase'] == 'train'
    assert opt['model']['beta_schedule']['train']['n_timestep'] == 2000


def test_val_parse_sid_overrides():
    opt = parse(CFG, phase='val', checkpoint='ckpt/I_Elatest',
                num_processes=1, make_dirs=False)
    # sid val: 50 steps, linear_end 0.4, EMA suffix, data_len -1
    assert opt['model']['beta_schedule']['val']['n_timestep'] == 50
    assert opt['model']['beta_schedule']['val']['linear_end'] == pytest.approx(0.4)
    assert opt['name'] == 'val_sid-ema'
    assert opt['path']['resume_state'] == 'ckpt/I_Elatest'
    assert opt['datasets']['val']['data_args']['data_len'] == -1
    assert opt['datasets']['val']['data_args']['split'] == 'val'
    assert '_s50' in opt['path']['experiments_root']


def test_debug_mode_shrinks():
    opt = parse(CFG, phase='train', debug=True, num_processes=1, make_dirs=False)
    assert opt['name'].startswith('debug_')
    assert opt['train']['val_freq'] == 2
    assert opt['datasets']['train']['batch_size'] == 2
    assert opt['model']['beta_schedule']['train']['n_timestep'] == 10
    assert opt['datasets']['train']['data_len'] == 6


def test_dict2str_roundtrip():
    s = dict2str({'a': 1, 'b': {'c': 2}})
    assert 'a: 1' in s and 'c: 2' in s


def test_val_parse_gop_and_jpg_branches(tmp_path):
    import yaml
    for name, needs in (('gop-deblur', {}), ('jpg-restore', {})):
        src = os.path.join(os.path.dirname(__file__), '..', 'ucdir_tpu',
                           'configs', f'{name}.yaml')
        opt = parse(src, phase='val', checkpoint='ck', num_processes=1,
                    make_dirs=False)
        assert opt['model']['beta_schedule']['val']['n_timestep'] == 50
        assert opt['model']['beta_schedule']['val']['linear_end'] == pytest.approx(0.4)
        if name == 'jpg-restore':
            assert opt['datasets']['val']['data_args']['factor'] == [10, 10]
            assert opt['datasets']['val']['data_args']['crop_size'] == -1
