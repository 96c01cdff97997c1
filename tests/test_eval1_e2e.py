"""eval1.py CLI end-to-end with SYNTHETIC pretrained weights (VERDICT r3
item 9): run the real evaluator through its argv surface with
converter-produced random LPIPS/Inception weight files, so on a
weights-available host the ONLY delta is the tensor values — the loading,
conversion, patching and metric plumbing are all exercised here."""
import os
import sys

import numpy as np
import pytest
import torch

from test_feature_oracles import _random_lpips_state_dict, TorchFIDInception


@pytest.fixture(scope='module')
def results_dir(tmp_path_factory):
    import cv2
    tmp = tmp_path_factory.mktemp('eval1')
    rng = np.random.default_rng(0)
    d = tmp / 'results'
    d.mkdir()
    # 256px images -> exactly one FID patch each (keeps inception cheap)
    for i in range(2):
        hr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        sr = np.clip(hr.astype(int) + rng.normal(0, 12, hr.shape),
                     0, 255).astype(np.uint8)
        cv2.imwrite(str(d / f'{i}_x_hr.png'), hr)
        cv2.imwrite(str(d / f'{i}_x_sr.png'), sr)
    return str(d)


@pytest.fixture(scope='module')
def weight_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('weights')
    gen = torch.Generator().manual_seed(0)
    lpips_path = str(tmp / 'lpips_alex.pth')
    torch.save(_random_lpips_state_dict(gen), lpips_path)
    torch.manual_seed(0)
    net = TorchFIDInception()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    inc_path = str(tmp / 'inception_fid.pth')
    torch.save(net.state_dict(), inc_path)
    return lpips_path, inc_path


def test_eval1_cli_full_pipeline(results_dir, weight_files, monkeypatch,
                                 capsys):
    lpips_path, inc_path = weight_files
    monkeypatch.setenv('UCDIR_TPU_LPIPS_WEIGHTS', lpips_path)
    monkeypatch.setenv('UCDIR_TPU_INCEPTION_NPZ', inc_path)
    monkeypatch.setattr(sys, 'argv', ['eval1.py', '-s', results_dir])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import eval1
    eval1.main()
    out = capsys.readouterr().out
    assert 'skipped' not in out, out
    for key in ('LPIPS', 'PSNR', 'SSIM', 'niqe', 'FID:', 'KID'):
        assert key in out, (key, out)
    # metric values parse as finite numbers
    for line in out.splitlines():
        if line.startswith(('LPIPS', 'PSNR', 'SSIM', 'niqe')):
            assert np.isfinite(float(line.split()[-1])), line
    # patch decomposition landed on disk (reference eval1.py:222-243)
    assert os.path.isdir(results_dir + '_gt_pt')
    assert len(os.listdir(results_dir + '_sr_pt')) == 2


def test_eval1_without_weights_reports_skips(results_dir, monkeypatch,
                                             capsys):
    monkeypatch.delenv('UCDIR_TPU_LPIPS_WEIGHTS', raising=False)
    monkeypatch.delenv('UCDIR_TPU_INCEPTION_NPZ', raising=False)
    monkeypatch.setattr(sys, 'argv', ['eval1.py', '-s', results_dir])
    import eval1
    eval1.main()
    out = capsys.readouterr().out
    assert 'LPIPS skipped' in out and 'FID/KID skipped' in out
    for key in ('PSNR', 'SSIM', 'niqe'):
        assert key in out
