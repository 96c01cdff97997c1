"""Standalone evaluator — CLI-compatible with the reference `eval1.py`:

    python eval1.py -s <results_dir>

Parity target: /root/reference/eval1.py:180-251 — per-pair LPIPS(alex), PSNR,
SSIM, NIQE over `*hr*`/`*sr*` images in a results directory, then a 256-px
patch decomposition and FID/KID over the patch sets.

LPIPS and FID/KID feature extraction need pretrained weights that cannot be
downloaded in this image; they run when `UCDIR_TPU_LPIPS_WEIGHTS` /
`UCDIR_TPU_INCEPTION_NPZ` are supplied and are reported as skipped otherwise
(PSNR/SSIM/NIQE always run).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def compare_psnr(img1, img2, data_range=255):
    """skimage.metrics.peak_signal_noise_ratio equivalent (skimage is absent)."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float('inf')
    return float(10 * np.log10((data_range ** 2) / mse))


def main():
    import cv2
    from ucdir_tpu.metrics.ssim import calculate_ssim
    from ucdir_tpu.metrics.niqe import calculate_niqe
    from ucdir_tpu.metrics.fid import patch_decompose

    parser = argparse.ArgumentParser()
    parser.add_argument('-s', '--src', type=str, required=True,
                        help='results directory with *hr*/*sr* images')
    parser.add_argument('-fid', type=float, default=0)
    args = parser.parse_args()

    gtdata = sorted(os.path.join(args.src, f) for f in os.listdir(args.src)
                    if 'hr' in f)
    outdata = sorted(os.path.join(args.src, f) for f in os.listdir(args.src)
                     if 'sr' in f)
    assert len(gtdata) == len(outdata), (len(gtdata), len(outdata))
    print('start', len(gtdata), 'pairs')

    lpips_fn = None
    try:
        from ucdir_tpu.metrics.lpips import make_lpips
        lpips_fn = make_lpips()
    except RuntimeError as e:
        print('LPIPS skipped:', e)

    res = []
    for idx, item in enumerate(gtdata):
        print('%2d/%d %s %s' % (idx, len(gtdata), item, outdata[idx]))
        gt = cv2.imread(gtdata[idx])       # BGR
        output = cv2.imread(outdata[idx])  # BGR
        lp = np.nan
        if lpips_fn is not None:
            a = output[:, :, ::-1].astype(np.float32) / 127.5 - 1.
            b = gt[:, :, ::-1].astype(np.float32) / 127.5 - 1.
            lp = float(lpips_fn(a[None], b[None])[0])
        res.append([
            lp,
            compare_psnr(output, gt, data_range=255),
            calculate_ssim(output, gt, 0),
            calculate_niqe(output, 0, input_order='HWC', convert_to='y',
                           bgr=True),
        ])

    res = np.array(res)
    if lpips_fn is not None:
        print('LPIPS', np.nanmean(res[:, 0]))
    print('PSNR', np.mean(res[:, 1]))
    print('SSIM', np.mean(res[:, 2]))
    print('niqe', np.mean(res[:, 3]))

    # 256-px patch decomposition on disk (eval1.py:222-243)
    path = args.src.rstrip('/')
    gt_save_path, sr_save_path = path + '_gt_pt', path + '_sr_pt'
    for save_path, data in [(gt_save_path, gtdata), (sr_save_path, outdata)]:
        os.makedirs(save_path, exist_ok=True)
        for i, item in enumerate(data):
            img = cv2.imread(item)
            for pidx, sub in enumerate(patch_decompose(img, 256)):
                cv2.imwrite(os.path.join(
                    save_path, os.path.basename(item)[:-4] + '%d.png' % pidx),
                    sub)

    try:
        from ucdir_tpu.metrics.fid import inception_features, \
            fid_from_features, kid_from_features

        def load_dir(p):
            files = sorted(os.listdir(p))
            if not files:
                raise RuntimeError('no 256px patches (images smaller than '
                                   'the patch size) — FID/KID undefined')
            return np.stack([cv2.imread(os.path.join(p, f)) for f in files])
        f1 = inception_features(load_dir(gt_save_path))
        f2 = inception_features(load_dir(sr_save_path))
        print('FID: {}'.format(fid_from_features(f1, f2)))
        print('KID', kid_from_features(f1, f2))
    except (RuntimeError, NotImplementedError) as e:
        print('FID/KID skipped:', e)


if __name__ == '__main__':
    main()
