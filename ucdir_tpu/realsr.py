"""Real-ESRGAN-style degradation training: dataset + trainer.

Parity targets:
  * RealESRGANDataset — /root/reference/data/LRHR_dataset.py:668-807 (per-item
    blur/sinc kernel synthesis with the `param`/`param1` presets :638-665);
  * DDPM_realsr — /root/reference/model/model.py:395-577 (the on-GPU two-stage
    degradation feed: USM sharpen -> blur -> random resize -> noise -> DiffJPEG
    -> second stage -> [resize+sinc, JPEG] order coin-flip -> clamp/round ->
    paired random crop -> training-pair queue -> x4 upscale -> [-1,1]).

Execution model: the per-step host randomness (resize scales/modes, noise-type
and order coins) mirrors the reference exactly, so the degradation ops run as
eager JAX on device — each op compiles once per (shape, kernel) and is cached;
per-sample randomness (sigma, gray, jpeg quality) is drawn on device with
explicit PRNG keys like the reference's `_pt` functions. The result feeds the
jitted train step unchanged.
"""
from __future__ import annotations

import math
import random
from typing import Any, Dict

import numpy as np

from ucdir_tpu.data.datasets import ImagenetJPGDataset
from ucdir_tpu.data import util as Util
from ucdir_tpu.data.degradations import (circular_lowpass_kernel,
                                         random_mixed_kernels, filter2D,
                                         usm_sharp, interpolate,
                                         random_add_gaussian_noise_pt,
                                         random_add_poisson_noise_pt)
from ucdir_tpu.data.diffjpeg import diff_jpeg
from ucdir_tpu.trainer import Trainer

# degradation presets (reference LRHR_dataset.py:638-665)
param = {
    'blur_kernel_size': 21,
    'kernel_list': ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
                    'plateau_iso', 'plateau_aniso'],
    'kernel_prob': [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    'sinc_prob': 0.1, 'blur_sigma': [0.2, 3],
    'betag_range': [0.5, 4], 'betap_range': [1, 2],
    'blur_kernel_size2': 21,
    'kernel_list2': ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
                     'plateau_iso', 'plateau_aniso'],
    'kernel_prob2': [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    'sinc_prob2': 0.1, 'blur_sigma2': [0.2, 1.5],
    'betag_range2': [0.5, 4], 'betap_range2': [1, 2],
    'final_sinc_prob': 0.8,
    'use_hflip': True, 'use_rot': False,
}
param1 = dict(param)
param1.update({
    'blur_sigma': [0.2, 1.5], 'betag_range': [0.5, 2.0], 'betap_range': [1, 1.5],
    'blur_kernel_size2': 11, 'blur_sigma2': [0.2, 1.0],
    'betag_range2': [0.5, 2.0], 'betap_range2': [1, 1.5],
})

# degradation-pipeline presets (reference model/model.py:339-392)
dopt = {
    'scale': 4, 'resize_prob': [0.2, 0.7, 0.1], 'resize_range': [0.15, 1.5],
    'gaussian_noise_prob': 0.5, 'noise_range': [1, 30],
    'poisson_scale_range': [0.05, 3], 'gray_noise_prob': 0.4,
    'jpeg_range': [30, 95],
    'second_blur_prob': 0.8, 'resize_prob2': [0.3, 0.4, 0.3],
    'resize_range2': [0.3, 1.2], 'gaussian_noise_prob2': 0.5,
    'noise_range2': [1, 25], 'poisson_scale_range2': [0.05, 2.5],
    'gray_noise_prob2': 0.4, 'jpeg_range2': [30, 95],
    'gt_size': 256, 'queue_size': 180,
}
dopt1 = {
    'scale': 4, 'resize_prob': [0.2, 0.7, 0.1], 'resize_range': [0.3, 1.5],
    'gaussian_noise_prob': 0.5, 'noise_range': [1, 15],
    'poisson_scale_range': [0.05, 2.0], 'gray_noise_prob': 0.4,
    'jpeg_range': [60, 95],
    'second_blur_prob': 0.5, 'resize_prob2': [0.3, 0.4, 0.3],
    'resize_range2': [0.6, 1.2], 'gaussian_noise_prob2': 0.5,
    'noise_range2': [1, 12], 'poisson_scale_range2': [0.05, 1.0],
    'gray_noise_prob2': 0.4, 'jpeg_range2': [60, 100],
    'gt_size': 256, 'queue_size': 180,
}
dopt1gt = dict(dopt1)
dopt1gt.update({'gt_size': 256 + 128, 'queue_size': 181})

DOPTS = {'dopt': dopt, 'dopt1': dopt1, 'dopt1gt': dopt1gt}
PARAMS = {'param': param, 'param1': param1}

_KERNEL_RANGE = [2 * v + 1 for v in range(3, 11)]  # 7..21


class RealESRGANDataset(ImagenetJPGDataset):
    """gt + per-item random blur/sinc kernels (RGB HWC [0,1] here)."""

    def __init__(self, dataroot, datatype='img', split='train', data_len=-1,
                 **kwargs):
        super().__init__(dataroot, datatype, split, data_len, **kwargs)
        self.opt = PARAMS[kwargs.get('param', 'param')]
        self.pulse = np.zeros((21, 21), np.float32)
        self.pulse[10, 10] = 1.

    def _random_kernel(self, sinc_prob, kernel_list, kernel_prob, blur_sigma,
                       betag_range, betap_range):
        kernel_size = random.choice(_KERNEL_RANGE)
        if np.random.uniform() < sinc_prob:
            omega_c = np.random.uniform(
                np.pi / 3 if kernel_size < 13 else np.pi / 5, np.pi)
            kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=False)
        else:
            kernel = random_mixed_kernels(
                kernel_list, kernel_prob, kernel_size, blur_sigma, blur_sigma,
                [-math.pi, math.pi], betag_range, betap_range, noise_range=None)
        pad = (21 - kernel_size) // 2
        return np.pad(kernel, ((pad, pad), (pad, pad))).astype(np.float32)

    def __getitem__(self, index):
        img_gt = Util.to_float(Util.load_img(
            __import__('os').path.join(self.root, self.hr_path[index])))

        if self.split == 'train':
            if self.opt['use_hflip'] and random.random() < 0.5:
                img_gt = np.ascontiguousarray(img_gt[:, ::-1])
            if self.opt['use_rot'] and random.random() < 0.5:
                img_gt = np.ascontiguousarray(img_gt.transpose(1, 0, 2))
        elif self.split != 'val':
            return {'lq': img_gt, 'gt': img_gt, 'Index': index}

        # crop or reflect-pad to crop_size (reference :743-758)
        cps = self.crop_size
        h, w = img_gt.shape[:2]
        if h < cps or w < cps:
            img_gt = np.pad(img_gt, ((0, max(0, cps - h)), (0, max(0, cps - w)),
                                     (0, 0)), mode='reflect')
        h, w = img_gt.shape[:2]
        if h > cps or w > cps:
            top = random.randint(0, h - cps)
            left = random.randint(0, w - cps)
            img_gt = img_gt[top:top + cps, left:left + cps]

        o = self.opt
        kernel1 = self._random_kernel(o['sinc_prob'], o['kernel_list'],
                                      o['kernel_prob'], o['blur_sigma'],
                                      o['betag_range'], o['betap_range'])
        kernel2 = self._random_kernel(o['sinc_prob2'], o['kernel_list2'],
                                      o['kernel_prob2'], o['blur_sigma2'],
                                      o['betag_range2'], o['betap_range2'])
        if np.random.uniform() < o['final_sinc_prob']:
            ks = random.choice(_KERNEL_RANGE)
            sinc = circular_lowpass_kernel(
                np.random.uniform(np.pi / 3, np.pi), ks,
                pad_to=21).astype(np.float32)
        else:
            sinc = self.pulse

        return {'gt': img_gt, 'kernel1': kernel1, 'kernel2': kernel2,
                'sinc_kernel': sinc, 'Index': index}


def paired_random_crop_np(img_gts, img_lqs, gt_patch_size, scale):
    """Random aligned crop (reference model/model.py:291-336), NHWC numpy/jax."""
    import jax.numpy as jnp
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    if single_gt:
        img_gts = [img_gts]
    if single_lq:
        img_lqs = [img_lqs]
    h_lq, w_lq = img_lqs[0].shape[1:3]
    lq_ps = gt_patch_size // scale
    top = random.randint(0, h_lq - lq_ps)
    left = random.randint(0, w_lq - lq_ps)
    img_lqs = [v[:, top:top + lq_ps, left:left + lq_ps] for v in img_lqs]
    tg, lg = top * scale, left * scale
    img_gts = [v[:, tg:tg + gt_patch_size, lg:lg + gt_patch_size]
               for v in img_gts]
    if single_gt:
        img_gts = img_gts[0]
    if single_lq:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


class TrainerRealSR(Trainer):
    """DDPM_realsr equivalent: on-device two-stage degradation feed."""

    def __init__(self, opt, **kwargs):
        super().__init__(opt, **kwargs)
        self.dopt = DOPTS[opt.get('dopt', 'dopt')]
        self.queue_size = opt.get('queue_size') or self.dopt['queue_size']
        self.queue_lr = None
        self.queue_gt = None
        self.queue_ptr = 0
        self.is_train = opt['phase'] == 'train'
        self.gt_usm_for_hr = opt.get('gt_usm', True)
        if self.gt_usm_for_hr is None:
            self.gt_usm_for_hr = True

    def _dequeue_and_enqueue(self, lq, gt):
        """Training-pair pool (reference model.py:405-444), host-managed."""
        import jax.numpy as jnp
        b = lq.shape[0]
        if self.queue_lr is None:
            assert self.queue_size % b == 0, (self.queue_size, b)
            self.queue_lr = jnp.zeros((self.queue_size,) + lq.shape[1:],
                                      lq.dtype)
            self.queue_gt = jnp.zeros((self.queue_size,) + gt.shape[1:],
                                      gt.dtype)
            self.queue_ptr = 0
        if self.queue_ptr == self.queue_size:
            idx = np.random.permutation(self.queue_size)
            self.queue_lr = self.queue_lr[idx]
            self.queue_gt = self.queue_gt[idx]
            lq_out = self.queue_lr[:b]
            gt_out = self.queue_gt[:b]
            self.queue_lr = self.queue_lr.at[:b].set(lq)
            self.queue_gt = self.queue_gt.at[:b].set(gt)
            return lq_out, gt_out
        n = min(b, self.queue_size - self.queue_ptr)
        self.queue_lr = self.queue_lr.at[self.queue_ptr:self.queue_ptr + n].set(lq[:n])
        self.queue_gt = self.queue_gt.at[self.queue_ptr:self.queue_ptr + n].set(gt[:n])
        self.queue_ptr += n
        return lq, gt

    def feed_data(self, data):
        import jax
        import jax.numpy as jnp
        d = self.dopt
        if not self.is_train:
            lq = jnp.asarray(data['lq'], jnp.float32)
            gt = jnp.asarray(data.get('gt', data['lq']), jnp.float32)
            gt_usm = usm_sharp(gt, radius=15)
            hr = gt_usm if self.gt_usm_for_hr else gt
            self.data = {'SR': np.asarray(lq * 2. - 1.),
                         'HR': np.asarray(hr * 2. - 1.)}
            return

        # host-local degradation of this process's data shard: per-process key
        self.local_key, key = jax.random.split(self.local_key)
        keys = jax.random.split(key, 8)
        gt = jnp.asarray(data['gt'], jnp.float32)           # (b,h,w,3) [0,1]
        kernel1 = jnp.asarray(data['kernel1'], jnp.float32)  # (b,21,21)
        kernel2 = jnp.asarray(data['kernel2'], jnp.float32)
        sinc_kernel = jnp.asarray(data['sinc_kernel'], jnp.float32)
        ori_h, ori_w = gt.shape[1:3]

        gt_usm = usm_sharp(gt, radius=15)

        # ---------------- first degradation (model.py:461-489) --------------
        out = filter2D(gt_usm, kernel1)
        updown = random.choices(['up', 'down', 'keep'], d['resize_prob'])[0]
        if updown == 'up':
            scale = np.random.uniform(1, d['resize_range'][1])
        elif updown == 'down':
            scale = np.random.uniform(d['resize_range'][0], 1)
        else:
            scale = 1
        mode = random.choice(['area', 'bilinear', 'bicubic'])
        out = interpolate(out, scale_factor=scale, mode=mode)
        if np.random.uniform() < d['gaussian_noise_prob']:
            out = random_add_gaussian_noise_pt(
                keys[0], out, sigma_range=d['noise_range'], clip=True,
                rounds=False, gray_prob=d['gray_noise_prob'])
        else:
            out = random_add_poisson_noise_pt(
                keys[1], out, scale_range=d['poisson_scale_range'],
                gray_prob=d['gray_noise_prob'], clip=True, rounds=False)
        jpeg_q = jax.random.uniform(keys[2], (out.shape[0],), jnp.float32,
                                    d['jpeg_range'][0], d['jpeg_range'][1])
        out = diff_jpeg(jnp.clip(out, 0, 1), jpeg_q, differentiable=False)

        # ---------------- second degradation (model.py:491-543) -------------
        if np.random.uniform() < d['second_blur_prob']:
            out = filter2D(out, kernel2)
        updown = random.choices(['up', 'down', 'keep'], d['resize_prob2'])[0]
        if updown == 'up':
            scale = np.random.uniform(1, d['resize_range2'][1])
        elif updown == 'down':
            scale = np.random.uniform(d['resize_range2'][0], 1)
        else:
            scale = 1
        mode = random.choice(['area', 'bilinear', 'bicubic'])
        out = interpolate(out, size=(int(ori_h / d['scale'] * scale),
                                     int(ori_w / d['scale'] * scale)),
                          mode=mode)
        if np.random.uniform() < d['gaussian_noise_prob2']:
            out = random_add_gaussian_noise_pt(
                keys[3], out, sigma_range=d['noise_range2'], clip=True,
                rounds=False, gray_prob=d['gray_noise_prob2'])
        else:
            out = random_add_poisson_noise_pt(
                keys[4], out, scale_range=d['poisson_scale_range2'],
                gray_prob=d['gray_noise_prob2'], clip=True, rounds=False)

        final_size = (ori_h // d['scale'], ori_w // d['scale'])
        jpeg_q2 = jax.random.uniform(keys[5], (out.shape[0],), jnp.float32,
                                     d['jpeg_range2'][0], d['jpeg_range2'][1])
        if np.random.uniform() < 0.5:
            mode = random.choice(['area', 'bilinear', 'bicubic'])
            out = interpolate(out, size=final_size, mode=mode)
            out = filter2D(out, sinc_kernel)
            out = diff_jpeg(jnp.clip(out, 0, 1), jpeg_q2, differentiable=False)
        else:
            out = diff_jpeg(jnp.clip(out, 0, 1), jpeg_q2, differentiable=False)
            mode = random.choice(['area', 'bilinear', 'bicubic'])
            out = interpolate(out, size=final_size, mode=mode)
            out = filter2D(out, sinc_kernel)

        lq = jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.

        # random crop + pair queue + final x4 upscale (model.py:546-575)
        gt_size = d['gt_size']
        (gt, gt_usm), lq = paired_random_crop_np([gt, gt_usm], lq, gt_size,
                                                 d['scale'])
        lq, gt = self._dequeue_and_enqueue(lq, gt)
        gt_usm = usm_sharp(gt, radius=15)  # re-sharpen dequeued gt
        lq = interpolate(lq, scale_factor=d['scale'], mode='bilinear')

        hr = gt_usm if self.gt_usm_for_hr else gt
        self.data = {'SR': np.asarray(lq * 2. - 1.),
                     'HR': np.asarray(hr * 2. - 1.)}
