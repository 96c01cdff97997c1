"""Trainer — the DDPM model-wrapper equivalent.

Parity target: /root/reference/model/model.py (class DDPM :35-268, DDPM_bnoise
:270-280; DDPM_realsr lives in ucdir_tpu.realsr). Public surface mirrors the
reference: create_model(opt) -> trainer with feed_data/optimize_parameters/
test/save_network/load_network/set_new_noise_schedule/get_current_visuals.

TPU-native: one jitted XLA program per train step (fwd+bwd+update+EMA, data
sharded over the mesh's 'data' axis); sampling is a jitted lax.scan cached per
input shape. No DDP wrappers, no host-side EMA loop.
"""
from __future__ import annotations

import logging
import os
from collections import OrderedDict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.parallel import make_mesh
from ucdir_tpu.train import (make_optimizer, create_train_state,
                             make_train_step, make_eval_step)
from ucdir_tpu.utils import checkpoint as ckpt_util

logger = logging.getLogger('base')


class Trainer:
    """DDPM-equivalent trainer/evaluator."""

    def __init__(self, opt, use_pallas: bool = False, seed: int = 0):
        self.opt = opt
        # remat is free in forward-only use and necessary for training memory
        self.module = define_G(opt, use_pallas=use_pallas,
                               remat=(opt['phase'] == 'train'))
        self.schedules = {
            phase: make_schedule(opt['model']['beta_schedule'][phase])
            for phase in ('train', 'val')
            if opt['model']['beta_schedule'].get(phase)}
        self.schedule_phase = None
        # RNG contract (SPMD): the jitted global-batch train step must see an
        # IDENTICAL key on every process (it samples gamma/noise for the
        # global batch inside jit; divergent keys => divergent "replicated"
        # params). Per-step keys are derived via fold_in(key, step) in
        # optimize_parameters. Host-local work (val sampling, feed_data noise)
        # uses local_key, which deliberately differs per process so each
        # process samples its own val shard independently.
        self.key = jax.random.PRNGKey(seed)
        self.local_key = jax.random.fold_in(
            jax.random.PRNGKey(seed + 1), jax.process_index())
        self.iter = 0
        self.begin_step = 0
        self.begin_epoch = 0
        self.log_dict = OrderedDict()
        self.data: Dict[str, np.ndarray] = {}
        self._eval_fns = {}  # (shape, continous) -> jitted sampler
        # data-parallel mesh: val spans all local chips (tile chunks / image
        # batches shard over them); train is sized so the batch divides it
        import math as _math
        n_dev = len(jax.devices())
        if opt['phase'] == 'train':
            bs = int(((opt.get('datasets') or {}).get('train') or {})
                     .get('batch_size') or n_dev)
            n_data = _math.gcd(max(bs, 1), n_dev)
        else:
            n_data = n_dev
        self.mesh = make_mesh(n_data) if n_data > 1 else None

        self.set_new_noise_schedule(
            opt['model']['beta_schedule']['train'], schedule_phase='train')

        params = self._init_params()
        if opt['phase'] == 'train':
            mask = None
            ft = (opt.get('model') or {}).get('finetune_norm')
            if ft:
                # reference model.py:62-77: freeze all, zero + optimize only
                # params whose name matches (default substring 'transformer';
                # a string config value selects a different substring)
                from ucdir_tpu.train.optim import (finetune_mask,
                                                   zero_finetune_params)
                mask = finetune_mask(params,
                                     ft if isinstance(ft, str) else 'transformer')
                params = zero_finetune_params(params, mask)
                n_opt = sum(bool(m) for m in jax.tree_util.tree_leaves(mask))
                logger.info('finetune_norm: optimizing %d param tensors '
                            '(zero-initialized), rest frozen', n_opt)
            tx = make_optimizer(opt['train']['optimizer'],
                                clip_norm=opt.get('clip_norm'), mask=mask)
            self.state = create_train_state(params, tx,
                                            opt['train']['ema_scheduler'])
            train_dtype = {'bf16': jnp.bfloat16, 'bfloat16': jnp.bfloat16}.get(
                opt.get('compute_dtype') or '')
            self._train_step = make_train_step(
                self.module, self.schedules['train'], mesh=self.mesh,
                compute_dtype=train_dtype)
            self.eval_params = None  # live params used for in-train val
        else:
            self.state = None
            self.eval_params = params
        self.load_network()
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        logger.info('Network G created, with parameters: {:,d}'.format(n))

    # --- construction helpers ------------------------------------------------
    def _init_params(self):
        size = int(self.opt['model']['diffusion'].get('image_size', 128)) or 128
        size = max(32, min(size, 64))  # init shapes don't matter, keep compile cheap
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        x_in = {'HR': x, 'SR': x}
        k = self.key
        variables = jax.jit(self.module.init)(
            {'params': k, 'dropout': k}, x_in,
            jnp.ones((1, 1), jnp.float32) * 0.5, x)
        return variables['params']

    # --- reference API -------------------------------------------------------
    def feed_data(self, data: Dict[str, Any]):
        self.data = {k: np.asarray(v) if not np.isscalar(v) else v
                     for k, v in data.items()}

    def optimize_parameters(self):
        batch = {'HR': jnp.asarray(self.data['HR'], jnp.float32),
                 'SR': jnp.asarray(self.data['SR'], jnp.float32)}
        if jax.process_count() > 1 and self.mesh is not None:
            # multi-host: assemble the global batch from per-process shards
            # (each process loads its EnlargedSampler shard)
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P('data'))
            batch = {k: jax.make_array_from_process_local_data(sharding, v)
                     for k, v in batch.items()}
        # deterministic per-step key, identical on every process (multi-host
        # SPMD correctness; also makes resume-from-step RNG-reproducible)
        k = jax.random.fold_in(self.key, self.iter)
        self.state, metrics = self._train_step(self.state, batch, k)
        self.log_dict['l_pix'] = float(metrics['l_pix'])
        self.iter += 1

    def set_new_noise_schedule(self, schedule_opt, schedule_phase='train',
                               force: bool = False):
        if self.schedule_phase != schedule_phase or force:
            self.schedule_phase = schedule_phase
            self.schedules[schedule_phase] = make_schedule(schedule_opt)
            self._eval_fns.clear()

    def _get_eval_fn(self, shape, continous: bool):
        # one jitted sampler per (mode, schedule); jit re-specializes per
        # input shape internally
        key = (continous, self.schedule_phase)
        if key not in self._eval_fns:
            sched = self.schedules[self.schedule_phase]
            sampler = self.opt.get('sampler') or 'ddpm'
            steps = int(self.opt.get('sampling_timesteps') or
                        (20 if sampler == 'dpmpp' else 5))
            dtype = {'bf16': jnp.bfloat16, 'bfloat16': jnp.bfloat16}.get(
                self.opt.get('compute_dtype') or '')
            self._eval_fns[key] = make_eval_step(
                self.module, sched, pad=64, continous=continous,
                sampler=sampler, sampling_timesteps=steps,
                compute_dtype=dtype,
                bucket=int(self.opt.get('bucket') or 0),
                mesh=self.mesh, tile=self.opt.get('tile'),
                seg_steps=int(self.opt.get('scan_segment') or 0) or None)
        return self._eval_fns[key]

    def _current_eval_params(self):
        if self.eval_params is not None:
            if self.mesh is not None:
                # restored checkpoints may be committed to a different device
                # set (e.g. the train-time mesh); replicate over the eval mesh
                # once and cache (device_put is a no-op when already placed)
                from jax.sharding import NamedSharding, PartitionSpec as P
                self.eval_params = jax.device_put(
                    self.eval_params, NamedSharding(self.mesh, P()))
            return self.eval_params
        return self.state.params  # in-train validation uses the live weights

    def test(self, continous: bool = False):
        """Sample restoration for self.data['SR'] (reference model.py:124-138)."""
        sr = jnp.asarray(self.data['SR'], jnp.float32)
        fn = self._get_eval_fn(sr.shape, continous)
        self.local_key, k = jax.random.split(self.local_key)
        out = fn({'params': self._current_eval_params()}, sr, k)
        if continous:
            final, initx, snaps = out
            # reference returns [x_in, snapshots...] stacked on the batch axis
            # for bs=1 (diffusion.py:199-211); keep (T, h, w, c) + final.
            self.SR = np.asarray(snaps)[:, 0] if sr.shape[0] == 1 else np.asarray(snaps)
            self.SR_final = np.asarray(final)
        else:
            final, initx = out
            self.SR = np.asarray(final)
            self.SR_final = self.SR
        self.pre_initx = np.asarray(initx) if initx is not None else None

    def sample(self, batch_size: int = 1, continous: bool = False):
        """Unconditional generation (reference DDPM.sample, model.py:140-147)."""
        from ucdir_tpu.diffusion.sampler import unconditional_sample
        size = int(self.opt['model']['diffusion'].get('image_size', 128))
        ch = int(self.opt['model']['diffusion'].get('channels', 3))
        sched = self.schedules[self.schedule_phase]
        self.local_key, k = jax.random.split(self.local_key)
        out = jax.jit(lambda v, k: unconditional_sample(
            self.module, v, sched, (batch_size, size, size, ch), k,
            continous=continous))({'params': self._current_eval_params()}, k)
        self.SR = np.asarray(out[1] if continous else out)
        return self.SR

    def get_current_log(self):
        return self.log_dict

    def get_current_visuals(self, need_LR: bool = True, sample: bool = False):
        out = OrderedDict()
        if sample:
            out['SAM'] = self.SR
            return out
        out['SR'] = self.SR
        out['INF'] = np.asarray(self.data['SR'])
        out['HR'] = np.asarray(self.data['HR'])
        if need_LR and 'LR' in self.data:
            out['LR'] = np.asarray(self.data['LR'])
        else:
            out['LR'] = out['INF']
        return out

    # --- checkpointing -------------------------------------------------------
    def save_network(self, epoch, iter_step):
        ckpt_dir = self.opt['path']['checkpoint']
        tag = 'I{}_E{}'.format(iter_step, epoch)
        path = ckpt_util.save_state(ckpt_dir, tag, self.state)
        logger.info('Saved model in [{:s}] ...'.format(path))

    def load_network(self):
        load_path = self.opt['path'].get('resume_state')
        if not load_path:
            return
        logger.info('Loading pretrained model for G [{:s}] ...'.format(load_path))
        if self.opt['phase'] == 'train':
            if os.path.isdir(load_path):
                self.state = ckpt_util.restore_state(load_path, self.state)
                self.iter = int(self.state.step)
                self.begin_step = self.iter
                logger.info('*-*- selfiter %s' % self.iter)
            else:
                # torch warm start: params only
                params = ckpt_util.load_params_for_eval(load_path, use_ema=False)
                ema = ckpt_util.load_params_for_eval(load_path, use_ema=True)
                self.state = self.state.replace(params=params, ema_params=ema)
        else:
            use_ema = bool((self.opt['train'] or {}).get(
                'ema_scheduler', {}).get('use', True))
            if use_ema:
                logger.info('** loading EMA model for evaluation.')
            self.eval_params = ckpt_util.load_params_for_eval(
                load_path, use_ema=use_ema)


class TrainerBNoise(Trainer):
    """DDPM_bnoise: adds sigma=50/255 Gaussian noise x2 to the input
    (reference model.py:270-280)."""

    def feed_data(self, data):
        super().feed_data(data)
        sr = np.asarray(self.data['SR'], np.float32)
        self.local_key, k = jax.random.split(self.local_key)
        noise = np.asarray(jax.random.normal(k, sr.shape, jnp.float32))
        self.data['SR'] = sr + noise * 2 * (50. / 255.)


MODELS = {'DDPM': Trainer, 'DDPM_bnoise': TrainerBNoise}


def create_model(opt, **kwargs):
    """model factory (reference model/__init__.py:5-10)."""
    name = (opt.get('model') or {}).get('name', 'DDPM') or 'DDPM'
    if name == 'DDPM_realsr':
        from ucdir_tpu.realsr import TrainerRealSR
        return TrainerRealSR(opt, **kwargs)
    return MODELS[name](opt, **kwargs)
