"""Train/val driver — CLI-compatible with the reference `sr.py`:

    python sr.py -p train -c ucdir_tpu/configs/sid.yaml
    python sr.py -p val   -c ucdir_tpu/configs/sid.yaml --checkpoint <prefix>

Parity target: /root/reference/sr.py:320-587 (arg surface, loop cadences,
logging format, per-image result naming). Differences by design:
  * distributed init is `jax.distributed` (multi-host) + a device mesh instead
    of one-process-per-GPU NCCL (utils/dist_utils.py in the reference);
  * the checkpoint triple becomes one orbax directory;
  * `--checkpoint` also accepts released PyTorch weights (auto-converted).
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def val_patch(opt, val_loader, val_set, diffusion, Metrics, logger,
              skip: int = 1024, padding: int = 64):
    """Outer-loop tiled sampling: each tile runs its own full reverse process
    (reference alt driver `val_patch`, sr.py:17-57 — contrast with the
    intra-step tiling in ucdir_tpu.parallel.tiled)."""
    result_path = opt['path']['results']
    os.makedirs(result_path, exist_ok=True)
    avg_psnr, idx = 0.0, 0
    shift = skip - 2 * padding
    for val_data in val_loader:
        idx += 1
        sr = np.asarray(val_data['SR'])
        b, h, w, c = sr.shape
        pd = min(h, w)
        pd = skip - pd + padding if pd < skip else padding
        sr_pad = np.pad(sr, ((0, 0), (pd, pd), (pd, pd), (0, 0)), 'reflect')
        H, W = sr_pad.shape[1:3]
        out = np.zeros_like(sr_pad[..., :3])
        for i in range(0, H, shift):
            hs, he = i, i + skip
            if he > H:
                hs, he = H - skip, H
            for j in range(0, W, shift):
                ws, we = j, j + skip
                if we > W:
                    ws, we = W - skip, W
                diffusion.feed_data({'SR': sr_pad[:, hs:he, ws:we],
                                     'HR': sr_pad[:, hs:he, ws:we]})
                diffusion.test(continous=False)
                out[:, hs + padding:he - padding, ws + padding:we - padding] = \
                    diffusion.SR[:, padding:-padding, padding:-padding]
        out = out[:, pd:-pd, pd:-pd]
        sr_img = Metrics.tensor2img(out)
        hr_img = Metrics.tensor2img(np.asarray(val_data['HR']))
        fname = ''.join(os.path.basename(
            val_set.sr_path[int(val_data['Index'][0])]).split('.')[:-1])
        Metrics.save_jpg(sr_img, '{}/{}_{}_sr.png'.format(
            result_path, fname, opt['name']))
        Metrics.save_jpg(hr_img, '{}/{}_{}_hr.png'.format(
            result_path, fname, opt['name']))
        avg_psnr += Metrics.calculate_psnr(sr_img, hr_img)
    logger.info('# val_patch # PSNR: {:.4e}'.format(avg_psnr / max(idx, 1)))


def search_params(opt, val_loader, diffusion, Metrics, logger,
                  n_timesteps=(25, 50, 100), linear_ends=(0.2, 0.4, 0.6)):
    """Grid search over the val sampler hyperparameters with per-cell image
    dumps (reference alt driver `search_params`, sr.py:60-126)."""
    result_path = opt['path']['results']
    os.makedirs(result_path, exist_ok=True)
    for nt in n_timesteps:
        for le in linear_ends:
            sched_opt = dict(opt['model']['beta_schedule']['val'])
            sched_opt['n_timestep'] = nt
            sched_opt['linear_end'] = le
            diffusion.set_new_noise_schedule(sched_opt, 'val', force=True)
            psnr, idx = 0.0, 0
            for val_data in val_loader:
                idx += 1
                diffusion.feed_data(val_data)
                diffusion.test(continous=False)
                visuals = diffusion.get_current_visuals()
                sr_img = Metrics.tensor2img(visuals['SR'])
                hr_img = Metrics.tensor2img(visuals['HR'])
                psnr += Metrics.calculate_psnr(sr_img, hr_img)
                Metrics.save_jpg(sr_img, '{}/s{}_e{}_{}_sr.png'.format(
                    result_path, nt, le, idx))
                if idx >= 3:
                    break
            logger.info('# search steps=%d linear_end=%.2f PSNR: %.4f'
                        % (nt, le, psnr / idx))


def _global_mean(world_size, *sums_and_count):
    """Cross-process mean: allgather per-process [sum..., count] and reduce.
    The reference logs only each rank's shard mean (sr.py:570-578 quirk);
    with >1 process we log the true global mean instead."""
    vec = np.asarray(sums_and_count, np.float64)
    if world_size > 1:
        from jax.experimental import multihost_utils
        vec = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
    count = max(vec[-1], 1.0)
    return tuple(v / count for v in vec[:-1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', type=str,
                        default='ucdir_tpu/configs/sid.yaml')
    parser.add_argument('-p', '--phase', type=str, choices=['train', 'val'],
                        default='train')
    parser.add_argument('-debug', '-d', action='store_true', dest='debug')
    parser.add_argument('-enable_wandb', action='store_true')
    parser.add_argument('-log_wandb_ckpt', action='store_true')
    parser.add_argument('-log_eval', action='store_true')
    parser.add_argument('--checkpoint', type=str, default=None)
    parser.add_argument('--sampler', type=str, default='ddpm',
                        choices=['ddpm', 'ddim', 'dpmpp', 'dpmpp_sde'])
    parser.add_argument('--sampling_timesteps', type=int, default=None,
                        help='steps for ddim/dpmpp (defaults: 5 / 20)')
    parser.add_argument('--compute_dtype', type=str, default=None,
                        choices=['bf16'], help='mixed-precision sampling')
    parser.add_argument('--use_pallas', action=argparse.BooleanOptionalAction,
                        default=None,
                        help='fused Pallas kernels where measured faster '
                             '(auto-disabled off-TPU and at shapes where the '
                             'XLA dispatch wins). Default: on for val '
                             '(measured 1.5x) AND train (0.599 vs 0.619 '
                             's/step @ B=8 256px with the hand-written '
                             'backward kernels, tools/train_bench.py r3). '
                             'NOTE: the fused backward gates on crop width '
                             '<= 1024 — train defaults OFF above that (the '
                             'XLA-recompute fallback is slower than no '
                             'pallas). --use_pallas/--no-use_pallas force.')
    parser.add_argument('--distributed', action='store_true',
                        help='multi-host: call jax.distributed.initialize()')
    parser.add_argument('--platform', type=str, default=None,
                        help='force a jax platform (e.g. cpu — the TPU '
                             'plugin ignores the JAX_PLATFORMS env var); '
                             'pair with XLA_FLAGS='
                             '--xla_force_host_platform_device_count=N '
                             'for a virtual N-chip CPU mesh')
    parser.add_argument('--scan_segment', type=int, default=0,
                        help='split the 50-step reverse process into device '
                             'executions of N steps each (bit-identical; '
                             'needed on tunneled TPUs where one >60s '
                             'execution trips the RPC deadline)')
    parser.add_argument('--val_batch', type=int, default=1,
                        help='val images per step; batches are sharded over '
                             'the local chip mesh (one image per chip) — the '
                             'multi-chip serving mode for <=1024^2 inputs. '
                             'Requires same-size val images.')
    parser.add_argument('--bucket', type=int, default=0,
                        help='pad val inputs to multiples of N (avoids '
                             'per-shape sampler recompiles on variable-size '
                             'datasets; 0 = exact shapes)')
    parser.add_argument('--val_patch', action='store_true',
                        help='outer-loop tiled sampling alt driver')
    parser.add_argument('--patch_skip', type=int, default=1024,
                        help='val_patch tile size (reference sr.py:30)')
    parser.add_argument('--patch_padding', type=int, default=64,
                        help='val_patch tile halo (reference sr.py:31)')
    parser.add_argument('--search_params', action='store_true',
                        help='val sampler hyperparameter grid search')
    parser.add_argument('--search_steps', type=str, default='25,50,100',
                        help='search_params n_timestep grid (comma list; '
                             'reference sr.py:67)')
    parser.add_argument('--search_ends', type=str, default='0.2,0.4,0.6',
                        help='search_params linear_end grid (comma list)')
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    # persistent compile cache: repeated CLI runs (and bench retries) reuse
    # compiled executables instead of paying the cold compile every time
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/root/.cache/jax_comp_cache'))
    if args.distributed:
        jax.distributed.initialize()

    from ucdir_tpu import config as Logger
    from ucdir_tpu import data as Data
    from ucdir_tpu import trainer as Model
    from ucdir_tpu import metrics as Metrics
    from ucdir_tpu.utils.logging import setup_logger

    rank = jax.process_index()
    world_size = jax.process_count()

    opt = Logger.parse(args.config, phase=args.phase, checkpoint=args.checkpoint,
                       debug=args.debug, enable_wandb=args.enable_wandb,
                       num_processes=world_size)
    opt['rank'], opt['world_size'] = rank, world_size
    opt['log_wandb_ckpt'] = args.log_wandb_ckpt
    opt['log_eval'] = args.log_eval
    opt['sampler'] = args.sampler
    opt['sampling_timesteps'] = args.sampling_timesteps
    opt['compute_dtype'] = args.compute_dtype
    opt['bucket'] = args.bucket
    opt['scan_segment'] = args.scan_segment

    setup_logger('base', opt['path']['log'], 'train', level=logging.INFO,
                 screen=True, process_index=rank)
    setup_logger('val', opt['path']['log'], 'val', level=logging.INFO,
                 process_index=rank)
    logger = logging.getLogger('base')
    logger.info(Logger.dict2str(opt))

    try:
        from tensorboardX import SummaryWriter
        tb_logger = SummaryWriter(log_dir=opt['path']['tb_logger'])
    except Exception:
        tb_logger = None

    wandb_logger = None
    val_step = 0
    if opt['enable_wandb']:
        try:
            import wandb
            from ucdir_tpu.utils.wandb_logger import WandbLogger
            wandb_logger = WandbLogger(opt)
            # reference sr.py:363-370: val metrics on their own step axis
            wandb.define_metric('validation/val_step')
            wandb.define_metric('epoch')
            wandb.define_metric('validation/*', step_metric='val_step')
        except Exception as e:
            logger.warning('wandb unavailable: %s', e)

    # datasets
    train_loader = val_loader = None
    val_set = None
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train' and args.phase != 'val':
            train_set = Data.create_dataset(dataset_opt, phase)
            train_loader = Data.create_dataloader(train_set, dataset_opt, phase,
                                                  rank=rank,
                                                  world_size=world_size)
        elif phase == 'val':
            val_set = Data.create_dataset(dataset_opt, phase)
            if args.phase == 'val' and args.val_batch > 1:
                dataset_opt = dict(dataset_opt)
                dataset_opt['val_batch'] = args.val_batch
            val_loader = Data.create_dataloader(val_set, dataset_opt, phase,
                                                rank=rank,
                                                world_size=world_size)
    logger.info('Initial Dataset Finished')

    use_pallas = args.use_pallas
    if use_pallas is None:
        # val: 1.5x (r2); train: 0.599 vs 0.619 s/step with the hand-written
        # custom_vjp backward kernels (tools/train_bench.py, r3 A/B) — both
        # phases default on, loss parity 0.96909+-4e-6 across modes.
        use_pallas = True
        if args.phase == 'train':
            # the fused backward kernels gate on W <= 1024 (akgm_pallas.
            # _use_pallas_bwd); beyond that the forward kernels would pair
            # with the slow XLA-recompute vjp (measured ~1.7 s/step vs 0.62
            # at 256px) — default OFF for larger train crops.
            crop = int((((opt.get('datasets') or {}).get('train') or {})
                        .get('data_args') or {}).get('crop_size') or 0)
            if crop > 1024:
                use_pallas = False
                logger.info('use_pallas default OFF for train crop %d > 1024 '
                            '(fused backward kernels gate on W <= 1024); '
                            'pass --use_pallas to force.', crop)
    diffusion = Model.create_model(opt, use_pallas=use_pallas)
    logger.info('Initial Model Finished')

    current_step = diffusion.begin_step
    current_epoch = diffusion.begin_epoch
    n_iter = opt['train']['n_iter']

    if opt['path']['resume_state']:
        logger.info('Resuming training from epoch: {}, iter: {}.'.format(
            current_epoch, current_step))

    diffusion.set_new_noise_schedule(
        opt['model']['beta_schedule'][opt['phase']], schedule_phase=opt['phase'])

    if opt['phase'] == 'train':
        while current_step < n_iter:
            current_epoch += 1
            train_loader.set_epoch(current_epoch)
            for train_data in train_loader:
                current_step += 1
                if current_step > n_iter:
                    break
                diffusion.feed_data(train_data)
                diffusion.optimize_parameters()

                if current_step % opt['train']['print_freq'] == 0:
                    logs = diffusion.get_current_log()
                    message = '<epoch:{:3d}, iter:{:8,d}> {:s}'.format(
                        current_epoch, current_step, opt['name'])
                    for k, v in logs.items():
                        message += '{:s}: {:.4e} '.format(k, v)
                        if tb_logger:
                            tb_logger.add_scalar(k, v, current_step)
                    logger.info(message)
                    if wandb_logger:
                        wandb_logger.log_metrics(logs)

                if (current_step % opt['train']['val_freq'] == 0
                        or current_step in [50]):
                    avg_psnr = 0.0
                    idx = 0
                    result_path = '{}/{}'.format(opt['path']['results'],
                                                 current_epoch)
                    os.makedirs(result_path, exist_ok=True)
                    diffusion.set_new_noise_schedule(
                        opt['model']['beta_schedule']['val'],
                        schedule_phase='val')
                    for val_data in val_loader:
                        idx += 1
                        diffusion.feed_data(val_data)
                        diffusion.test(continous=False)
                        visuals = diffusion.get_current_visuals()
                        sr_img = Metrics.tensor2img(visuals['SR'])
                        hr_img = Metrics.tensor2img(visuals['HR'])
                        lr_img = Metrics.tensor2img(visuals['LR'])
                        fake_img = Metrics.tensor2img(visuals['INF'])
                        base = '{}/{}_{}_{}'.format(
                            result_path, current_step + rank, idx, opt['name'])
                        Metrics.save_img(hr_img, base + '_hr.png')
                        Metrics.save_img(sr_img, base + '_sr.png')
                        Metrics.save_img(lr_img, base + '_lr.png')
                        Metrics.save_img(fake_img, base + '_inf.png')
                        if tb_logger:
                            tb_logger.add_image(
                                'Iter_{}'.format(current_step + rank),
                                np.transpose(np.concatenate(
                                    (fake_img, sr_img, hr_img), axis=1),
                                    [2, 0, 1]), idx)
                        avg_psnr += Metrics.calculate_psnr(sr_img, hr_img)
                        if wandb_logger:
                            wandb_logger.log_image(
                                f'validation_{idx}',
                                np.concatenate((fake_img, sr_img, hr_img),
                                               axis=1))
                    (avg_psnr,) = _global_mean(world_size, avg_psnr, idx)
                    diffusion.set_new_noise_schedule(
                        opt['model']['beta_schedule']['train'],
                        schedule_phase='train')
                    logger.info('# Validation # PSNR: {:.4e}'.format(avg_psnr))
                    logging.getLogger('val').info(
                        '<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}'.format(
                            current_epoch, current_step, avg_psnr))
                    if tb_logger:
                        tb_logger.add_scalar('psnr', avg_psnr, current_step)
                    if wandb_logger:
                        wandb_logger.log_metrics({
                            'validation/val_psnr': avg_psnr,
                            'validation/val_step': val_step})
                        val_step += 1

                if current_step % opt['train']['save_models'] == 0 and rank == 0:
                    diffusion.save_network(current_epoch, current_step)
                if (current_step % opt['train']['save_checkpoint_freq'] == 0
                        and rank == 0):
                    logger.info('Saving models and training states.')
                    diffusion.save_network('latest', '')
                    if wandb_logger and opt['log_wandb_ckpt']:
                        wandb_logger.log_checkpoint(current_epoch, current_step)
            if wandb_logger:
                wandb_logger.log_metrics({'epoch': current_epoch - 1})
        from ucdir_tpu.utils import checkpoint as ckpt_util
        ckpt_util.wait_for_saves()  # commit any in-flight async save
        logger.info('End of training.')
    else:
        logger.info('Begin Model Evaluation. len ' + str(len(val_loader)))
        if args.search_params:
            search_params(
                opt, val_loader, diffusion, Metrics, logger,
                n_timesteps=tuple(int(s) for s in
                                  args.search_steps.split(',')),
                linear_ends=tuple(float(s) for s in
                                  args.search_ends.split(',')))
            return
        if args.val_patch:
            val_patch(opt, val_loader, val_set, diffusion, Metrics, logger,
                      skip=args.patch_skip, padding=args.patch_padding)
            return
        avg_psnr = avg_ssim = 0.0
        idx = 0
        result_path = '{}'.format(opt['path']['results'])
        os.makedirs(result_path, exist_ok=True)
        for i, val_data in enumerate(val_loader):
            logger.info('val index %d' % i)
            diffusion.feed_data(val_data)
            diffusion.test(continous=True)
            visuals = diffusion.get_current_visuals()
            batch = visuals['HR'].shape[0]

            for j in range(batch):
                idx += 1
                fname = ''.join(os.path.basename(
                    val_set.sr_path[int(val_data['Index'][j])]).split('.')[:-1])
                hr_img = Metrics.tensor2img(visuals['HR'][j])
                lr_img = Metrics.tensor2img(visuals['LR'][j])
                if diffusion.pre_initx is not None:
                    fake_img = Metrics.tensor2img(diffusion.pre_initx[j])
                else:
                    fake_img = Metrics.tensor2img(visuals['INF'][j])

                # SR snapshots: (F, h, w, c) at batch 1 (reference layout),
                # (F, b, h, w, c) for the batched multi-chip serving mode
                sr_last = visuals['SR'][-1]
                sr_final = Metrics.tensor2img(
                    sr_last[j] if batch > 1 else sr_last)
                Metrics.save_jpg(sr_final, '{}/{}_{}_sr.png'.format(
                    result_path, fname, opt['name']))
                Metrics.save_jpg(hr_img, '{}/{}_{}_hr.png'.format(
                    result_path, fname, opt['name']))
                Metrics.save_jpg(lr_img, '{}/{}_{}_lr.png'.format(
                    result_path, fname, opt['name']))
                Metrics.save_jpg(fake_img, '{}/{}_{}_inf.png'.format(
                    result_path, fname, opt['name']))

                eval_psnr = Metrics.calculate_psnr(sr_final, hr_img)
                eval_ssim = Metrics.calculate_ssim(sr_final, hr_img)
                avg_psnr += eval_psnr
                avg_ssim += eval_ssim
                if wandb_logger and opt['log_eval']:
                    wandb_logger.log_eval_data(fake_img, sr_final, hr_img,
                                               eval_psnr, eval_ssim)

        avg_psnr, avg_ssim = _global_mean(world_size, avg_psnr, avg_ssim, idx)
        logger.info('# Validation # PSNR: {:.4e}'.format(avg_psnr))
        logger.info('# Validation # SSIM: {:.4e}'.format(avg_ssim))
        logging.getLogger('val').info(
            '<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}, ssim: {:.4e}'.format(
                current_epoch, current_step, avg_psnr, avg_ssim))
        if wandb_logger:
            if opt['log_eval']:
                wandb_logger.log_eval_table()
            wandb_logger.log_metrics({'PSNR': float(avg_psnr),
                                      'SSIM': float(avg_ssim)})


if __name__ == '__main__':
    main()
