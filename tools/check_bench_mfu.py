"""Lower-only check of bench.py's half-res cost-analysis block on axon.

Replicates the MFU FLOP-count path exactly (same shapes, same env) without
running the timed benchmark, so the compile-helper OOM fix (half-res + pixel
scaling) can be validated in ~2 min instead of a full bench run.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G


def main():
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=True)
    key = jax.random.PRNGKey(0)
    H, W = 1424 + 128, 2128 + 128
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(module.init)(
        {'params': key, 'dropout': key}, {'HR': x0, 'SR': x0},
        jnp.ones((1, 1), jnp.float32) * 0.5, jnp.zeros_like(x0))
    vars16 = jtu.tree_map(lambda p: p.astype(jnp.bfloat16), variables)

    th = -(-H // 32) * 32
    tw = -(-W // 32) * 32
    nl = jnp.zeros((1, 1), jnp.bfloat16)
    tb = jnp.zeros((1, th, tw, 6), jnp.bfloat16)
    tg = jnp.zeros((1, th, tw, 3), jnp.bfloat16)
    tile_flops = jax.jit(
        lambda v, x, n, g: module.denoise_fn.apply(
            {'params': v['params']['denoise_fn']}, x, n, g,
            method='naiveforward')).lower(
                vars16, tb, nl, tg).compile().cost_analysis()['flops']
    print('tile_flops (full-res exact): %.1f GFLOP' % (tile_flops / 1e9,))

    ch = -(-(th // 2) // 32) * 32
    cw = -(-(tw // 2) // 32) * 32
    px_scale = (th * tw) / float(ch * cw)
    hb = jnp.zeros((1, ch, cw, 6), jnp.bfloat16)
    hg = jnp.zeros((1, ch, cw, 3), jnp.bfloat16)
    half_dense = jax.jit(
        lambda v, x, n, g: module.denoise_fn.apply(
            {'params': v['params']['denoise_fn']}, x, n, g,
            method='naiveforward')).lower(
                vars16, hb, nl, hg).compile().cost_analysis()['flops']
    os.environ['UCDIR_TPU_AKGM_FORM'] = 'reference'
    try:
        module_ref = define_G(opt, use_pallas=False)
        half_ref = jax.jit(
            lambda v, x, n, g: module_ref.denoise_fn.apply(
                {'params': v['params']['denoise_fn']}, x, n, g,
                method='naiveforward')).lower(
                    vars16, hb, nl, hg).compile().cost_analysis()['flops']
    finally:
        del os.environ['UCDIR_TPU_AKGM_FORM']
    tile_useful = tile_flops - px_scale * (half_dense - half_ref)
    print('half_dense %.1f / half_ref %.1f GFLOP (scale x%.3f)'
          % (half_dense / 1e9, half_ref / 1e9, px_scale))
    print('useful_flops (full - scaled waste delta): %.1f GFLOP'
          % (tile_useful / 1e9,))
    print('OK')


if __name__ == '__main__':
    main()
