"""DY3h — the guided diffusion denoiser UNet.

Parity target: /root/reference/model/ucdir.py:204-307. SR3 UNet skeleton:
input conv3, `len(channel_mults)` scales x `res_blocks` AKGM blocks down with
attention where the running resolution is in `attn_res`, 2 mid blocks (attn on
the first), ups with skip-concat (`res_blocks+1` per scale), GN/Swish/Conv3
head. The noise-level MLP embeds the *continuous* noise level.

TPU-native notes:
  * NHWC; skip connections concat on the channel (minor) axis;
  * `__call__` reproduces the reference pad-to-/32 + crop wrapper
    (ucdir.py:295-307) with static shapes under jit; `naiveforward` is exposed
    for the tiled high-res sampler, which tiles *outside* this module
    (ucdir_tpu/parallel/tiled.py) instead of the reference's sequential
    python patch loop.
"""
from __future__ import annotations

from typing import Sequence, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ucdir_tpu.models.layers import (PositionalEncoding, ResnetBlock, Upsample,
                                     Downsample, PallasConv3, swish,
                                     simple_gate, pad_to_multiple, crop_pad)
from ucdir_tpu.models.akgm import ResnetBlockDY3h
from ucdir_tpu.models.attention import SelfAttention

_RES_BLOCKS = {
    'ResnetBlock': ResnetBlock,
    'ResnetBlockDY3h': ResnetBlockDY3h,
}


class ResnetBlocWithAttn(nn.Module):
    """res block (type via `resname`) + optional attention (ucdir.py:185-198)."""
    dim: int
    dim_out: int
    nl_emb_dim: Optional[int] = None
    norm_groups: int = 1
    dropout: float = 0.0
    with_attn: bool = False
    resname: str = 'ResnetBlockDY3h'
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, time_emb, guide=None, deterministic: bool = True,
                 g_maps=None, in_stats=None, emit_stats: bool = False):
        cls = _RES_BLOCKS[self.resname]
        xs = None
        if self.resname == 'ResnetBlockDY3h':
            block = cls(self.dim, self.dim_out, nl_emb_dim=self.nl_emb_dim,
                        norm_groups=self.norm_groups, dropout=self.dropout,
                        use_pallas=self.use_pallas, name='res_block')
            x = block(x, time_emb, guide, deterministic=deterministic,
                      g_maps=g_maps, in_stats=in_stats,
                      emit_stats=emit_stats)
            if emit_stats:
                x, xs = x
        else:
            block = cls(self.dim, self.dim_out, nl_emb_dim=self.nl_emb_dim,
                        norm_groups=self.norm_groups, dropout=self.dropout,
                        name='res_block')
            x = block(x, time_emb, deterministic=deterministic)
        if self.with_attn:
            x = SelfAttention(self.dim_out, norm_groups=self.norm_groups,
                              name='attn')(x)
            xs = None  # attention output: no producer-emitted stats
        return (x, xs) if emit_stats else x


class DY3h(nn.Module):
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 1
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_noise_level_emb: bool = True
    image_size: int = 128
    resname: str = 'ResnetBlockDY3h'
    use_pallas: bool = False
    # gradient checkpointing per block: activations of a block are recomputed
    # in the backward pass (the reference trains batch 4/GPU on 40GB+ cards;
    # one 16GB TPU chip needs remat to reach comparable per-chip batch sizes)
    remat: bool = False

    def _plan(self):
        """Static layer plan mirroring the reference constructor loops."""
        num_mults = len(self.channel_mults)
        now_res = self.image_size
        pre_channel = self.inner_channel
        feat_channels = [pre_channel]
        downs = []  # (kind, dim, dim_out, with_attn)
        for ind in range(num_mults):
            is_last = (ind == num_mults - 1)
            use_attn = (now_res in self.attn_res)
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                downs.append(('block', pre_channel, channel_mult, use_attn))
                feat_channels.append(channel_mult)
                pre_channel = channel_mult
            if not is_last:
                downs.append(('down', pre_channel, pre_channel, False))
                feat_channels.append(pre_channel)
                now_res //= 2
        mid_channel = pre_channel
        ups = []
        for ind in reversed(range(num_mults)):
            is_last = (ind < 1)
            use_attn = (now_res in self.attn_res)
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                ups.append(('block', pre_channel + feat_channels.pop(),
                            channel_mult, use_attn))
                pre_channel = channel_mult
            if not is_last:
                ups.append(('up', pre_channel, pre_channel, False))
                now_res *= 2
        return downs, mid_channel, ups, pre_channel

    @nn.compact
    def naiveforward(self, x, noise_level, guide, deterministic: bool = True,
                     guide_maps=None):
        """guide_maps: optional {block_name: (b, Hs, Ws, nset)} precomputed
        guide-attention maps (see `compute_guide_maps`) — the guide branch is
        reverse-process-invariant, so samplers hoist it out of the step scan.
        """
        from ucdir_tpu.ops.gn_scope import gn_canvas
        with gn_canvas(x.shape[1], x.shape[2]):
            return self._naiveforward_body(x, noise_level, guide,
                                           deterministic, guide_maps)

    def _naiveforward_body(self, x, noise_level, guide,
                           deterministic: bool = True, guide_maps=None):
        gm = guide_maps or {}
        nlc = self.inner_channel
        if self.with_noise_level_emb:
            t = PositionalEncoding(nlc, name='noise_level_mlp_pe')(noise_level)
            t = nn.Dense(nlc * 4, name='noise_level_mlp_1')(t)
            t = swish(t)
            t = nn.Dense(nlc, name='noise_level_mlp_3')(t)
        else:
            t = None

        downs, mid_channel, ups, prec = self._plan()
        block_cls = ResnetBlocWithAttn
        if self.remat:
            # deterministic (arg 4 incl. self) and emit_stats (arg 7) are
            # static python bools. With pallas kernels on, save their outputs
            # instead of re-running Mosaic kernels in the backward pass
            # (measured: full remat made the pallas train step SLOWER than
            # XLA, r2) — the policy is a no-op when nothing is
            # checkpoint_name-tagged.
            policy = (jax.checkpoint_policies.save_only_these_names(
                'pallas_out') if self.use_pallas else None)
            block_cls = nn.remat(ResnetBlocWithAttn, static_argnums=(4, 7),
                                 policy=policy)

        # chained GroupNorm(1) stats (ops.chain_stats_mode): every producer
        # (conv/tail/down/up kernel) emits its output's (B,) sum/sumsq, the
        # consumer block's folded norm uses them instead of re-reading the
        # tensor; totals ADD across skip concats and are invariant under
        # depth-to-space. Attention voids the chain (XLA output).
        import os as _os
        _mode = _os.environ.get('UCDIR_TPU_CHAIN_STATS', 'auto')
        chain = _mode == 'xla' or (_mode not in ('0',) and self.use_pallas)

        def _cat_stats(a, b):
            if a is None or b is None:
                return None
            return a[0] + b[0], a[1] + b[1]

        x = PallasConv3(self.inner_channel, use_pallas=self.use_pallas,
                        name='downs_0')(x, emit_stats=chain)
        xs = None
        if chain:
            x, xs = x
        feats = [(x, xs)]
        for i, (kind, dim, dim_out, with_attn) in enumerate(downs):
            name = f'downs_{i + 1}'
            if kind == 'block':
                x = block_cls(
                    dim, dim_out, nl_emb_dim=nlc, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=with_attn,
                    resname=self.resname, use_pallas=self.use_pallas,
                    name=name)(x, t, guide, deterministic, gm.get(name),
                               xs, chain)
            else:
                x = Downsample(dim_out, use_pallas=self.use_pallas,
                               name=name)(x, emit_stats=chain)
            if chain:
                x, xs = x
            feats.append((x, xs))

        x = block_cls(mid_channel, mid_channel, nl_emb_dim=nlc,
                      norm_groups=self.norm_groups, dropout=self.dropout,
                      with_attn=True, resname=self.resname,
                      use_pallas=self.use_pallas,
                      name='mid_0')(x, t, guide, deterministic,
                                    gm.get('mid_0'), xs, chain)
        if chain:
            x, xs = x
        x = block_cls(mid_channel, mid_channel, nl_emb_dim=nlc,
                      norm_groups=self.norm_groups, dropout=self.dropout,
                      with_attn=False, resname=self.resname,
                      use_pallas=self.use_pallas,
                      name='mid_1')(x, t, guide, deterministic,
                                    gm.get('mid_1'), xs, chain)
        if chain:
            x, xs = x

        for i, (kind, dim, dim_out, with_attn) in enumerate(ups):
            name = f'ups_{i}'
            if kind == 'block':
                skip, ss = feats.pop()
                x = block_cls(
                    dim, dim_out, nl_emb_dim=nlc, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=with_attn,
                    resname=self.resname, use_pallas=self.use_pallas,
                    name=name)(jnp.concatenate([x, skip], axis=-1), t,
                               guide, deterministic, gm.get(name),
                               _cat_stats(xs, ss), chain)
            else:
                x = Upsample(dim_out, use_pallas=self.use_pallas,
                             name=name)(x, emit_stats=chain)
            if chain:
                x, xs = x

        # final head: GN -> Swish -> Dropout -> Conv3 (ucdir.py:266-268).
        # With dropout==0 (the shipped configs) the whole head folds into one
        # pre-activation conv kernel: one-pass stats + staged swish(x*a+t)
        # (ops/conv_pallas.head_conv3x3) — no normalized/activated tensor in
        # HBM. Dropout in between forces the unfolded path.
        if self.dropout > 0:
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             name='final_conv_norm')(x)
            x = swish(x)
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
            return PallasConv3(self.out_channel, use_pallas=self.use_pallas,
                               name='final_conv_conv')(x)
        from ucdir_tpu.models.akgm import _norm1_affine, _NormParams
        from ucdir_tpu.ops.conv_pallas import head_conv3x3
        from ucdir_tpu.ops.gn_scope import gn_tile_window, tile_gn
        from ucdir_tpu.models.layers import _Conv3Params
        win = gn_tile_window(x.shape[1], x.shape[2])
        if win is not None:
            # UCDIR_TPU_GN_SCOPE=tile: normalize per window explicitly, then
            # feed the head conv an identity affine (same params either way).
            sc, bi = _NormParams(x.shape[-1], name='final_conv_norm')()
            x = tile_gn(x, sc, bi, win)
            a = jnp.ones((x.shape[0], x.shape[-1]), x.dtype)
            t_ = jnp.zeros((x.shape[0], x.shape[-1]), x.dtype)
        else:
            a, t_ = _norm1_affine(x, *_NormParams(x.shape[-1],
                                                  name='final_conv_norm')(),
                                  use_pallas=self.use_pallas, totals=xs)
        k, b = _Conv3Params(x.shape[-1], self.out_channel,
                            name='final_conv_conv')()
        return head_conv3x3(x, k, b, a, t_, use_pallas=self.use_pallas)

    def __call__(self, x, noise_level, guide, deterministic: bool = True,
                 guide_maps=None):
        """Pad-to-/32 wrapper (ucdir.py:295-307). The >1024^2 tiled path lives
        in ucdir_tpu.parallel.tiled (sharded over chips, not a python loop).
        guide_maps (if given) must be computed on the /32-PADDED guide."""
        x, pads = pad_to_multiple(x, 32)
        guide, _ = pad_to_multiple(guide, 32)
        y = self.naiveforward(x, noise_level, guide,
                              deterministic=deterministic,
                              guide_maps=guide_maps)
        return crop_pad(y, pads)

    def guide_block_scales(self):
        """Ordered (block_name, downscale_factor) for every AKGM block —
        the per-block guide resolution is input_resolution // factor."""
        downs, _, ups, _ = self._plan()
        out = []
        s = 1
        for i, (kind, *_rest) in enumerate(downs):
            if kind == 'block':
                out.append((f'downs_{i + 1}', s))
            else:
                s *= 2
        out += [('mid_0', s), ('mid_1', s)]
        for i, (kind, *_rest) in enumerate(ups):
            if kind == 'block':
                out.append((f'ups_{i}', s))
            else:
                s //= 2
        return out


def compute_guide_maps(module: 'DY3h', params, guide):
    """Precompute every AKGM block's guide-attention maps for a fixed guide.

    The reverse process evaluates the denoiser T times with the SAME guide;
    the guide branch (resize -> conv1x1 -> SimpleGate -> conv3x3,
    ucdir.py:122-131) is step-invariant, and XLA does not hoist it out of the
    sampling scan (measured: ~6.4 ms/block at 1024^2 — ~14%% of a tile step).
    Samplers call this once and pass the result as `guide_maps`.

    params: the DY3h param tree (e.g. variables['params']['denoise_fn']);
    guide: (b, H, W, 3) at the network input resolution (/32-padded).
    Returns {block_name: (b, H//s, W//s, nset)} ({} for non-AKGM resnames).
    """
    if module.resname != 'ResnetBlockDY3h':
        return {}
    b, H, W, _ = guide.shape
    maps = {}
    per_scale = {}
    for name, s in module.guide_block_scales():
        if s not in per_scale:
            per_scale[s] = guide if s == 1 else jax.image.resize(
                guide, (b, H // s, W // s, guide.shape[-1]),
                method='bilinear', antialias=False)
        g_r = per_scale[s]
        p = params[name]['res_block']
        y = jax.lax.conv_general_dilated(
            g_r, p['conv2_0']['kernel'], (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + p['conv2_0']['bias']
        y = simple_gate(y)
        y = jax.lax.conv_general_dilated(
            y, p['conv2_2']['kernel'], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + p['conv2_2']['bias']
        maps[name] = y
    return maps
