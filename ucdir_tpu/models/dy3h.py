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

import jax.numpy as jnp
from flax import linen as nn

from ucdir_tpu.models.layers import (PositionalEncoding, ResnetBlock, Upsample,
                                     Downsample, swish, pad_to_multiple, crop_pad)
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
    def __call__(self, x, time_emb, guide=None, deterministic: bool = True):
        cls = _RES_BLOCKS[self.resname]
        kwargs = {}
        if self.resname == 'ResnetBlockDY3h':
            block = cls(self.dim, self.dim_out, nl_emb_dim=self.nl_emb_dim,
                        norm_groups=self.norm_groups, dropout=self.dropout,
                        use_pallas=self.use_pallas, name='res_block')
            x = block(x, time_emb, guide, deterministic=deterministic)
        else:
            block = cls(self.dim, self.dim_out, nl_emb_dim=self.nl_emb_dim,
                        norm_groups=self.norm_groups, dropout=self.dropout,
                        name='res_block')
            x = block(x, time_emb, deterministic=deterministic)
        if self.with_attn:
            x = SelfAttention(self.dim_out, norm_groups=self.norm_groups,
                              name='attn')(x)
        return x


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
    def naiveforward(self, x, noise_level, guide, deterministic: bool = True):
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
            # deterministic (arg 4 incl. self) is a static python bool
            block_cls = nn.remat(ResnetBlocWithAttn, static_argnums=(4,))

        x = nn.Conv(self.inner_channel, (3, 3), padding=1, name='downs_0')(x)
        feats = [x]
        for i, (kind, dim, dim_out, with_attn) in enumerate(downs):
            name = f'downs_{i + 1}'
            if kind == 'block':
                x = block_cls(
                    dim, dim_out, nl_emb_dim=nlc, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=with_attn,
                    resname=self.resname, use_pallas=self.use_pallas,
                    name=name)(x, t, guide, deterministic)
            else:
                x = Downsample(dim_out, name=name)(x)
            feats.append(x)

        x = block_cls(mid_channel, mid_channel, nl_emb_dim=nlc,
                      norm_groups=self.norm_groups, dropout=self.dropout,
                      with_attn=True, resname=self.resname,
                      use_pallas=self.use_pallas,
                      name='mid_0')(x, t, guide, deterministic)
        x = block_cls(mid_channel, mid_channel, nl_emb_dim=nlc,
                      norm_groups=self.norm_groups, dropout=self.dropout,
                      with_attn=False, resname=self.resname,
                      use_pallas=self.use_pallas,
                      name='mid_1')(x, t, guide, deterministic)

        for i, (kind, dim, dim_out, with_attn) in enumerate(ups):
            name = f'ups_{i}'
            if kind == 'block':
                x = block_cls(
                    dim, dim_out, nl_emb_dim=nlc, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=with_attn,
                    resname=self.resname, use_pallas=self.use_pallas,
                    name=name)(jnp.concatenate([x, feats.pop()], axis=-1), t,
                               guide, deterministic)
            else:
                x = Upsample(dim_out, name=name)(x)

        # final head: GN -> Swish -> Dropout -> Conv3 (ucdir.py:266-268)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name='final_conv_norm')(x)
        x = swish(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return nn.Conv(self.out_channel, (3, 3), padding=1, name='final_conv_conv')(x)

    def __call__(self, x, noise_level, guide, deterministic: bool = True):
        """Pad-to-/32 wrapper (ucdir.py:295-307). The >1024^2 tiled path lives
        in ucdir_tpu.parallel.tiled (sharded over chips, not a python loop)."""
        x, pads = pad_to_multiple(x, 32)
        guide, _ = pad_to_multiple(guide, 32)
        y = self.naiveforward(x, noise_level, guide, deterministic=deterministic)
        return crop_pad(y, pads)
