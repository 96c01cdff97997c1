"""Adaptive Kernel Guidance Module (AKGM) — `ResnetBlockDY3h`.

Parity target: /root/reference/model/ucdir.py:103-140. Semantics:
  * the noise-level embedding produces `nset` mixing weights (attw);
  * the guide image, bilinearly resized to the block's resolution, produces
    `nset` spatial attention maps; att_sp = conv2(guide) * attw;
  * a grouped conv produces `nset` candidate feature banks which are mixed
    per-pixel: out = sum_k hset[..., k] * att_sp[..., k].

The grouped-conv weights are declared explicitly (not through nn.Conv) so the
fused Pallas path and the XLA reference path in `ucdir_tpu.ops.akgm` share the
same parameter tensors. `dropout` is accepted but unused — the reference block
has no dropout layer either (ucdir.py:104-120).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ucdir_tpu.models.layers import swish, simple_gate, PallasConv3, PallasConv1
from ucdir_tpu.ops.akgm import akgm_block_tail


class ResnetBlockDY3h(nn.Module):
    dim: int
    dim_out: int
    nl_emb_dim: Optional[int] = None
    dropout: float = 0.0
    use_affine_level: bool = False
    norm_groups: int = 1
    nset: int = 8
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, time_emb, guide, deterministic: bool = True,
                 g_maps=None, in_stats=None, emit_stats: bool = False):
        """in_stats: optional chained GN(1) totals of x from its producer;
        emit_stats: return (out, out_totals_or_None) instead of out — the
        stats chain threads through the whole UNet (dy3h.naiveforward) so
        the folded norms never re-read their inputs from HBM."""
        b, H, W, c = x.shape
        nset = self.nset

        # mixing weights from the noise-level embedding
        attw = nn.Dense(nset, name='noise_func_0')(time_emb)
        attw = swish(attw)
        attw = nn.Dense(nset, name='noise_func_2')(attw)  # (b, nset)

        # norm_groups == 1 (the shipped configs): GroupNorm(1) is a per-batch
        # scalar-stats affine, so the normalize FOLDS into the following
        # fused conv/mix kernels (x*a + t with a,t per (batch, channel)) —
        # the normalized tensor never materializes in HBM. Other group counts
        # keep the standard module.
        from ucdir_tpu.ops.gn_scope import gn_tile_window, tile_gn
        win = gn_tile_window(H, W) if self.norm_groups == 1 else None
        if self.norm_groups == 1 and win is None:
            a1, t1 = _norm1_affine(x, *_NormParams(c, name='norm1')(),
                                   use_pallas=self.use_pallas,
                                   totals=in_stats)
            h = PallasConv3(self.dim_out, act='swish',
                            use_pallas=self.use_pallas,
                            name='conv1')(x, norm_scale=a1, norm_shift=t1,
                                          emit_stats=emit_stats)
            h, h_stats = h if emit_stats else (h, None)
            a2, t2 = _norm1_affine(
                h, *_NormParams(self.dim_out, name='norm2')(),
                use_pallas=self.use_pallas, totals=h_stats)
        elif self.norm_groups == 1:
            # UCDIR_TPU_GN_SCOPE=tile (ops/gn_scope.py): per-window stats are
            # spatially varying, so the per-(B,C) folded-affine kernels don't
            # apply — normalize explicitly (same params as the folded path),
            # then run the convs unfolded. Chained canvas totals (in_stats)
            # are the wrong scope here and are ignored.
            s1, b1 = _NormParams(c, name='norm1')()
            h = tile_gn(x, s1, b1, win)
            h = PallasConv3(self.dim_out, act='swish',
                            use_pallas=self.use_pallas, name='conv1')(h)
            s2, b2 = _NormParams(self.dim_out, name='norm2')()
            h = tile_gn(h, s2, b2, win)
            a2 = t2 = None
        else:
            h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                             name='norm1')(x)
            h = PallasConv3(self.dim_out, act='swish',
                            use_pallas=self.use_pallas, name='conv1')(h)
            h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                             name='norm2')(h)
            a2 = t2 = None

        # spatial attention maps from the (resized) guide image. The guide is
        # constant across a whole reverse process, so samplers precompute
        # these maps ONCE per image/tile (`g_maps`, dy3h.compute_guide_maps)
        # instead of re-running the convs all T steps — only the per-step
        # noise-level mix `attw` varies. (The torch reference recomputes them
        # every step, ucdir.py:122-131.)
        if g_maps is None:
            if guide.shape[1] != H or guide.shape[2] != W:
                guide = jax.image.resize(
                    guide, (guide.shape[0], H, W, guide.shape[-1]),
                    method='bilinear', antialias=False)
            g = nn.Conv(nset * 2, (1, 1), name='conv2_0')(guide)
            g = simple_gate(g)
            g = nn.Conv(nset, (3, 3), padding=1, name='conv2_2')(g)
        else:
            g = g_maps
        # attw multiplies in-kernel on the fused path (per-step elementwise
        # pass over a 16x lane-padded (b,H,W,8) buffer otherwise)

        # grouped candidate banks + per-pixel mix + swish + residual, as one
        # fused op (Pallas on TPU; XLA composition elsewhere)
        spdy_kernel = self.param(
            'spdyconv_kernel', nn.initializers.lecun_normal(),
            (3, 3, self.dim_out // nset, self.dim_out * nset))
        spdy_bias = self.param('spdyconv_bias', nn.initializers.zeros,
                               (self.dim_out * nset,))
        if self.dim != self.dim_out:
            res = PallasConv1(self.dim_out, use_pallas=self.use_pallas,
                              name='res_conv')(x)
        else:
            res = x
        return akgm_block_tail(h, g, spdy_kernel, spdy_bias, res, nset,
                               use_pallas=self.use_pallas,
                               norm_scale=a2, norm_shift=t2, attw=attw,
                               emit_stats=emit_stats)


class _NormParams(nn.Module):
    """GroupNorm's parameter tree (scale/bias) without its computation — the
    normalize itself is folded into the following fused kernel."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return scale, bias


def _norm1_affine(x, scale, bias, eps: float = 1e-5,
                  use_pallas: bool = False, totals=None):
    """GroupNorm(num_groups=1) as a per-(batch, channel) affine: returns
    (a, t) with norm(x) == x*a + t (stats over H, W, C in f32). The stats
    run as ONE HBM pass (ops/stats_pallas.py) — XLA emits mean/var as two
    full-tensor loop fusions at the big eval scales.
    totals: optional chained ((B,) sum, (B,) sumsq) emitted by x's PRODUCER
    kernel (ops.chain_stats_mode) — skips the stats pass entirely."""
    n = x.shape[1] * x.shape[2] * x.shape[3]
    if totals is not None:
        s_tot, q_tot = totals
    else:
        from ucdir_tpu.ops.stats_pallas import gn1_stats
        s, q = gn1_stats(x, use_pallas=use_pallas)        # (B, C) f32 each
        s_tot, q_tot = jnp.sum(s, axis=1), jnp.sum(q, axis=1)
    mean = s_tot / n
    var = q_tot / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)                       # (B,)
    a = scale[None, :].astype(jnp.float32) * rstd[:, None]
    t = (bias[None, :].astype(jnp.float32)
         - mean[:, None] * rstd[:, None] * scale[None, :].astype(jnp.float32))
    return a.astype(x.dtype), t.astype(x.dtype)
