"""Full spatial self-attention (reference: /root/reference/model/ucdir.py:155-182).

Applied where the feature resolution is in `attn_res` (16x16 with the shipped
config at train crops) and in the first mid block. Note the reference scales
by 1/sqrt(full channel count), not head_dim — kept.

At high-resolution inference the attended maps get big (a 1024 tile puts
attention at 128x128 = 16384 tokens -> a 1 GB score matrix per head); above
`_STREAM_TOKENS` tokens the computation switches to a streaming
(flash-attention-style) scan over query chunks with an online softmax —
identical math, O(N * chunk) memory instead of O(N^2).

Above `_WINDOW_TOKENS` tokens (= one 1024px patch at /8, the largest map any
single reference attention call ever sees) the softmax goes WINDOWED: the map
splits into near-128-token-per-axis windows attended independently. This is
the reference's own high-res semantics — its >1024^2 patch loop
(model/ucdir.py:295-300, utils/util.py:108-146) never lets attention see
beyond one 1024px patch — applied to the seamless whole-image eval path,
where global softmax at e.g. 55k tokens would cost quadratically (measured:
~26% of an untiled SID step, 2x the total attention FLOPs of the tiled path).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

_STREAM_TOKENS = 4096
_CHUNK = 1024
_WINDOW_TOKENS = 16384
_WINDOW_TARGET = 144     # tokens per axis per window (reference patch: 128)


def _window_tokens() -> int:
    """Windowed-attention threshold — trace-time env override
    UCDIR_TPU_ATTN_WINDOW_TOKENS (quality/perf A/Bs: tools/quality_ab.py
    raises it to force GLOBAL attention on untiled >16384-token maps)."""
    import os
    return int(os.environ.get('UCDIR_TPU_ATTN_WINDOW_TOKENS',
                              _WINDOW_TOKENS))


def _streaming_attention(q, k, v, scale):
    """softmax(q k^T * scale) v via online-softmax over query chunks.

    q, k, v: (b, n_head, N, d). Returns (b, n_head, N, d), f32 accumulation.
    """
    b, nh, N, d = q.shape
    n_pad = (-N) % _CHUNK
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    n_chunks = qp.shape[2] // _CHUNK
    qc = qp.reshape(b, nh, n_chunks, _CHUNK, d).transpose(2, 0, 1, 3, 4)

    def one_chunk(qi):
        # matmuls stay in the input dtype (bf16 MXU rate) with f32
        # accumulation; softmax statistics in f32. fp32 multiplies here were
        # ~4x off bf16 MXU peak and dominated high-res tiles (5 blocks x
        # 550 GFLOP at 16384 tokens per 1024^2 tile).
        s = jnp.einsum('bnqd,bnkd->bnqk', qi, k,
                       preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        num = jnp.einsum('bnqk,bnkd->bnqd', p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return num / jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.map(one_chunk, qc)                     # (n_chunks,b,nh,C,d)
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, nh, n_chunks * _CHUNK, d)
    return out[:, :, :N].astype(q.dtype)


def _dense_attention(q, k, v, scale):
    """Plain softmax(q k^T * scale) v for (b, n_head, N, d) operands."""
    s = jnp.einsum('bnqd,bnkd->bnqk', q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum('bnqk,bnkd->bnqd', p, v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


def _window_split(n: int, target: int) -> int:
    """Smallest window count dividing n with windows of <= target tokens."""
    for kk in range(1, n + 1):
        if n % kk == 0 and n // kk <= target:
            return kk
    return n


def _windowed_attention(q, k, v, scale, wy: int, wx: int):
    """Independent softmax attention per (h/wy, w/wx) spatial window.

    q, k, v: (b, h, w, n_head, d). Each window's softmax sees only its own
    tokens — the scope a reference 1024px patch gives attention at high res.
    Returns (b, h, w, n_head, d).
    """
    b, h, w, nh, d = q.shape
    hw_, ww_ = h // wy, w // wx

    def to_win(a):
        a = a.reshape(b, wy, hw_, wx, ww_, nh, d)
        a = a.transpose(0, 1, 3, 5, 2, 4, 6)     # (b, wy, wx, nh, hw_, ww_, d)
        return a.reshape(b * wy * wx, nh, hw_ * ww_, d)

    qs, ks, vs = to_win(q), to_win(k), to_win(v)
    if hw_ * ww_ > _STREAM_TOKENS:
        o = _streaming_attention(qs, ks, vs, scale)
    else:
        o = _dense_attention(qs, ks, vs, scale)
    o = o.reshape(b, wy, wx, nh, hw_, ww_, d)
    return o.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, nh, d)


class SelfAttention(nn.Module):
    in_channel: int
    n_head: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        import os
        b, h, w, c = x.shape
        n_head = self.n_head
        head_dim = c // n_head

        # Opt-in SHIFTED windows (UCDIR_TPU_ATTN_SHIFT=1): roughly half the
        # attention layers (deterministic per-layer parity from the module
        # path) see a half-window-offset partition, so window-scope seams of
        # one layer fall inside the windows of the next (Swin-style, eval
        # scope only — training crops never window). Exact at the x level:
        # GroupNorm(1) stats are roll-invariant and the 1x1 qkv/out convs
        # are roll-equivariant, so rolling the input and unrolling the
        # attention output before the residual changes ONLY the partition.
        shift = (0, 0)
        if (os.environ.get('UCDIR_TPU_ATTN_SHIFT') == '1'
                and h * w > _window_tokens()):
            import zlib
            path = '/'.join(getattr(self.scope, 'path', ()) or ())
            if zlib.crc32(path.encode()) & 1:
                wy = _window_split(h, _WINDOW_TARGET)
                wx = _window_split(w, _WINDOW_TARGET)
                shift = ((h // wy) // 2, (w // wx) // 2)
        x_res = x
        if shift != (0, 0):
            x = jnp.roll(x, (-shift[0], -shift[1]), axis=(1, 2))

        from ucdir_tpu.ops.gn_scope import gn_tile_window, tile_gn
        win_gn = gn_tile_window(h, w) if self.norm_groups == 1 else None
        if win_gn is not None:
            # UCDIR_TPU_GN_SCOPE=tile: per-window GN(1) stats (same params
            # as nn.GroupNorm — scale/bias under 'norm').
            from ucdir_tpu.models.akgm import _NormParams
            norm = tile_gn(x, *_NormParams(c, name='norm')(), win_gn)
        else:
            norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                name='norm')(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, name='qkv')(norm)
        # torch views channels as (n_head, 3*head_dim) then chunks into q,k,v
        qkv = qkv.reshape(b, h, w, n_head, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        win_tokens = _window_tokens()
        if h * w > win_tokens:
            import os
            # default ON since r4: -0.8% on the integrated SID step (686.3
            # vs 691.7 ms, tools/r4_ab3.sh) and quality-neutral on the
            # crop-128 toy (24.51 vs 24.52 dB, QAB leg E); '0' disables
            if (os.environ.get('UCDIR_TPU_ATTN_BANDS', '1') != '0'
                    and n_head == 1 and w <= win_tokens):
                # ROW-BAND windows (wx=1): with n_head==1 the window split
                # becomes a PURE RESHAPE — no q/k/v/o transposes (the 2-D
                # window split relayouts 4 full tensors per call). wy is
                # chosen so bands hold <= _WINDOW_TOKENS tokens: same
                # per-window token count == same attention FLOPs, different
                # scope shape (wide bands vs near-square). Opt-in until the
                # integrated A/B and a quality check land.
                wy = next(kk for kk in range(1, h + 1)
                          if h % kk == 0 and (h // kk) * w <= _WINDOW_TOKENS)
                o = _windowed_attention(q, k, v, 1.0 / math.sqrt(c), wy, 1)
            else:
                wy = _window_split(h, _WINDOW_TARGET)
                wx = _window_split(w, _WINDOW_TARGET)
                o = _windowed_attention(q, k, v, 1.0 / math.sqrt(c), wy, wx)
            out = o.reshape(b, h, w, c)
        elif h * w > _STREAM_TOKENS:
            qs = q.reshape(b, h * w, n_head, head_dim).transpose(0, 2, 1, 3)
            ks = k.reshape(b, h * w, n_head, head_dim).transpose(0, 2, 1, 3)
            vs = v.reshape(b, h * w, n_head, head_dim).transpose(0, 2, 1, 3)
            o = _streaming_attention(qs, ks, vs, 1.0 / math.sqrt(c))
            out = o.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        else:
            attn = jnp.einsum('bhwnd,byxnd->bnhwyx', q, k,
                              preferred_element_type=jnp.float32) / math.sqrt(c)
            attn = attn.reshape(b, n_head, h, w, h * w)
            attn = nn.softmax(attn, axis=-1)
            attn = attn.reshape(b, n_head, h, w, h, w).astype(v.dtype)
            out = jnp.einsum('bnhwyx,byxnd->bhwnd', attn, v)
            out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), name='out')(out)
        if shift != (0, 0):
            out = jnp.roll(out, shift, axis=(1, 2))
        return out + x_res
