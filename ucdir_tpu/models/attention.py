"""Full spatial self-attention (reference: /root/reference/model/ucdir.py:155-182).

Applied only where the feature resolution is in `attn_res` (16x16 with the
shipped config) and in the first mid block — a few hundred tokens, so a plain
XLA einsum softmax is already MXU-bound; no flash kernel needed at this size.
Note the reference scales by 1/sqrt(full channel count), not head_dim — kept.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


class SelfAttention(nn.Module):
    in_channel: int
    n_head: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n_head = self.n_head
        head_dim = c // n_head

        norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                            name='norm')(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, name='qkv')(norm)
        # torch views channels as (n_head, 3*head_dim) then chunks into q,k,v
        qkv = qkv.reshape(b, h, w, n_head, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        attn = jnp.einsum('bhwnd,byxnd->bnhwyx', q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(c)
        attn = attn.reshape(b, n_head, h, w, h * w)
        attn = nn.softmax(attn, axis=-1)
        attn = attn.reshape(b, n_head, h, w, h, w).astype(v.dtype)

        out = jnp.einsum('bnhwyx,byxnd->bhwnd', attn, v)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), name='out')(out)
        return out + x
