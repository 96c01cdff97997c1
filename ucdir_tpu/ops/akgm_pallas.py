"""Fused AKGM mix — Pallas TPU kernel.

Computes grouped3x3conv(h) reshaped (C, G) and mixed per-pixel with att in one
pass, so the (b, H, W, C*G) candidate tensor never leaves VMEM. The XLA
reference path (ucdir_tpu/ops/akgm.py) materializes it in HBM — a G-fold
activation round-trip that dominates the op's runtime at the large scales
(the conv itself is only ~9C^2 FLOPs/pixel).

Layout: grid over (batch, row). Each program loads a 3-row halo slab of the
zero-padded input, builds the 9-tap im2col per group (G static loop), runs the
(W, 9C/G) @ (9C/G, C) matmul on the MXU, adds bias, multiplies the per-pixel
attention maps and reduces over candidates — all in VMEM.

Gradients: custom_vjp with the backward pass taken from the XLA reference
implementation (identical math; training-time memory equals the reference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
# Element block-dims give elementwise (stride-1) start offsets — needed for
# the overlapping 3-row halo slabs; not yet re-exported under pl.*
from jax._src.pallas.core import Element as _Element

from ucdir_tpu.ops.akgm import akgm_mix_reference


def _regroup_kernel(kernel, C: int, G: int):
    """HWIO grouped kernel (3,3,C/G,C*G) -> (G, 9*C/G, C) with rows ordered
    (tap_y, tap_x, in_channel) to match the in-kernel im2col build."""
    k = kernel.reshape(3, 3, C // G, G, C)          # out channel o = g*C + oc
    k = k.transpose(3, 0, 1, 2, 4)                  # (G, 3, 3, C/G, C)
    return k.reshape(G, 9 * (C // G), C)


def _akgm_kernel(h_ref, att_ref, kg_ref, bias_ref, out_ref, *, C, G, W):
    cg = C // G
    att = att_ref[0, 0]                             # (W, G)
    for g in range(G):
        cols = []
        for ty in range(3):
            for tx in range(3):
                cols.append(h_ref[0, ty, tx:tx + W, g * cg:(g + 1) * cg])
        x = jnp.concatenate(cols, axis=-1)          # (W, 9*C/G)
        y = jnp.dot(x, kg_ref[g], preferred_element_type=jnp.float32)
        y = y + bias_ref[0, g * C:(g + 1) * C]
        y = y.reshape(W, cg, G)                     # candidate j minor
        mixed = jnp.sum(y * att[:, None, :], axis=-1)   # (W, C/G)
        # static sliced store per group (functional .at[] lowers to scatter,
        # which Mosaic does not support)
        out_ref[0, 0, :, g * cg:(g + 1) * cg] = mixed.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def akgm_mix_pallas(h, att_sp, kernel, bias, nset: int):
    return _akgm_forward(h, att_sp, kernel, bias, nset)


def _akgm_forward(h, att_sp, kernel, bias, nset: int):
    B, H, W, C = h.shape
    G = nset
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kg = _regroup_kernel(kernel, C, G)
    bias2 = bias.reshape(1, C * G)

    grid = (B, H)
    return pl.pallas_call(
        functools.partial(_akgm_kernel, C=C, G=G, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=grid,
        in_specs=[
            # overlapping 3-row halo slab: Element dims take elementwise start
            # offsets (Mosaic requires all dims Element when any is)
            pl.BlockSpec((_Element(1), _Element(3), _Element(W + 2),
                          _Element(C)),
                         lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, G), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 9 * (C // G), C), lambda b, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C * G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W, C), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * C * C,
            bytes_accessed=4 * B * H * W * (2 * C + G),
            transcendentals=0),
    )(hp, att_sp, kg, bias2)


def _fwd(h, att_sp, kernel, bias, nset):
    out = _akgm_forward(h, att_sp, kernel, bias, nset)
    return out, (h, att_sp, kernel, bias)


def _bwd(nset, residuals, g):
    h, att_sp, kernel, bias = residuals
    _, vjp = jax.vjp(
        lambda h, a, k, b: akgm_mix_reference(h, a, k, b, nset),
        h, att_sp, kernel, bias)
    return vjp(g)


akgm_mix_pallas.defvjp(_fwd, _bwd)
