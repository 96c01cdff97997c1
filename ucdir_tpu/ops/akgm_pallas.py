"""Fused AKGM mix — Pallas TPU kernel.

Computes grouped3x3conv(h) -> (C, G) candidate banks -> per-pixel attention
mix in one pass: the (b, H, W, C*G) candidate tensor lives only in VMEM. The
XLA paths (ucdir_tpu/ops/akgm.py) materialize it in HBM — a G-fold activation
round-trip that dominates the op at the large scales.

Mosaic-friendly formulation (no sub-128 lane slicing):
  * grid over (batch, row); each program reads a 3-row halo slab of the
    zero-padded input via Element block dims (elementwise start offsets);
  * the grouped conv runs as 9 dense (W, C) @ (C, C*G) tap matmuls against the
    zero-expanded kernel (the MXU eats the zero blocks; XLA's grouped-conv
    lowering is ~3-10x slower than this even with the FLOP waste);
  * attention maps are lane-tiled to (W, C*G) (candidate index j = lane % G);
  * the candidate reduction out[:, i] = sum_j acc[:, i*G+j]*att[:, j] is a
    0/1 selection matmul (W, C*G) @ (C*G, C) — no lane-dim reshapes.

Gradients: custom_vjp with the backward from the XLA reference (identical
math; training-time memory equals the reference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
# Element block dims give elementwise (stride-1) start offsets — needed for
# the overlapping 3-row halo slabs; not yet re-exported under pl.* (private
# path verified against the image's jax; ops/akgm.py falls back to the XLA
# densified form via HAS_ELEMENT when a jax upgrade moves it).
try:
    from jax._src.pallas.core import Element as _Element
    HAS_ELEMENT = True
except ImportError:  # pragma: no cover - exercised only on jax upgrades
    _Element = None
    HAS_ELEMENT = False

from ucdir_tpu.ops.akgm import akgm_mix_reference, _densify_kernel


def _selection_matrix(C: int, G: int, dtype) -> np.ndarray:
    """S[o, i] = 1 where o // G == i (candidate-sum selection)."""
    o = np.arange(C * G)
    s = np.zeros((C * G, C), np.float32)
    s[o, o // G] = 1.
    return s.astype(dtype)


def _akgm_kernel(h_ref, att_ref, kd_ref, bias_ref, sel_ref, out_ref, *,
                 C, G, W):
    att = att_ref[0, 0]                                     # (W, G)
    acc = jnp.zeros((W, C * G), jnp.float32)
    for t, (ty, tx) in enumerate([(y, x) for y in range(3) for x in range(3)]):
        xs = h_ref[0, ty, tx:tx + W, :]                     # (W, C)
        acc = acc + jnp.dot(xs, kd_ref[t],
                            preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0]
    att_exp = jnp.tile(att, (1, C)).astype(jnp.float32)     # lane o -> att[o%G]
    out = jnp.dot(acc * att_exp, sel_ref[...],
                  preferred_element_type=jnp.float32)       # (W, C)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def akgm_mix_pallas(h, att_sp, kernel, bias, nset: int):
    return _akgm_forward(h, att_sp, kernel, bias, nset)


def _akgm_forward(h, att_sp, kernel, bias, nset: int):
    B, H, W, C = h.shape
    G = nset
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))       # (B, H+2, W+2, C)
    kd = _densify_kernel(kernel, C, G)                      # (3,3,C,C*G)
    kd = kd.reshape(9, C, C * G).astype(h.dtype)
    bias2 = bias.reshape(1, C * G)
    sel = jnp.asarray(_selection_matrix(C, G, h.dtype))

    grid = (B, H)
    flops = 2 * 9 * B * H * W * C * C * G + 2 * B * H * W * C * G * C
    return pl.pallas_call(
        functools.partial(_akgm_kernel, C=C, G=G, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=grid,
        in_specs=[
            # overlapping 3-row halo slab (elementwise start offsets)
            pl.BlockSpec((_Element(1), _Element(3), _Element(W + 2),
                          _Element(C)),
                         lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, G), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, C * G), lambda b, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C * G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W, C), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * H * W * (2 * C + G),
            transcendentals=0),
    )(hp, att_sp, kd, bias2, sel)


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
