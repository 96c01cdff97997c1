"""Generic fused 3x3 conv (+bias, optional swish) — Pallas TPU kernel.

Why this exists: XLA:TPU's conv emitter runs the shallow-channel convs that
dominate the DY3h denoiser at 6-35% MXU with space-minor T(2,128) layouts
(integrated-step trace, tools/trace_ops.py: the ups-block 192->64 conv1 at
1024^2 costs 18.6 ms for 232 GFLOP = 6% of peak). The same im2col-through-
VMEM-scratch + single (W, 9*Cin) @ (9*Cin, Cout) dot used by the fused AKGM
kernel (ops/akgm_pallas.py) runs the MXU at full contraction depth.

Backward runs the XLA convolution composition via custom_vjp (identical
math; training-time memory unchanged).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops.akgm_pallas import HAS_ELEMENT, _Element


def conv3x3_xla(x, kernel, bias=None, act=None):
    """Reference XLA path: NHWC SAME(1) 3x3 conv + bias + activation."""
    y = lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        y = y + bias
    if act == 'swish':
        y = y * jax.nn.sigmoid(y)
    return y


def _conv_kernel(h_ref, w_ref, b_ref, out_ref, scratch_ref, *,
                 Cin, Cout, W, R, act):
    for r in range(R):
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            scratch_ref[:, t * Cin:(t + 1) * Cin] = \
                h_ref[0, r + ty, tx:tx + W, :]
        acc = jnp.dot(scratch_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)   # (W, Cout)
        acc = acc + b_ref[0]
        if act == 'swish':
            acc = acc * jax.nn.sigmoid(acc)
        out_ref[0, r] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_pallas(x, kernel, bias, act=None):
    """3x3 SAME conv + bias + optional 'swish', fused on TPU."""
    return _conv3x3_forward(x, kernel, bias, act)


def _conv3x3_forward(x, kernel, bias, act=None, rows_per_block: int = 0):
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    if not rows_per_block:
        rows_per_block = next(r for r in (4, 2, 1) if H % r == 0)
    R = rows_per_block
    hp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = kernel.reshape(9 * Cin, Cout).astype(x.dtype)  # k = tap*Cin + i
    b2 = bias.reshape(1, Cout)

    return pl.pallas_call(
        functools.partial(_conv_kernel, Cin=Cin, Cout=Cout, W=W, R=R, act=act),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W + 2),
                          _Element(Cin)),
                         lambda b, y: (b, y * R, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W, Cout), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, 9 * Cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * B * H * W * (Cin + Cout),
            transcendentals=B * H * W * Cout if act else 0),
    )(hp, w2, b2)


def _c3_fwd(x, kernel, bias, act):
    return _conv3x3_forward(x, kernel, bias, act), (x, kernel, bias)


def _c3_bwd(act, residuals, g):
    x, kernel, bias = residuals
    _, vjp = jax.vjp(lambda x, k, b: conv3x3_xla(x, k, b, act),
                     x, kernel, bias)
    return vjp(g)


conv3x3_pallas.defvjp(_c3_fwd, _c3_bwd)


# in-model measured crossover: pallas wins for Cin*Cout products at the two
# big scales; at the deep scales (>=256 ch, <=256px) XLA convs are fine and
# the smaller grids don't amortize. Guard mirrors ops/akgm.akgm_block_tail.
_MAX_WIDTH = 2048


def conv3x3(x, kernel, bias, act=None, use_pallas=False):
    """Dispatching 3x3 conv: fused Pallas on TPU (big scales), XLA otherwise."""
    import os
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    ok = (use_pallas and HAS_ELEMENT
          and jax.devices()[0].platform == 'tpu'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_CONV') != '1'
          and min(H, W) >= 384 and W <= _MAX_WIDTH
          and Cin <= 512 and Cout <= 512
          and W * 9 * Cin * x.dtype.itemsize <= 8 * 1024 * 1024)
    if ok:
        return conv3x3_pallas(x, kernel, bias, act)
    return conv3x3_xla(x, kernel, bias, act)
