"""One-pass GroupNorm(1) statistics — Pallas TPU kernel.

XLA emits the GN(1) mean/variance of the big NHWC activations as TWO
full-tensor loop-fusion passes with f32 upcasts (integrated SID trace:
~4.8 ms x5 per denoise step for tensors whose one-pass bandwidth cost is
~1.4 ms). This kernel accumulates per-channel sum and sum-of-squares in one
read; the (B, C) -> scalar finish runs in XLA (tiny). Reference semantics:
/root/reference/model/ucdir.py:75-100 (Block = GroupNorm(1) -> swish ->
conv); the affine fold itself lives in ops/conv_pallas.py.

custom_vjp: d(sum)/dx = 1, d(sumsq)/dx = 2x — a one-liner XLA elementwise,
so the kernel is train-safe.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops import vmem_limit_bytes as _vmem_limit


def _stats_kernel(x_ref, sum_ref, sq_ref, *, R):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        sum_ref[0] = jnp.zeros_like(sum_ref[0])
        sq_ref[0] = jnp.zeros_like(sq_ref[0])
    for r in range(R):
        row = x_ref[0, r].astype(jnp.float32)            # (W, C)
        sum_ref[0, 0] += jnp.sum(row, axis=0)
        sq_ref[0, 0] += jnp.sum(row * row, axis=0)


def _stats_forward(x, rows_per_block: int = 0):
    B, H, W, C = x.shape
    if not rows_per_block:
        rows_per_block = next(r for r in (8, 4, 2, 1) if H % r == 0)
    R = rows_per_block
    return pl.pallas_call(
        functools.partial(_stats_kernel, R=R),
        out_shape=(jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C), jnp.float32)),
        grid=(B, H // R),
        in_specs=[pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, C), lambda b, y: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, C), lambda b, y: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True]),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * H * W * C,
            bytes_accessed=x.dtype.itemsize * B * H * W * C,
            transcendentals=0),
    )(x)


@jax.custom_vjp
def gn1_stats_pallas(x):
    """Per-(batch, channel) sum and sum-of-squares of an NHWC tensor in one
    HBM pass. Returns ((B, C) f32, (B, C) f32)."""
    s, q = _stats_forward(x)
    return s[:, 0], q[:, 0]


def _st_fwd(x):
    return gn1_stats_pallas(x), x


def _st_bwd(x, g):
    ds, dq = g
    dx = (ds[:, None, None, :]
          + 2. * x.astype(jnp.float32) * dq[:, None, None, :])
    return (dx.astype(x.dtype),)


gn1_stats_pallas.defvjp(_st_fwd, _st_bwd)


def gn1_stats(x, use_pallas: bool = False):
    """Dispatching one-pass GN(1) stats: ((B, C) sum, (B, C) sumsq) in f32.
    Pallas on TPU at the big scales; a single XLA pass otherwise."""
    B, H, W, C = x.shape
    min_dim = int(_os.environ.get('UCDIR_TPU_STATS_MIN_DIM', '384'))
    ok = (use_pallas and jax.devices()[0].platform == 'tpu'
          and _os.environ.get('UCDIR_TPU_NO_PALLAS_STATS') != '1'
          and min(H, W) >= min_dim and C <= 1024
          and W * C * x.dtype.itemsize <= 2 ** 22)
    if ok:
        return gn1_stats_pallas(x)
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(1, 2)), jnp.sum(jnp.square(xf), axis=(1, 2))
