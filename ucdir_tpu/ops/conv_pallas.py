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
import contextlib as _contextlib
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops.akgm_pallas import HAS_ELEMENT, _Element, _stage_padfree
from ucdir_tpu.ops import vmem_limit_bytes as _vmem_limit


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


def _ring(hp, v):
    """Overwrite the 1-px border ring of (B, H+2, W+2, C) with v (B, C)."""
    vb = v[:, None, :]
    hp = hp.at[:, 0, :, :].set(vb)
    hp = hp.at[:, -1, :, :].set(vb)
    hp = hp.at[:, :, 0, :].set(vb)
    hp = hp.at[:, :, -1, :].set(vb)
    return hp


def _ring_aligned(hp, v, R):
    """Ring for the rows-padded-by-R layout (B, H+2R, W+2, C): the positions
    a 3x3 window can read are rows [R-1, H+R] x cols [0, W+1]; write v on
    that region's border (rows R-1 / H+R full-width, cols 0 / W+1)."""
    S = hp.shape[1]
    hp = hp.at[:, R - 1, :, :].set(v[:, None, :])
    hp = hp.at[:, S - R, :, :].set(v[:, None, :])
    hp = hp.at[:, R - 1:S - R + 1, 0, :].set(v[:, None, :])
    hp = hp.at[:, R - 1:S - R + 1, -1, :].set(v[:, None, :])
    return hp


def _with_stats_outs(out_shape, out_specs, B, Cout):
    """Append the (B, 1, Cout) f32 sum/sumsq accumulator outputs (revisited
    across the row-grid dimension, init at program_id(1)==0 — the same
    pattern as stats_pallas._stats_kernel and the bwd kernels' dw)."""
    st = jax.ShapeDtypeStruct((B, 1, Cout), jnp.float32)
    sp = pl.BlockSpec((1, 1, Cout), lambda b, y: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    return (out_shape, st, st), (out_specs, sp, sp)


def _stats_init(s_ref, q_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[0] = jnp.zeros_like(s_ref[0])
        q_ref[0] = jnp.zeros_like(q_ref[0])


def _stats_accum(s_ref, q_ref, ov):
    """Accumulate one output row's per-channel sum/sumsq (f32, of the STORED
    values — exactly what gn1_stats would read back, see stats_pallas.py)."""
    ovf = ov.astype(jnp.float32)
    s_ref[0, 0] += jnp.sum(ovf, axis=0)
    q_ref[0, 0] += jnp.sum(ovf * ovf, axis=0)


def _conv_kernel(h_ref, w_ref, b_ref, *rest, Cin, Cout, W, R, act, fold,
                 emit=False):
    n = 1 if fold else 0
    a_ref = rest[0] if fold else None
    out_ref = rest[n]
    s_ref, q_ref = (rest[n + 1], rest[n + 2]) if emit else (None, None)
    scratch_ref = rest[-1]
    if emit:
        _stats_init(s_ref, q_ref)
    for r in range(R):
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            piece = h_ref[0, r + ty, tx:tx + W, :]
            if fold:
                piece = piece * a_ref[0]
            scratch_ref[:, t * Cin:(t + 1) * Cin] = piece
        acc = jnp.dot(scratch_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)   # (W, Cout)
        acc = acc + b_ref[0]
        if act == 'swish':
            acc = acc * jax.nn.sigmoid(acc)
        ov = acc.astype(out_ref.dtype)
        out_ref[0, r] = ov
        if emit:
            _stats_accum(s_ref, q_ref, ov)


_TAPS = [(ty, tx) for ty in range(3) for tx in range(3)]


def _conv_kernel_padfree(h_ref, w_ref, b_ref, v_ref, *rest,
                         Cin, Cout, W, R, act, fold, pre_act=None,
                         xcol=False, emit=False):
    """Pad-free variant: h_ref is an (1, R+2, W, Cin) Element block of the
    UNPADDED input at row offset clip(y*R-1, 0, H-R-2). The block is staged
    once into a (R+2, W+2, Cin) VMEM scratch with the SAME-padding border
    written in (v_ref: 0, or -norm_shift for the folded-norm path — the
    POST-scale ring value, exact even for scale==0) and the norm scale
    applied during staging (once per row instead of 3x per tap); the im2col
    loop then matches the padded kernel. Kills the per-kernel-boundary
    jnp.pad that cost ~56 ms/step in the whole-image SID program (pads of
    custom-call outputs cannot be input-fused into the next kernel).
    xcol=True stages the x-only im2col instead (akgm_pallas._stage_xcol) and
    contracts three K=3Cin dots per row — ~2.5x fewer scratch stores."""
    n = 2 if fold else 0
    a_ref = rest[0] if fold else None
    t_ref = rest[1] if fold else None
    out_ref = rest[n]
    s_ref, q_ref = (rest[n + 1], rest[n + 2]) if emit else (None, None)
    k = n + (3 if emit else 1)
    scratch_ref = rest[k]
    pad_ref = rest[k + 1] if not xcol else None
    arow = a_ref[0] if fold else None
    trow = t_ref[0] if fold else None
    if xcol:
        from ucdir_tpu.ops.akgm_pallas import _stage_xcol
        _stage_xcol(h_ref, scratch_ref, v_ref[0], arow, trow,
                    R=R, W=W, C=Cin, act=pre_act)
    else:
        _stage_padfree(h_ref, pad_ref, v_ref[0], arow, trow, R=R, W=W,
                       C=Cin, act=pre_act)
    if emit:
        _stats_init(s_ref, q_ref)
    for r in range(R):
        if xcol:
            acc = jnp.dot(scratch_ref[r], w_ref[0:3 * Cin, :],
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(scratch_ref[r + 1], w_ref[3 * Cin:6 * Cin, :],
                           preferred_element_type=jnp.float32)
            acc += jnp.dot(scratch_ref[r + 2], w_ref[6 * Cin:9 * Cin, :],
                           preferred_element_type=jnp.float32)  # (W, Cout)
        else:
            for t, (ty, tx) in enumerate(_TAPS):
                scratch_ref[:, t * Cin:(t + 1) * Cin] = \
                    pad_ref[r + ty, tx:tx + W, :]
            acc = jnp.dot(scratch_ref[...], w_ref[...],
                          preferred_element_type=jnp.float32)   # (W, Cout)
        acc = acc + b_ref[0]
        if act == 'swish':
            acc = acc * jax.nn.sigmoid(acc)
        ov = acc.astype(out_ref.dtype)
        out_ref[0, r] = ov
        if emit:
            _stats_accum(s_ref, q_ref, ov)


def _conv3x3_forward_padfree(x, kernel, bias, act=None, norm_scale=None,
                             norm_shift=None, rows_per_block: int = 0,
                             pre_act=None, emit_stats: bool = False):
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    if not rows_per_block:
        pref = int(_os.environ.get('UCDIR_TPU_CONV_R', '4'))
        rows_per_block = next(r for r in (pref, 4, 2, 1)
                              if H % r == 0 and H >= r + 2 and H // r >= 2)
    R = rows_per_block
    fold = norm_scale is not None
    w2 = kernel.reshape(9 * Cin, Cout).astype(x.dtype)  # k = tap*Cin + i
    b2 = bias.reshape(1, 1, Cout)
    v2 = jnp.zeros((1, 1, Cin), x.dtype)
    b_spec = pl.BlockSpec((1, 1, Cout), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, Cin), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    if fold:
        # the staged operand carries x*a + t directly (zero ring = the
        # normalized zero), so the bias stays unfolded and there is no
        # degenerate -shift/scale ring (cf. the padded path's _ring note)
        per_b = lambda b, y: (b, 0, 0)
        extra = [norm_scale.astype(x.dtype)[:, None, :],
                 norm_shift.astype(x.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, Cin), per_b,
                                    memory_space=pltpu.VMEM)] * 2
    else:
        extra, extra_specs = [], []

    from ucdir_tpu.ops.akgm_pallas import _use_xcol
    xcol = _use_xcol()
    scratch = ([pltpu.VMEM((R + 2, W, 3 * Cin), x.dtype)] if xcol else
               [pltpu.VMEM((W, 9 * Cin), x.dtype),
                pltpu.VMEM((R + 2, W + 2, Cin), x.dtype)])
    out_shape = jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype)
    out_specs = pl.BlockSpec((1, R, W, Cout), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)
    if emit_stats:
        out_shape, out_specs = _with_stats_outs(out_shape, out_specs, B, Cout)
    out = pl.pallas_call(
        functools.partial(_conv_kernel_padfree, Cin=Cin, Cout=Cout, W=W, R=R,
                          act=act, fold=fold, pre_act=pre_act, xcol=xcol,
                          emit=emit_stats),
        out_shape=out_shape,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W),
                          _Element(Cin)),
                         lambda b, y: (b, jnp.clip(y * R - 1, 0, H - R - 2),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
            v_spec,
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True] + [False] * (3 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * B * H * W * (Cin + Cout),
            transcendentals=B * H * W * Cout if act else 0),
    )(x, w2, b2, v2, *extra)
    if emit_stats:
        return out[0], out[1][:, 0], out[2][:, 0]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_pallas(x, kernel, bias, act=None, norm_scale=None,
                   norm_shift=None):
    """3x3 SAME conv + bias + optional 'swish', fused on TPU.

    norm_scale/norm_shift (B, Cin): an input-side per-channel affine
    (e.g. a folded GroupNorm(1) normalize) applied as `x*scale + shift`
    before the conv — the shift part folds into the output bias outside the
    kernel, the scale rides the im2col stores, so the normalize never
    materializes in HBM."""
    return _conv3x3_forward(x, kernel, bias, act, norm_scale, norm_shift)


def _stats_of(out):
    """(B, C) f32 sum/sumsq of an NHWC tensor via plain XLA (fallback for
    kernel variants without in-kernel emission)."""
    of = out.astype(jnp.float32)
    return jnp.sum(of, axis=(1, 2)), jnp.sum(of * of, axis=(1, 2))


def _conv3x3_forward(x, kernel, bias, act=None, norm_scale=None,
                     norm_shift=None, rows_per_block: int = 0,
                     emit_stats: bool = False):
    import os
    if os.environ.get('UCDIR_TPU_ALIGNED') == '1':
        # aligned-halo experiment (3 standard block operands instead of
        # Element offsets) — measured a WASH isolated and -1.2% in-model
        # with 2x the compile time; kept opt-in for future re-measurement
        out = _conv3x3_forward_aligned(x, kernel, bias, act, norm_scale,
                                       norm_shift, rows_per_block)
        return (out, *_stats_of(out)) if emit_stats else out
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    if not rows_per_block:
        pref = int(os.environ.get('UCDIR_TPU_CONV_R', '4'))
        rows_per_block = next(r for r in (pref, 4, 2, 1) if H % r == 0)
    R = rows_per_block
    # padfree: in-kernel SAME-border staging instead of a producer jnp.pad.
    # r3 isolated A/B lost at Cin=64, but the INTEGRATED programs win at
    # every Cin once XCOL landed (r4: SID 724.7 -> 707.5 ms/step, 512px
    # 0.426 -> 0.434 img/s with padfree everywhere) — default ON whenever
    # the kernel path engages; '0' disables for A/Bs.
    pf = os.environ.get('UCDIR_TPU_PADFREE', 'auto')
    if pf != '0' and H // R >= 2 and H >= R + 2:
        return _conv3x3_forward_padfree(x, kernel, bias, act, norm_scale,
                                        norm_shift, R,
                                        emit_stats=emit_stats)
    fold = norm_scale is not None
    hp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = kernel.reshape(9 * Cin, Cout).astype(x.dtype)  # k = tap*Cin + i
    if fold:
        # conv(x*a + t) = conv_w(x*a) + tile(t, 9) @ w2. SAME padding must
        # hold normalized ZEROS, so pad with v where v*a + t == 0 — the
        # in-kernel affine then maps the ring to exactly 0.
        # Degenerate case: if a learned GroupNorm scale underflows to exactly
        # 0 the ring falls back to v=0, border taps then contribute shift*w,
        # and this forward diverges from the custom_vjp backward (which uses
        # the exact unfolded composition). Accepted: scale==0.0 is
        # measure-zero for trained weights; clamping would perturb all
        # non-degenerate numerics. Same pattern in akgm_pallas._akgm_block_forward.
        hp = _ring(hp, jnp.where(jnp.abs(norm_scale) > 1e-12,
                                 -norm_shift / norm_scale, 0.).astype(x.dtype))
        b2 = (bias[None, :]
              + jnp.tile(norm_shift.astype(jnp.float32), (1, 9))
              @ w2.astype(jnp.float32)).astype(x.dtype)    # (B, Cout)
        # (B, 1, X) with (1, 1, X) blocks — a (1, X) block over (B, X)
        # violates Mosaic's block-divisibility rule at B>1
        b2 = b2[:, None, :]
        extra = [norm_scale.astype(x.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, Cin), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)]
        b_spec = pl.BlockSpec((1, 1, Cout), lambda b, y: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        b2 = bias.reshape(1, 1, Cout)
        extra, extra_specs = [], []
        b_spec = pl.BlockSpec((1, 1, Cout), lambda b, y: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype)
    out_specs = pl.BlockSpec((1, R, W, Cout), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)
    if emit_stats:
        out_shape, out_specs = _with_stats_outs(out_shape, out_specs, B, Cout)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, Cin=Cin, Cout=Cout, W=W, R=R, act=act,
                          fold=fold, emit=emit_stats),
        out_shape=out_shape,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W + 2),
                          _Element(Cin)),
                         lambda b, y: (b, y * R, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((W, 9 * Cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True] + [False] * (2 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * B * H * W * (Cin + Cout),
            transcendentals=B * H * W * Cout if act else 0),
    )(hp, w2, b2, *extra)
    if emit_stats:
        return out[0], out[1][:, 0], out[2][:, 0]
    return out


# ---------------------------------------------------------------------------
# ALIGNED-halo variant: Element-offset block specs do not DMA-pipeline on
# Mosaic (measured r2: a DMA-only halo kernel costs 4.9 ms for 0.7 ms of
# bytes at 1024^2/C=64 — per-program latency never overlaps compute). Here
# the input is row-padded by R and passed THREE times with standard aligned
# R-row block specs at block indices (y, y+1, y+2); Mosaic double-buffers
# those, and the 3-row window of each output row is assembled in-kernel from
# static slices of the three resident blocks (row o reads block-local rows
# r-1, r, r+1 of the middle block, spilling into the above/below blocks only
# at r=0 / r=R-1). 3x read amplification, but the reads are pipelined —
# bandwidth is cheap here, latency was not.
# ---------------------------------------------------------------------------


def _conv_kernel_aligned(above_ref, mid_ref, below_ref, w_ref, b_ref, *rest,
                         Cin, Cout, W, R, act, fold):
    if fold:
        a_ref, out_ref, scratch_ref = rest
    else:
        out_ref, scratch_ref = rest
    for r in range(R):
        rows = (above_ref[0, R - 1] if r == 0 else mid_ref[0, r - 1],
                mid_ref[0, r],
                below_ref[0, 0] if r == R - 1 else mid_ref[0, r + 1])
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            piece = rows[ty][tx:tx + W, :]
            if fold:
                piece = piece * a_ref[0]
            scratch_ref[:, t * Cin:(t + 1) * Cin] = piece
        acc = jnp.dot(scratch_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)   # (W, Cout)
        acc = acc + b_ref[0]
        if act == 'swish':
            acc = acc * jax.nn.sigmoid(acc)
        out_ref[0, r] = acc.astype(out_ref.dtype)


def _conv3x3_forward_aligned(x, kernel, bias, act=None, norm_scale=None,
                             norm_shift=None, rows_per_block: int = 0):
    import os
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    if not rows_per_block:
        rows_per_block = int(os.environ.get('UCDIR_TPU_CONV_R', '8'))
    R = next(r for r in (rows_per_block, 8, 4, 2, 1) if H % r == 0)
    fold = norm_scale is not None
    hp = jnp.pad(x, ((0, 0), (R, R), (1, 1), (0, 0)))
    w2 = kernel.reshape(9 * Cin, Cout).astype(x.dtype)
    if fold:
        hp = _ring_aligned(hp, jnp.where(jnp.abs(norm_scale) > 1e-12,
                                         -norm_shift / norm_scale,
                                         0.).astype(x.dtype), R)
        b2 = (bias[None, :]
              + jnp.tile(norm_shift.astype(jnp.float32), (1, 9))
              @ w2.astype(jnp.float32)).astype(x.dtype)[:, None, :]
        extra = [norm_scale.astype(x.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, Cin), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)]
        b_spec = pl.BlockSpec((1, 1, Cout), lambda b, y: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        b2 = bias.reshape(1, 1, Cout)
        extra, extra_specs = [], []
        b_spec = pl.BlockSpec((1, 1, Cout), lambda b, y: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    blk = lambda off: pl.BlockSpec(
        (1, R, W + 2, Cin), lambda b, y, o=off: (b, y + o, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_conv_kernel_aligned, Cin=Cin, Cout=Cout, W=W, R=R,
                          act=act, fold=fold),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid=(B, H // R),
        in_specs=[blk(0), blk(1), blk(2),
                  pl.BlockSpec((9 * Cin, Cout), lambda b, y: (0, 0),
                               memory_space=pltpu.VMEM),
                  b_spec] + extra_specs,
        out_specs=pl.BlockSpec((1, R, W, Cout), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, 9 * Cin), x.dtype)],
        # input fusion OFF here: with the same padded array passed three
        # times, letting XLA fuse the pad producer into each operand would
        # recompute it 3x (and ballooned the integrated compile ~7x)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * B * H * W * (3 * Cin + Cout),
            transcendentals=B * H * W * Cout if act else 0),
    )(hp, hp, hp, w2, b2, *extra)


# ---------------------------------------------------------------------------
# Fused BACKWARD kernel — one Pallas pass for all conv gradients (the same
# role as the AKGM block's _akgm_block_bwd_kernel; see akgm_pallas.py for the
# derivation). dz needs a 1-row halo for the transposed conv, so with an
# activation z is recomputed for R+2 rows per block from a 2-row-halo x̂
# staging; with act=None dz == g and the staged g doubles as dzpad.
# ---------------------------------------------------------------------------


def _conv_bwd_kernel(h_ref, g_ref, w_ref, wf_ref, b_ref, *rest,
                     Cin, Cout, W, R, act, fold):
    from ucdir_tpu.ops.akgm_pallas import _stage_halo2, _stage_padfree
    if fold:
        a_ref, t_ref = rest[:2]
        rest = rest[2:]
    (dxh_ref, dw_ref, dbias_ref,
     sc_ref, sc2_ref, xpad_ref, gpad_ref) = rest[:7]
    dzpad_ref = rest[7] if act else gpad_ref
    cdt = h_ref.dtype
    zc = jnp.zeros((1, Cin), cdt)
    zo = jnp.zeros((1, Cout), cdt)
    _stage_halo2(h_ref, xpad_ref, zc,
                 a_ref[0] if fold else None,
                 t_ref[0] if fold else None, R=R, W=W, C=Cin)
    _stage_padfree(g_ref, gpad_ref, zo, None, None, R=R, W=W, C=Cout)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    for l in range(R + 2):
        if act is None and not (1 <= l <= R):
            continue                       # dz == g; only center rows matter
        for t, (ty, tx) in enumerate(_TAPS):
            sc_ref[:, t * Cin:(t + 1) * Cin] = xpad_ref[l + ty, tx:tx + W, :]
        if act:
            z = jnp.dot(sc_ref[...], w_ref[...],
                        preferred_element_type=jnp.float32) + b_ref[0]
            sig = jax.nn.sigmoid(z)
            dz = gpad_ref[l, 1:W + 1, :].astype(jnp.float32) \
                * sig * (1. + z * (1. - sig))                # swish'(z)
            dzpad_ref[l, 1:W + 1, :] = dz.astype(cdt)
            dzpad_ref[l, 0:1, :] = jnp.zeros((1, Cout), cdt)
            dzpad_ref[l, W + 1:W + 2, :] = jnp.zeros((1, Cout), cdt)
            dz_c = dz.astype(cdt)
        else:
            dz_c = gpad_ref[l, 1:W + 1, :]
        if 1 <= l <= R:
            dbias_ref[0, 0] += jnp.sum(dz_c.astype(jnp.float32), axis=0)
            dw_ref[0] += jax.lax.dot_general(
                sc_ref[...], dz_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (9Cin, Cout)
    for r in range(R):
        for t, (ty, tx) in enumerate(_TAPS):
            sc2_ref[:, t * Cout:(t + 1) * Cout] = \
                dzpad_ref[r + ty, tx:tx + W, :]
        dxh = jnp.dot(sc2_ref[...], wf_ref[...],
                      preferred_element_type=jnp.float32)    # (W, Cin)
        dxh_ref[0, r] = dxh.astype(dxh_ref.dtype)


def _conv3x3_backward(x, kernel, bias, g, act=None, norm_scale=None,
                      norm_shift=None, rows_per_block: int = 0):
    """All gradients of the fused conv in one Pallas pass. Returns
    (dx, dkernel, dbias, dns, dnt)."""
    from ucdir_tpu.ops import akgm_pallas as _ak
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    if not rows_per_block:
        rows_per_block = next(r for r in (4, 2, 1) if H % r == 0)
    R = rows_per_block
    fold = norm_scale is not None
    w2 = kernel.reshape(9 * Cin, Cout).astype(x.dtype)
    wf2 = kernel[::-1, ::-1].transpose(0, 1, 3, 2) \
        .reshape(9 * Cout, Cin).astype(x.dtype)
    b2 = bias.reshape(1, 1, Cout).astype(x.dtype)
    if fold:
        extra = [norm_scale.astype(x.dtype)[:, None, :],
                 norm_shift.astype(x.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, Cin), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2
    else:
        extra, extra_specs = [], []
    cdt = x.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((B, H, W, Cin), cdt),           # dxh (pre-affine)
        jax.ShapeDtypeStruct((B, 9 * Cin, Cout), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, Cout), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, R, W, Cin), lambda b, y: (b, y, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 9 * Cin, Cout), lambda b, y: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Cout), lambda b, y: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    scratch = [pltpu.VMEM((W, 9 * Cin), cdt),
               pltpu.VMEM((W, 9 * Cout), cdt),
               pltpu.VMEM((R + 4, W + 2, Cin), cdt),
               pltpu.VMEM((R + 2, W + 2, Cout), cdt)]
    if act:
        scratch.append(pltpu.VMEM((R + 2, W + 2, Cout), cdt))
    nconv = 3 if act else 2
    dxh, dw_b, dbias_b = pl.pallas_call(
        functools.partial(_conv_bwd_kernel, Cin=Cin, Cout=Cout, W=W, R=R,
                          act=act, fold=fold),
        out_shape=out_shapes,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 4), _Element(W),
                          _Element(Cin)),
                         lambda b, y: (b, jnp.clip(y * R - 2, 0, H - R - 4),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W),
                          _Element(Cout)),
                         lambda b, y: (b, jnp.clip(y * R - 1, 0, H - R - 2),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cout, Cin), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cout), lambda b, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True, True] + [False] * (3 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout * nconv,
            bytes_accessed=x.dtype.itemsize * B * H * W * (2 * Cin + Cout),
            transcendentals=B * H * W * Cout if act else 0),
    )(x, g, w2, wf2, b2, *extra)

    dkernel = dw_b.sum(0).reshape(kernel.shape).astype(kernel.dtype)
    dbias = dbias_b.sum(axis=(0, 1)).astype(bias.dtype).reshape(bias.shape)
    if fold:
        dx = (dxh * norm_scale[:, None, None, :].astype(dxh.dtype)
              ).astype(x.dtype)
        dns = jnp.sum(dxh.astype(jnp.float32) * x.astype(jnp.float32),
                      axis=(1, 2)).astype(norm_scale.dtype)
        dnt = jnp.sum(dxh.astype(jnp.float32),
                      axis=(1, 2)).astype(norm_shift.dtype)
        return dx, dkernel, dbias, dns, dnt
    return dxh.astype(x.dtype), dkernel, dbias, None, None


def _c3_ref(x, kernel, bias, act, norm_scale, norm_shift):
    if norm_scale is not None:
        x = x * norm_scale[:, None, None, :] + norm_shift[:, None, None, :]
    return conv3x3_xla(x, kernel, bias, act)


def _c3_fwd(x, kernel, bias, act, norm_scale, norm_shift):
    out = _conv3x3_forward(x, kernel, bias, act, norm_scale, norm_shift)
    return out, (x, kernel, bias, norm_scale, norm_shift)


def _c3_bwd(act, residuals, g):
    x, kernel, bias, ns, nt = residuals
    from ucdir_tpu.ops.akgm_pallas import _use_pallas_bwd
    B, H, W, Cin = x.shape
    R = next(r for r in (4, 2, 1) if H % r == 0)
    if _use_pallas_bwd(H, W, Cin, R):
        dx, dk, db, dns, dnt = _conv3x3_backward(x, kernel, bias, g, act,
                                                 ns, nt, R)
        return dx, dk, db, dns, dnt
    if ns is None:
        _, vjp = jax.vjp(lambda x, k, b: conv3x3_xla(x, k, b, act),
                         x, kernel, bias)
        return vjp(g) + (None, None)
    _, vjp = jax.vjp(lambda x, k, b, s, t: _c3_ref(x, k, b, act, s, t),
                     x, kernel, bias, ns, nt)
    return vjp(g)


conv3x3_pallas.defvjp(_c3_fwd, _c3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_stats_pallas(x, kernel, bias, act=None, norm_scale=None,
                         norm_shift=None):
    """conv3x3_pallas that ALSO emits the output's per-(batch, channel)
    f32 sum and sum-of-squares from inside the kernel — the producer half
    of the chained GroupNorm(1) stats (ops.chain_stats_mode): the next
    block's folded norm uses these instead of re-reading the tensor.
    Returns (out, s (B,Cout), q (B,Cout))."""
    return _conv3x3_forward(x, kernel, bias, act, norm_scale, norm_shift,
                            emit_stats=True)


def _c3s_fwd(x, kernel, bias, act, ns, nt):
    out, s, q = _conv3x3_forward(x, kernel, bias, act, ns, nt,
                                 emit_stats=True)
    return (out, s, q), (x, kernel, bias, ns, nt, out)


def _c3s_bwd(act, residuals, g):
    # d(sum)/d(out) = 1, d(sumsq)/d(out) = 2*out — fold the stats cotangents
    # into the output cotangent, then reuse the plain conv backward.
    x, kernel, bias, ns, nt, out = residuals
    go, ds, dq = g
    go = (go.astype(jnp.float32) + ds.astype(jnp.float32)[:, None, None, :]
          + 2. * out.astype(jnp.float32)
          * dq.astype(jnp.float32)[:, None, None, :]).astype(out.dtype)
    return _c3_bwd(act, (x, kernel, bias, ns, nt), go)


conv3x3_stats_pallas.defvjp(_c3s_fwd, _c3s_bwd)


def _conv1x1_kernel(h_ref, w_ref, b_ref, out_ref, *, W, R, act):
    for r in range(R):
        acc = jnp.dot(h_ref[0, r], w_ref[...],
                      preferred_element_type=jnp.float32)   # (W, Cout)
        acc = acc + b_ref[0]
        if act == 'swish':
            acc = acc * jax.nn.sigmoid(acc)
        out_ref[0, r] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1x1_pallas(x, kernel, bias, act=None):
    """1x1 conv (= per-pixel matmul) + bias + optional 'swish' on TPU.
    XLA's conv emitter runs this at ~13 TFLOP/s at the big scales
    (integrated trace: 3.5 ms for the 50 GFLOP 192->64 ups res_conv)."""
    return _conv1x1_forward(x, kernel, bias, act)


def _conv1x1_forward(x, kernel, bias, act=None, rows_per_block: int = 8):
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    R = next(r for r in (rows_per_block, 4, 2, 1) if H % r == 0)
    w2 = kernel.reshape(Cin, Cout).astype(x.dtype)
    b2 = bias.reshape(1, Cout)
    return pl.pallas_call(
        functools.partial(_conv1x1_kernel, W=W, R=R, act=act),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((1, R, W, Cin), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W, Cout), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * B * H * W * (Cin + Cout),
            transcendentals=0),
    )(x, w2, b2)


def conv1x1_xla(x, kernel, bias=None, act=None):
    y = jnp.einsum('bhwc,co->bhwo', x, kernel.reshape(kernel.shape[-2:]),
                   preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    if act == 'swish':
        y = y * jax.nn.sigmoid(y)
    return y


def _c1_fwd(x, kernel, bias, act):
    return _conv1x1_forward(x, kernel, bias, act), (x, kernel, bias)


def _c1_bwd(act, residuals, g):
    x, kernel, bias = residuals
    _, vjp = jax.vjp(lambda x, k, b: conv1x1_xla(x, k, b, act),
                     x, kernel, bias)
    return vjp(g)


conv1x1_pallas.defvjp(_c1_fwd, _c1_bwd)


# -- eval-only dispatch relaxation --------------------------------------------
# The conv-kernel spatial floor is phase-dependent: in EVAL programs the
# integrated r4 A/Bs show min_dim 196 wins every size tested (SID 709.0 vs
# 724.7 ms/step, 512px 0.4554 vs 0.4261 img/s — the /2- and /8-scale convs
# amortize once XCOL + pad-free staging landed), but in a TRAIN forward the
# same newly-engaged kernels pair with the XLA-recompute backward and lose
# 2.7x (tr-min196: 1.66 vs 0.61 s/step at B=8 256px). make_eval_step wraps
# its trace bodies in eval_dispatch() so only eval programs see the lower
# floor; UCDIR_TPU_CONV_MIN_DIM overrides both.
_EVAL_TRACE = [False]


@_contextlib.contextmanager
def eval_dispatch():
    old = _EVAL_TRACE[0]
    _EVAL_TRACE[0] = True
    try:
        yield
    finally:
        _EVAL_TRACE[0] = old


def _min_dim() -> int:
    v = _os.environ.get('UCDIR_TPU_CONV_MIN_DIM')
    if v is not None:
        return int(v)
    return 196 if _EVAL_TRACE[0] else 384


def conv1x1(x, kernel, bias, act=None, use_pallas=False):
    """Dispatching 1x1 conv: Pallas on TPU at the big scales, einsum XLA else."""
    import os
    B, H, W, Cin = x.shape
    min_dim = _min_dim()
    ok = (use_pallas and jax.devices()[0].platform == 'tpu'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_CONV') != '1'
          and min(H, W) >= min_dim and W <= _MAX_WIDTH
          and Cin <= 512 and kernel.shape[-1] <= 512)
    if ok:
        out = conv1x1_pallas(x, kernel, bias, act)
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(out, 'pallas_out')
    return conv1x1_xla(x, kernel, bias, act)


# in-model measured crossover: pallas wins for Cin*Cout products at the two
# big scales; at the deep scales (>=256 ch, <=256px) XLA convs are fine and
# the smaller grids don't amortize. Guard mirrors ops/akgm.akgm_block_tail.
# Width cap covers the untiled SID row length (2272); the real VMEM bound is
# the (W, 9*Cin) im2col scratch guard below.
_MAX_WIDTH = int(_os.environ.get('UCDIR_TPU_CONV_MAX_W', '2304'))
_MAX_SCRATCH = int(_os.environ.get('UCDIR_TPU_CONV_SCRATCH_MB', '8')) * 2 ** 20


@jax.custom_vjp
def conv3x3_preact_pallas(x, kernel, bias, norm_scale, norm_shift):
    """GN(1)-folded `conv3x3(swish(x*a + t)) + bias` — the reference's
    Block head (GroupNorm -> Swish -> Conv, ucdir.py:75-83) as one kernel:
    the swish rides the pad-free staging (ring stays exact: swish(0) == 0),
    so neither the normalized nor the activated tensor ever hits HBM."""
    return _conv3x3_forward_padfree(x, kernel, bias, None, norm_scale,
                                    norm_shift, pre_act='swish')


def _c3p_ref(x, kernel, bias, norm_scale, norm_shift):
    xh = x * norm_scale[:, None, None, :] + norm_shift[:, None, None, :]
    return conv3x3_xla(xh * jax.nn.sigmoid(xh), kernel, bias, None)


def _c3p_fwd(x, kernel, bias, ns, nt):
    return conv3x3_preact_pallas(x, kernel, bias, ns, nt), \
        (x, kernel, bias, ns, nt)


def _c3p_bwd(residuals, g):
    _, vjp = jax.vjp(_c3p_ref, *residuals)
    return vjp(g)


conv3x3_preact_pallas.defvjp(_c3p_fwd, _c3p_bwd)


def head_conv3x3(x, kernel, bias, norm_scale, norm_shift, use_pallas=False):
    """Dispatching GN(1)+swish+conv head (see conv3x3_preact_pallas)."""
    import os
    B, H, W, Cin = x.shape
    min_dim = _min_dim()
    R = next(r for r in (4, 2, 1) if H % r == 0)
    ok = (use_pallas and HAS_ELEMENT
          and jax.devices()[0].platform == 'tpu'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_CONV') != '1'
          and min(H, W) >= min_dim and W <= _MAX_WIDTH
          and Cin <= 1024 and kernel.shape[-1] <= 512
          and H // R >= 2 and H >= R + 2
          and W * 9 * Cin * x.dtype.itemsize <= _MAX_SCRATCH)
    if ok:
        out = conv3x3_preact_pallas(x, kernel, bias, norm_scale, norm_shift)
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(out, 'pallas_out')
    return _c3p_ref(x, kernel, bias, norm_scale, norm_shift)


def _downconv_kernel(he_ref, ho_ref, w_ref, b_ref, v_ref, *rest, Cin, Cout,
                     W, R, fold, emit=False):
    """Stride-2 3x3 SAME conv (the reference Downsample, ucdir.py:63-69).
    he_ref/ho_ref: (1, 2R+1, W2, Cin) Element blocks of the even-/odd-column
    deinterleave of the UNPADDED input at row offset clip(2yR-1, 0, H-2R-1)
    — for even H/W the stride-2 taps never read the bottom/right pad, so
    only the top block stages a border row. The column deinterleave happens
    in XLA OUTSIDE the kernel (real Mosaic rejects stride-2 value slices:
    'extract_strided_slice op expected strides to be confined to [1, 2)');
    each staged row is compacted into a stride-2 x-im2col (W2, 3Cin) with
    plain copies, and output row r contracts three K=3Cin dots on xcol rows
    2r..2r+2 — no strided access anywhere in the kernel and half-width
    scratch traffic."""
    n = 2 if fold else 0
    a_ref = rest[0] if fold else None
    t_ref = rest[1] if fold else None
    out_ref = rest[n]
    s_ref, q_ref = (rest[n + 1], rest[n + 2]) if emit else (None, None)
    xcol_ref = rest[-1]
    W2 = W // 2
    y = pl.program_id(1)
    vrow = v_ref[0]

    def stage(off, top):
        for l in range(2 * R + 1):
            if top and l == 0:
                for t in range(3):
                    xcol_ref[l, :, t * Cin:(t + 1) * Cin] = \
                        jnp.broadcast_to(vrow, (W2, Cin))
                continue
            even = he_ref[0, l - off]                        # (W2, C)
            odd = ho_ref[0, l - off]                         # (W2, C)
            if fold:
                even = even * a_ref[0] + t_ref[0]
                odd = odd * a_ref[0] + t_ref[0]
            # tap cols for output x: padded 2x (tx=0), 2x+1 (tx=1), 2x+2
            # (tx=2) = [v, odd[:-1]], even, odd
            xcol_ref[l, 1:W2, 0:Cin] = odd[0:W2 - 1]
            xcol_ref[l, 0:1, 0:Cin] = vrow
            xcol_ref[l, :, Cin:2 * Cin] = even
            xcol_ref[l, :, 2 * Cin:3 * Cin] = odd

    @pl.when(y == 0)
    def _top():
        stage(1, True)

    @pl.when(y > 0)
    def _interior():
        stage(0, False)

    if emit:
        _stats_init(s_ref, q_ref)
    for r in range(R):
        acc = jnp.dot(xcol_ref[2 * r], w_ref[0:3 * Cin, :],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(xcol_ref[2 * r + 1], w_ref[3 * Cin:6 * Cin, :],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(xcol_ref[2 * r + 2], w_ref[6 * Cin:9 * Cin, :],
                       preferred_element_type=jnp.float32)   # (W2, Cout)
        acc = acc + b_ref[0]
        ov = acc.astype(out_ref.dtype)
        out_ref[0, r] = ov
        if emit:
            _stats_accum(s_ref, q_ref, ov)


def _downconv_forward(x, kernel, bias, norm_scale=None, norm_shift=None,
                      rows_per_block: int = 0, emit_stats: bool = False):
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    H2, W2 = H // 2, W // 2
    if not rows_per_block:
        # H2 > R so the (2R+1)-row block fits the array even at y == 0
        rows_per_block = next(r for r in (4, 2, 1)
                              if H2 % r == 0 and H2 > r)
    R = rows_per_block
    fold = norm_scale is not None
    w2 = kernel.reshape(9 * Cin, Cout).astype(x.dtype)
    b2 = bias.reshape(1, 1, Cout)
    v2 = jnp.zeros((1, 1, Cin), x.dtype)
    b_spec = pl.BlockSpec((1, 1, Cout), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, Cin), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    if fold:
        extra = [norm_scale.astype(x.dtype)[:, None, :],
                 norm_shift.astype(x.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, Cin), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2
    else:
        extra, extra_specs = [], []
    out_shape = jax.ShapeDtypeStruct((B, H2, W2, Cout), x.dtype)
    out_specs = pl.BlockSpec((1, R, W2, Cout), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)
    if emit_stats:
        out_shape, out_specs = _with_stats_outs(out_shape, out_specs, B, Cout)
    # Column deinterleave in XLA (Mosaic rejects stride-2 value slices);
    # the two halves fuse into the pallas operands as strided-slice reads.
    halo_spec = pl.BlockSpec((_Element(1), _Element(2 * R + 1), _Element(W2),
                              _Element(Cin)),
                             lambda b, y: (b, jnp.clip(2 * y * R - 1, 0,
                                                       H - 2 * R - 1), 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_downconv_kernel, Cin=Cin, Cout=Cout, W=W, R=R,
                          fold=fold, emit=emit_stats),
        out_shape=out_shape,
        grid=(B, H2 // R),
        in_specs=[
            halo_spec,
            halo_spec,
            pl.BlockSpec((9 * Cin, Cout), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
            v_spec,
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((2 * R + 1, W2, 3 * Cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True, True] + [False] * (3 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H2 * W2 * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * B * H * W * Cin
            + x.dtype.itemsize * B * H2 * W2 * Cout,
            transcendentals=0),
    )(x[:, :, 0::2, :], x[:, :, 1::2, :], w2, b2, v2, *extra)
    if emit_stats:
        return out[0], out[1][:, 0], out[2][:, 0]
    return out


def downconv_xla(x, kernel, bias, norm_scale=None, norm_shift=None):
    if norm_scale is not None:
        x = x * norm_scale[:, None, None, :] + norm_shift[:, None, None, :]
    y = lax.conv_general_dilated(
        x, kernel, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + bias


@jax.custom_vjp
def downconv2x_pallas(x, kernel, bias, norm_scale, norm_shift):
    return _downconv_forward(x, kernel, bias, norm_scale, norm_shift)


def _dc_fwd(x, kernel, bias, ns, nt):
    return downconv2x_pallas(x, kernel, bias, ns, nt), (x, kernel, bias,
                                                        ns, nt)


def _dc_bwd(residuals, g):
    x, kernel, bias, ns, nt = residuals
    if ns is None:
        _, vjp = jax.vjp(lambda x, k, b: downconv_xla(x, k, b), x, kernel,
                         bias)
        return vjp(g) + (None, None)
    _, vjp = jax.vjp(downconv_xla, x, kernel, bias, ns, nt)
    return vjp(g)


downconv2x_pallas.defvjp(_dc_fwd, _dc_bwd)


@jax.custom_vjp
def downconv2x_stats_pallas(x, kernel, bias, norm_scale, norm_shift):
    """downconv2x_pallas + in-kernel output sum/sumsq (see
    conv3x3_stats_pallas). Returns (out, s (B,Cout), q (B,Cout))."""
    return _downconv_forward(x, kernel, bias, norm_scale, norm_shift,
                             emit_stats=True)


def _dcs_fwd(x, kernel, bias, ns, nt):
    out, s, q = _downconv_forward(x, kernel, bias, ns, nt, emit_stats=True)
    return (out, s, q), (x, kernel, bias, ns, nt, out)


def _dcs_bwd(residuals, g):
    x, kernel, bias, ns, nt, out = residuals
    go, ds, dq = g
    go = (go.astype(jnp.float32) + ds.astype(jnp.float32)[:, None, None, :]
          + 2. * out.astype(jnp.float32)
          * dq.astype(jnp.float32)[:, None, None, :]).astype(out.dtype)
    return _dc_bwd((x, kernel, bias, ns, nt), go)


downconv2x_stats_pallas.defvjp(_dcs_fwd, _dcs_bwd)


def downconv2x(x, kernel, bias, use_pallas=False, norm_scale=None,
               norm_shift=None, emit_stats=False):
    """Dispatching stride-2 3x3 conv (Downsample). emit_stats: see conv3x3."""
    import os
    B, H, W, Cin = x.shape
    H2 = H // 2
    min_dim = _min_dim()
    ok = (use_pallas and HAS_ELEMENT
          and jax.devices()[0].platform == 'tpu'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_CONV') != '1'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_DOWN') != '1'
          and H % 2 == 0 and W % 2 == 0 and H2 > 1
          and min(H, W) >= min_dim and W <= _MAX_WIDTH
          and Cin <= 1024 and kernel.shape[-1] <= 512
          and W * 9 * Cin * x.dtype.itemsize <= _MAX_SCRATCH)
    mode = _emit_mode(emit_stats)
    from jax.ad_checkpoint import checkpoint_name
    if ok:
        if mode == 'auto':
            out, s, q = downconv2x_stats_pallas(x, kernel, bias,
                                                norm_scale, norm_shift)
            return checkpoint_name(out, 'pallas_out'), _totals(s, q)
        out = checkpoint_name(
            downconv2x_pallas(x, kernel, bias, norm_scale, norm_shift),
            'pallas_out')
    else:
        out = downconv_xla(x, kernel, bias, norm_scale, norm_shift)
    if emit_stats:
        return out, (_totals(*_stats_of(out)) if mode == 'xla' else None)
    return out


# nearest-x2 + 3x3 SAME conv == a phase-packed conv at SOURCE resolution:
# output row 2y+py reads source rows {y-1, y} (py=0) / {y, y+1} (py=1) with
# the duplicated taps' weights SUMMED (nearest repeats rows/cols, so original
# taps ty=1,2 hit the same source row for py=0, etc). The four phases pack
# into one (3,3,Cin,4*Cout) kernel -> ONE conv at source res (2x fewer MXU
# FLOPs than convolving the materialized 2x map: 36 vs 72 MACs/src px) and
# the 4x-channel output depth-to-spaces back. Exact — not an approximation.
_PHASE_M = np.array([[[1, 0, 0], [0, 1, 1], [0, 0, 0]],     # py/px == 0
                     [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], np.float32)


def _pack_up_kernel(kernel):
    """(3,3,Cin,Cout) -> (3,3,Cin,4*Cout) phase-packed (phase-major lanes:
    packed output channel = (py*2+px)*Cout + o)."""
    m = jnp.asarray(_PHASE_M, kernel.dtype)                 # (2, 3, 3)
    k = jnp.einsum('pay,yxio,qbx->abipqo', m,
                   kernel, m)                               # (3,3,Cin,2,2,Cout)
    C4 = 4 * kernel.shape[-1]
    return k.reshape(k.shape[0], k.shape[1], k.shape[2], C4)


def depth_to_space2(y):
    """(B, H, W, 4*C) phase-major -> (B, 2H, 2W, C)."""
    B, H, W, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, H, W, 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)                       # (B, H, 2, W, 2, C)
    return y.reshape(B, 2 * H, 2 * W, C)


def upconv2x(x, kernel, bias, use_pallas=False, emit_stats=False):
    """nearest-x2 upsample + 3x3 SAME conv, as one phase-packed conv at
    source resolution (reference: Upsample, ucdir.py:53-60). Dispatches the
    packed conv through the Pallas kernel with its own caps (the packed
    4*Cout exceeds conv3x3's lane cap by design).
    emit_stats: the packed (B,H,W,4C) output is a permutation of the
    (B,2H,2W,C) result, so its (B,) totals ARE the upsampled tensor's —
    emitted from the packed kernel for free."""
    import os
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    kp = _pack_up_kernel(kernel).astype(x.dtype)
    bp = jnp.tile(bias, (4,)).astype(x.dtype)
    min_dim = _min_dim()
    ok = (use_pallas and HAS_ELEMENT
          and jax.devices()[0].platform == 'tpu'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_CONV') != '1'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_UP') != '1'
          # the OUTPUT is 2H x 2W — gate on the output scale like conv3x3
          and 2 * min(H, W) >= min_dim and W <= _MAX_WIDTH
          and Cin <= 1024 and 4 * Cout <= 2048
          and W * 9 * Cin * x.dtype.itemsize <= _MAX_SCRATCH
          and W * 4 * Cout * 4 <= 2 ** 23)
    mode = _emit_mode(emit_stats)
    stats = None
    from jax.ad_checkpoint import checkpoint_name
    if ok:
        if mode == 'auto':
            y, s, q = conv3x3_stats_pallas(x, kp, bp, None, None, None)
            stats = _totals(s, q)
        else:
            y = conv3x3_pallas(x, kp, bp, None, None, None)
        y = checkpoint_name(y, 'pallas_out')
    else:
        y = conv3x3_xla(x, kp, bp, None)
    if mode == 'xla' and stats is None:
        stats = _totals(*_stats_of(y))
    out = depth_to_space2(y)
    if emit_stats:
        return out, stats
    return out


def _emit_mode(emit_stats: bool) -> str:
    """Resolved chain-stats mode for a dispatch site: '' (don't emit),
    'auto' (emit from the kernel when the pallas path engages) or 'xla'
    (emit via XLA sums regardless — CPU threading tests)."""
    if not emit_stats:
        return ''
    from ucdir_tpu.ops import chain_stats_mode
    mode = chain_stats_mode()
    return mode if mode in ('auto', 'xla') else ''


def _totals(s, q):
    # checkpoint_name: under remat policies that save pallas outputs, the
    # tiny (B,) totals must be saved too — otherwise the backward re-runs
    # the whole Mosaic kernel just to recompute them
    from jax.ad_checkpoint import checkpoint_name
    return (checkpoint_name(jnp.sum(s, axis=1), 'pallas_out'),
            checkpoint_name(jnp.sum(q, axis=1), 'pallas_out'))


def conv3x3(x, kernel, bias, act=None, use_pallas=False, norm_scale=None,
            norm_shift=None, emit_stats=False):
    """Dispatching 3x3 conv: fused Pallas on TPU (big scales), XLA otherwise.
    norm_scale/norm_shift: optional folded input-side affine (see
    conv3x3_pallas).
    emit_stats: also return the output's GroupNorm(1) totals — a second
    return value ((B,) sum, (B,) sumsq) f32, or None when the active path
    cannot emit them for free (ops.chain_stats_mode)."""
    import os
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    min_dim = _min_dim()
    # big-channel convs (the /8-scale 1024->512 / 768->512 at whole-image
    # SID size) amortize the staging at much smaller spatial dims — XLA runs
    # them at ~33 TF/s vs the kernel's ~80; a blanket MIN_DIM drop regressed
    # the step (small-Cin /8 convs lose), so the exception gates on Cin.
    # BIGC_MIN_DIM default 192 (was 128): at 128^2 maps (512px eval /4) the
    # big-Cin kernels LOSE 13% integrated — the r3 512px regression, r4
    # bisect tools/ab512.py nobigc leg (0.426 vs 0.372 img/s). SID's /8 maps
    # are 194+ so the SID program is unchanged by the 192 floor.
    if Cin >= int(os.environ.get('UCDIR_TPU_CONV_BIGC', '512')):
        min_dim = int(os.environ.get('UCDIR_TPU_CONV_BIGC_MIN_DIM', '192'))
    ok = (use_pallas and HAS_ELEMENT
          and jax.devices()[0].platform == 'tpu'
          and os.environ.get('UCDIR_TPU_NO_PALLAS_CONV') != '1'
          and min(H, W) >= min_dim and W <= _MAX_WIDTH
          # bisect knobs: tiny-Cin (downs_0 6->64) and tiny-Cout
          # (final_conv 64->3, 3/128 output lanes) convs route to the kernel
          # since r3; these revert them to XLA for A/Bs
          and Cin >= int(os.environ.get('UCDIR_TPU_CONV_MIN_CIN', '0'))
          and Cout >= int(os.environ.get('UCDIR_TPU_CONV_MIN_COUT', '0'))
          and Cin <= 1024 and Cout <= 512
          and W * 9 * Cin * x.dtype.itemsize <= _MAX_SCRATCH)
    mode = _emit_mode(emit_stats)
    from jax.ad_checkpoint import checkpoint_name
    if ok:
        if mode == 'auto':
            out, s, q = conv3x3_stats_pallas(x, kernel, bias, act,
                                             norm_scale, norm_shift)
            return checkpoint_name(out, 'pallas_out'), _totals(s, q)
        out = conv3x3_pallas(x, kernel, bias, act, norm_scale, norm_shift)
        # named for remat policies (save_only_these_names('pallas_out')):
        # saving kernel outputs beats re-running Mosaic kernels in backward
        out = checkpoint_name(out, 'pallas_out')
    else:
        out = _c3_ref(x, kernel, bias, act, norm_scale, norm_shift)
    if emit_stats:
        return out, (_totals(*_stats_of(out)) if mode == 'xla' else None)
    return out
