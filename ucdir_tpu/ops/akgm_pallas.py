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
from ucdir_tpu.ops import vmem_limit_bytes as _vmem_limit


def _use_xcol() -> bool:
    """x-only im2col staging (see _stage_xcol): trade the 9-tap per-output-
    row scratch stores for 3 stores per staged row + three K=3C dots.

    Default ON: integrated SID whole-image A/B on real TPU measured
    724.7 vs 753.5 ms/step (-3.8%, tools/ab_sid.py, r3)."""
    import os
    return os.environ.get('UCDIR_TPU_XCOL', '1') == '1'


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


# ---------------------------------------------------------------------------
# v2: fused block tail — swish(mix(grouped_conv(h), att)) + res in ONE kernel.
#
# Faster than v1 on two axes (measured, tools/akgm_variants2.py + traces):
#   * ONE (W, 9C) @ (9C, CG) dot per row instead of nine K=C dots — K=C=64
#     caps the MXU at 50%; the lane-concat of the 9 shifted slices is a few
#     hundred VREG ops (~0.3 ms/1024 rows), the dot gains ~2x.
#   * the epilogue (attention mix, swish, residual add) runs on the VMEM
#     accumulator — the XLA path round-trips 3 full tensors through HBM and
#     pays relayout copies around the conv (~25% of integrated step time was
#     'data formatting', tools/trace_ops.py).
# ---------------------------------------------------------------------------


def _stage_padfree(h_ref, pad_ref, vrow, arow, trow=None, *, R, W, C,
                   act=None, row_axis=1):
    """Stage an UNPADDED (1, R+2, W, C) Element block (row offset
    clip(y*R-1, 0, H-R-2) of the source) into a (R+2, W+2, C) VMEM scratch
    holding the SAME-padding view: border positions get vrow, interior rows
    get the input with the folded-norm affine `row*arow + trow` applied once
    (instead of 3x per im2col tap; with trow the ring is the exact
    normalized zero, so vrow=0 and the bias stays unfolded — no degenerate
    scale==0 case, unlike the padded path's -shift/scale ring).
    Grid axis `row_axis` must be the row-block axis."""
    y = pl.program_id(row_axis)
    ny = pl.num_programs(row_axis)

    def stage(off, top, bottom):
        # scratch row l = padded-view row (border at l==0 if top /
        # l==R+1 if bottom); source = h_ref local row l - off
        for l in range(R + 2):
            if (top and l == 0) or (bottom and l == R + 1):
                pad_ref[l, :, :] = jnp.broadcast_to(vrow, (W + 2, C))
                continue
            row = h_ref[0, l - off]                          # (W, C)
            if arow is not None:
                row = row * arow
            if trow is not None:
                row = row + trow
            if act == 'swish':
                # pre-activation fold (GN -> swish -> conv heads): the ring
                # stays exact because swish(normalized zero) == swish(0) == 0
                row = row * jax.nn.sigmoid(row.astype(jnp.float32)) \
                    .astype(row.dtype)
            pad_ref[l, 1:W + 1, :] = row
            pad_ref[l, 0:1, :] = vrow
            pad_ref[l, W + 1:W + 2, :] = vrow

    @pl.when(jnp.logical_and(y > 0, y < ny - 1))
    def _interior():
        stage(0, False, False)

    @pl.when(y == 0)
    def _top():
        stage(1, True, ny == 1)

    @pl.when(jnp.logical_and(y == ny - 1, ny > 1))
    def _bottom():
        stage(-1, False, True)


def _stage_xcol(h_ref, xcol_ref, vrow, arow, trow=None, *, R, W, C,
                act=None):
    """Stage an UNPADDED (1, R+2, W, C) Element block directly as an x-only
    im2col: xcol[l, :, tx*C:(tx+1)*C] = SAME-padded row l, cols [tx, tx+W).
    3 stores per staged row replace the (R+2)-row pad staging PLUS the 9
    tap stores per OUTPUT row of the tap-im2col formulation (3(R+2) vs
    (R+2)+9R row stores per block) — the measured floor of the C=64 kernels
    is scratch-store traffic, not the MXU. Each output row then contracts
    three K=3C dots (w rows [3C*ty, 3C*(ty+1))) instead of one K=9C dot.
    Same border/affine/activation semantics as _stage_padfree."""
    y = pl.program_id(1)
    ny = pl.num_programs(1)

    def stage(off, top, bottom):
        for l in range(R + 2):
            if (top and l == 0) or (bottom and l == R + 1):
                for t in range(3):
                    xcol_ref[l, :, t * C:(t + 1) * C] = \
                        jnp.broadcast_to(vrow, (W, C))
                continue
            row = h_ref[0, l - off]                          # (W, C)
            if arow is not None:
                row = row * arow
            if trow is not None:
                row = row + trow
            if act == 'swish':
                row = row * jax.nn.sigmoid(row.astype(jnp.float32)) \
                    .astype(row.dtype)
            # tx=1 (center) = the row itself; tx=0 = [v, row[:-1]];
            # tx=2 = [row[1:], v]
            xcol_ref[l, :, C:2 * C] = row
            xcol_ref[l, 1:W, 0:C] = row[0:W - 1]
            xcol_ref[l, 0:1, 0:C] = vrow
            xcol_ref[l, 0:W - 1, 2 * C:3 * C] = row[1:W]
            xcol_ref[l, W - 1:W, 2 * C:3 * C] = vrow

    @pl.when(jnp.logical_and(y > 0, y < ny - 1))
    def _interior():
        stage(0, False, False)

    @pl.when(y == 0)
    def _top():
        stage(1, True, ny == 1)

    @pl.when(jnp.logical_and(y == ny - 1, ny > 1))
    def _bottom():
        stage(-1, False, True)


def _akgm_block_kernel(h_ref, att_ref, aw_ref, kd_ref, bias_ref, sel_ref,
                       res_ref, *rest, C, G, W, R, fold=False, emit=False):
    from ucdir_tpu.ops.conv_pallas import _stats_init, _stats_accum
    n = 1 if fold else 0
    a_ref = rest[0] if fold else None
    out_ref = rest[n]
    s_ref, q_ref = (rest[n + 1], rest[n + 2]) if emit else (None, None)
    scratch_ref = rest[-1]
    if emit:
        _stats_init(s_ref, q_ref)
    # R output rows per program: the kernel is DMA-issue-bound at R=1
    # (measured 4.9 ms for DMA alone vs 0.7 ms of HBM bytes at 1024^2/C=64 —
    # ~5 us per-program overhead x 1024 programs); batching rows amortizes it
    # and shrinks the halo re-fetch ratio from 3x to (R+2)/R.
    for r in range(R):
        # im2col row via VMEM scratch (stores normalize the vreg offsets of
        # the shifted slices; Mosaic rejects a direct mixed-offset concat),
        # then ONE (W, 9C) @ (9C, CG) dot — K=9C keeps the MXU full where
        # per-tap K=C dots cap it at C/128.
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            piece = h_ref[0, r + ty, tx:tx + W, :]
            if fold:
                piece = piece * a_ref[0]
            scratch_ref[:, t * C:(t + 1) * C] = piece
        acc = jnp.dot(scratch_ref[...], kd_ref[...],
                      preferred_element_type=jnp.float32)   # (W, CG)
        acc = acc + bias_ref[0]
        att = att_ref[0, r] * aw_ref[0]                     # (W, G) * (1, G)
        att_exp = jnp.tile(att, (1, C))                     # lane o -> att[o%G]
        # candidates back to the compute dtype for the selection matmul (the
        # XLA reference mixes with preferred_element_type=h.dtype too).
        mixed = (acc.astype(att_exp.dtype) * att_exp)
        out = jnp.dot(mixed, sel_ref[...],
                      preferred_element_type=jnp.float32)   # (W, C)
        out = out * jax.nn.sigmoid(out) + res_ref[0, r].astype(jnp.float32)
        ov = out.astype(out_ref.dtype)
        out_ref[0, r] = ov
        if emit:
            _stats_accum(s_ref, q_ref, ov)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def akgm_block_pallas(h, att_sp, kernel, bias, res, nset: int,
                      norm_scale=None, norm_shift=None, attw=None):
    """swish(akgm_mix(h*, att_sp*attw, kernel, bias)) + res, fused on TPU.
    norm_scale/norm_shift (B, C): optional folded input-side affine
    (a GroupNorm(1) normalize) — `h* = h*scale + shift`, with the shift
    folded into the bias outside the kernel.
    attw (B, G): optional per-batch mixing weights multiplied into the
    attention maps IN-KERNEL — keeps the per-step (B,H,W,G) `att_sp*attw`
    product (a 16x lane-padded elementwise pass in XLA) out of HBM."""
    return _akgm_block_forward(h, att_sp, kernel, bias, res, nset,
                               norm_scale, norm_shift, attw)


def _akgm_block_forward(h, att_sp, kernel, bias, res, nset: int,
                        norm_scale=None, norm_shift=None, attw=None,
                        rows_per_block: int = 0, emit_stats: bool = False):
    import os
    if emit_stats and (os.environ.get('UCDIR_TPU_ALIGNED') == '1'
                       or os.environ.get('UCDIR_TPU_AKGM_PACKED') == '1'
                       or grouped_tail_enabled(h.shape[-1], nset)):
        # the opt-in experiment kernels don't emit; fall back to XLA sums
        from ucdir_tpu.ops.conv_pallas import _stats_of
        out = _akgm_block_forward(h, att_sp, kernel, bias, res, nset,
                                  norm_scale, norm_shift, attw,
                                  rows_per_block)
        return (out, *_stats_of(out))
    if grouped_tail_enabled(h.shape[-1], nset) and h.shape[1] >= 4 \
            and os.environ.get('UCDIR_TPU_AKGM_PACKED') != '1' \
            and os.environ.get('UCDIR_TPU_ALIGNED') != '1':
        # v4 per-group kernel: correct pairing, no densified FLOP waste
        return _akgm_block_forward_grouped(
            h, att_sp, kernel, bias, res, nset, norm_scale, norm_shift,
            attw, rows_per_block)
    if os.environ.get('UCDIR_TPU_ALIGNED') == '1' \
            and os.environ.get('UCDIR_TPU_AKGM_PACKED') != '1':
        # aligned-halo experiment: measured a wash isolated, -1.2%% in-model,
        # 2x compile time — opt-in only
        return _akgm_block_forward_aligned(
            h, att_sp, kernel, bias, res, nset, norm_scale, norm_shift,
            attw, rows_per_block)
    if os.environ.get('UCDIR_TPU_AKGM_PACKED') == '1':
        # NEGATIVE RESULT (VERDICT r2 item 8, kept for the record): the
        # group-packed formulation measures 1.4-2.7x faster but computes a
        # DIFFERENT network. The true pairing (torch view(b, c, nset, h, w) +
        # groups=nset) gives candidate j = o % nset but conv-group
        # g = o // C, so all G candidates of an output channel share ONE
        # input group — the attention cannot fold into a shared im2col
        # operand, and the correct per-group dots need 8-lane operand slices
        # (vs the 128-lane VPU granularity). The densified form's G-fold
        # FLOP waste is the price of that granularity; it stays the default.
        return _akgm_block_forward_packed(
            h, att_sp, kernel, bias, res, nset, norm_scale, norm_shift,
            attw, rows_per_block)
    B, H, W, C = h.shape
    G = nset
    if attw is None:
        attw = jnp.ones((B, G), h.dtype)
    if not rows_per_block:
        # measured at 1024^2/C=64 bf16: R=4 7.54 ms, R=1 7.79, R>=8 worse
        # (bigger blocks raise vmem stack pressure; DMA issue overhead is
        # not the limiter — see CLAUDE.md round-2 notes). UCDIR_TPU_AKGM_R
        # re-measures (halo refetch scales as (R+2)/R on the padfree path).
        pref = int(os.environ.get('UCDIR_TPU_AKGM_R', '4'))
        rows_per_block = next(r for r in (pref, 4, 2, 1) if H % r == 0)
    R = rows_per_block
    pf = os.environ.get('UCDIR_TPU_PADFREE', 'auto')
    if pf in ('1', 'auto') and H // R >= 2 and H >= R + 2:
        return _akgm_block_forward_padfree(h, att_sp, kernel, bias, res,
                                           nset, norm_scale, norm_shift,
                                           attw, R, emit_stats=emit_stats)
    fold = norm_scale is not None
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kd = _densify_kernel(kernel, C, G)                      # (3,3,C,CG)
    kd2 = kd.reshape(9 * C, C * G).astype(h.dtype)          # k = tap*C + i
    # per-(batch, channel) vectors ride as (B, 1, X) with (1, 1, X) blocks:
    # Mosaic requires the last two block dims be (8,128)-divisible or equal
    # to the array dims — a (1, X) block over a (B, X) array fails at B>1.
    if fold:
        # SAME padding must hold normalized zeros (see conv_pallas._ring)
        from ucdir_tpu.ops.conv_pallas import _ring
        hp = _ring(hp, jnp.where(jnp.abs(norm_scale) > 1e-12,
                                 -norm_shift / norm_scale, 0.).astype(h.dtype))
        bias2 = (bias[None, :]
                 + jnp.tile(norm_shift.astype(jnp.float32), (1, 9))
                 @ kd2.astype(jnp.float32)).astype(h.dtype)  # (B, CG)
        bias2 = bias2[:, None, :]
        extra = [norm_scale.astype(h.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, C), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)]
        b_spec = pl.BlockSpec((1, 1, C * G), lambda b, y: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        bias2 = bias.reshape(1, 1, C * G)
        extra, extra_specs = [], []
        b_spec = pl.BlockSpec((1, 1, C * G), lambda b, y: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    sel = jnp.asarray(_selection_matrix(C, G, h.dtype))

    grid = (B, H // R)
    flops = 2 * B * H * W * 9 * C * C * G + 2 * B * H * W * C * G * C
    out_shape = jax.ShapeDtypeStruct((B, H, W, C), h.dtype)
    out_specs = pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)
    if emit_stats:
        from ucdir_tpu.ops.conv_pallas import _with_stats_outs
        out_shape, out_specs = _with_stats_outs(out_shape, out_specs, B, C)
    out = pl.pallas_call(
        functools.partial(_akgm_block_kernel, C=C, G=G, W=W, R=R, fold=fold,
                          emit=emit_stats),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W + 2),
                          _Element(C)),
                         lambda b, y: (b, y * R, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, G), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, y: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C * G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
            pl.BlockSpec((C * G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((W, 9 * C), h.dtype)],
        # the (W, CG) f32 accumulator lives on the vector stack; inside a big
        # XLA program the default pallas vmem budget OOMs ("Ran out of memory
        # in memory space vmem while allocating on stack") — raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            # let XLA fuse the jnp.pad producer into the operand (kills the
            # separate full-tensor pad materialization where it can)
            allow_input_fusion=[True] + [False] * (6 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h.dtype.itemsize * B * H * W * (3 * C + G),
            transcendentals=B * H * W * C),
    )(hp, att_sp, attw.astype(h.dtype)[:, None, :], kd2, bias2,
      sel, res, *extra)
    if emit_stats:
        return out[0], out[1][:, 0], out[2][:, 0]
    return out


def _akgm_block_kernel_padfree(h_ref, att_ref, aw_ref, kd_ref, bias_ref,
                               sel_ref, res_ref, v_ref, *rest,
                               C, G, W, R, fold=False, xcol=False,
                               emit=False):
    """Pad-free block tail: stages the SAME-padding view in VMEM (see
    _stage_padfree) so the jnp.pad producer — which XLA cannot input-fuse
    when h is itself a custom-call output, leaving a full-tensor pad op
    between chained kernels — disappears from the program.
    xcol=True stages the x-only im2col instead (see _stage_xcol) and
    contracts three K=3C dots per row — ~2.5x fewer scratch stores."""
    from ucdir_tpu.ops.conv_pallas import _stats_init, _stats_accum
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
        _stage_xcol(h_ref, scratch_ref, v_ref[0], arow, trow, R=R, W=W, C=C)
    else:
        _stage_padfree(h_ref, pad_ref, v_ref[0], arow, trow, R=R, W=W, C=C)
    if emit:
        _stats_init(s_ref, q_ref)
    for r in range(R):
        if xcol:
            acc = jnp.dot(scratch_ref[r], kd_ref[0:3 * C, :],
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(scratch_ref[r + 1], kd_ref[3 * C:6 * C, :],
                           preferred_element_type=jnp.float32)
            acc += jnp.dot(scratch_ref[r + 2], kd_ref[6 * C:9 * C, :],
                           preferred_element_type=jnp.float32)  # (W, CG)
        else:
            for t, (ty, tx) in enumerate(
                    [(y, x) for y in range(3) for x in range(3)]):
                scratch_ref[:, t * C:(t + 1) * C] = \
                    pad_ref[r + ty, tx:tx + W, :]
            acc = jnp.dot(scratch_ref[...], kd_ref[...],
                          preferred_element_type=jnp.float32)   # (W, CG)
        acc = acc + bias_ref[0]
        att = att_ref[0, r] * aw_ref[0]                     # (W, G) * (1, G)
        att_exp = jnp.tile(att, (1, C))
        mixed = (acc.astype(att_exp.dtype) * att_exp)
        out = jnp.dot(mixed, sel_ref[...],
                      preferred_element_type=jnp.float32)   # (W, C)
        out = out * jax.nn.sigmoid(out) + res_ref[0, r].astype(jnp.float32)
        ov = out.astype(out_ref.dtype)
        out_ref[0, r] = ov
        if emit:
            _stats_accum(s_ref, q_ref, ov)


def _akgm_block_forward_padfree(h, att_sp, kernel, bias, res, nset: int,
                                norm_scale=None, norm_shift=None, attw=None,
                                rows_per_block: int = 0,
                                emit_stats: bool = False):
    B, H, W, C = h.shape
    G = nset
    if attw is None:
        attw = jnp.ones((B, G), h.dtype)
    if not rows_per_block:
        import os as _o
        pref = int(_o.environ.get('UCDIR_TPU_AKGM_R', '4'))
        rows_per_block = next(r for r in (pref, 4, 2, 1)
                              if H % r == 0 and H >= r + 2 and H // r >= 2)
    R = rows_per_block
    fold = norm_scale is not None
    kd = _densify_kernel(kernel, C, G)                      # (3,3,C,CG)
    kd2 = kd.reshape(9 * C, C * G).astype(h.dtype)          # k = tap*C + i
    bias2 = bias.reshape(1, 1, C * G)
    v2 = jnp.zeros((1, 1, C), h.dtype)
    b_spec = pl.BlockSpec((1, 1, C * G), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, C), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    if fold:
        # the staged operand carries h*a + t directly (zero ring = the
        # normalized zero), so the bias stays unfolded
        per_b = lambda b, y: (b, 0, 0)
        extra = [norm_scale.astype(h.dtype)[:, None, :],
                 norm_shift.astype(h.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, C), per_b,
                                    memory_space=pltpu.VMEM)] * 2
    else:
        extra, extra_specs = [], []
    sel = jnp.asarray(_selection_matrix(C, G, h.dtype))

    grid = (B, H // R)
    flops = 2 * B * H * W * 9 * C * C * G + 2 * B * H * W * C * G * C
    xcol = _use_xcol()
    scratch = ([pltpu.VMEM((R + 2, W, 3 * C), h.dtype)] if xcol else
               [pltpu.VMEM((W, 9 * C), h.dtype),
                pltpu.VMEM((R + 2, W + 2, C), h.dtype)])
    out_shape = jax.ShapeDtypeStruct((B, H, W, C), h.dtype)
    out_specs = pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)
    if emit_stats:
        from ucdir_tpu.ops.conv_pallas import _with_stats_outs
        out_shape, out_specs = _with_stats_outs(out_shape, out_specs, B, C)
    out = pl.pallas_call(
        functools.partial(_akgm_block_kernel_padfree, C=C, G=G, W=W, R=R,
                          fold=fold, xcol=xcol, emit=emit_stats),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W),
                          _Element(C)),
                         lambda b, y: (b, jnp.clip(y * R - 1, 0, H - R - 2),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, G), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, y: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C * G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
            pl.BlockSpec((C * G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            v_spec,
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True] + [False] * (7 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h.dtype.itemsize * B * H * W * (3 * C + G),
            transcendentals=B * H * W * C),
    )(h, att_sp, attw.astype(h.dtype)[:, None, :], kd2, bias2,
      sel, res, v2, *extra)
    if emit_stats:
        return out[0], out[1][:, 0], out[2][:, 0]
    return out


# ---------------------------------------------------------------------------
# Fused BACKWARD kernel for the block tail — the TPU counterpart of the
# reference's hand-written GroupDyConvFunction.backward unfold/fold algebra
# (/root/reference/model/utils.py:36-71). The XLA-composition custom_vjp
# backward re-runs the full densified forward (HBM candidate round-trip) to
# rebuild residuals; this kernel recomputes z row-by-row in VMEM and emits
# every gradient in ONE pass:
#   dres  = g (identity, handled by the wrapper)
#   do    = g * swish'(o),      o = (z*A) @ sel     (z recomputed in VMEM)
#   dm    = do @ sel^T          (same `sel` operand, contracted on axis 1)
#   dz    = dm * A;  dzpad staged with SAME-zero borders
#   dh*   = conv3x3(dzpad, flip(Kd)^T)              (transposed conv)
#   dKd   = sum_rows im2col(h*)^T @ dz              (accumulated over grid)
#   datt  = (dm * z) @ P * attw;   dattw += sum (dm*z) @ P * att
#   dbias = sum_rows dz
# dz needs a 1-row halo (the transposed conv), so z/do are recomputed for
# R+2 rows per block ((R+2)/R overhead) from an h* staging with a 2-row halo.
# ---------------------------------------------------------------------------


def _stage_halo2(h_ref, pad_ref, vrow, arow, trow, *, R, W, C):
    """Stage a (1, R+4, W, C) Element block (row offset
    clip(y*R-2, 0, H-R-4) of the UNPADDED source) into a (R+4, W+2, C) VMEM
    scratch holding the SAME-padded view of image rows [y*R-2, y*R+R+2):
    2-row halo each side (vs _stage_padfree's 1), border rows/cols get vrow,
    interior rows get the optional folded affine `row*arow + trow`.
    Requires H >= R+4 and H//R >= 2; the clipped source offsets then resolve
    to exactly -2 (top block), 0 (interior), +2 (bottom block)."""
    y = pl.program_id(1)
    ny = pl.num_programs(1)

    def stage(off, top, bottom):
        for l in range(R + 4):
            if (top and l < 2) or (bottom and l >= R + 2):
                pad_ref[l, :, :] = jnp.broadcast_to(vrow, (W + 2, C))
                continue
            row = h_ref[0, l + off]                          # (W, C)
            if arow is not None:
                row = row * arow
            if trow is not None:
                row = row + trow
            pad_ref[l, 1:W + 1, :] = row
            pad_ref[l, 0:1, :] = vrow
            pad_ref[l, W + 1:W + 2, :] = vrow

    @pl.when(jnp.logical_and(y > 0, y < ny - 1))
    def _interior():
        stage(0, False, False)

    @pl.when(y == 0)
    def _top():
        stage(-2, True, False)

    @pl.when(jnp.logical_and(y == ny - 1, ny > 1))
    def _bottom():
        stage(2, False, True)


def _pmat(C: int, G: int, dtype) -> np.ndarray:
    """P[o, j] = 1 where o % G == j (per-group column sum)."""
    o = np.arange(C * G)
    p = np.zeros((C * G, G), np.float32)
    p[o, o % G] = 1.
    return p.astype(dtype)


def _akgm_block_bwd_kernel(h_ref, g_ref, att_ref, aw_ref, kd_ref, kdf_ref,
                           bias_ref, sel_ref, p_ref, *rest,
                           C, G, W, R, fold=False):
    if fold:
        a_ref, t_ref = rest[:2]
        rest = rest[2:]
    (dxh_ref, datt_ref, dkd_ref, dbias_ref, daw_ref,
     sc_ref, sc2_ref, xpad_ref, gpad_ref, apad_ref, dzpad_ref) = rest
    cdt = h_ref.dtype
    zc = jnp.zeros((1, C), cdt)
    zg = jnp.zeros((1, G), cdt)
    _stage_halo2(h_ref, xpad_ref, zc,
                 a_ref[0] if fold else None,
                 t_ref[0] if fold else None, R=R, W=W, C=C)
    # g/att rows [y*R-1, y*R+R+1) with zeros outside the image: rows where
    # no output exists contribute dz = 0 to the transposed conv / dKd.
    _stage_padfree(g_ref, gpad_ref, zc, None, None, R=R, W=W, C=C)
    _stage_padfree(att_ref, apad_ref, zg, None, None, R=R, W=W, C=G)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dkd_ref[0] = jnp.zeros_like(dkd_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
        daw_ref[0] = jnp.zeros_like(daw_ref[0])

    aw = aw_ref[0].astype(jnp.float32)                       # (1, G)
    for l in range(R + 2):
        # dz row l = image row y*R-1+l; its 3x3 input window is xpad rows
        # l..l+2 (xpad row l' = image row y*R-2+l')
        for t, (ty, tx) in enumerate(_TAPS9):
            sc_ref[:, t * C:(t + 1) * C] = xpad_ref[l + ty, tx:tx + W, :]
        z = jnp.dot(sc_ref[...], kd_ref[...],
                    preferred_element_type=jnp.float32)      # (W, CG)
        z = z + bias_ref[0]
        att_raw = apad_ref[l, 1:W + 1, :].astype(jnp.float32)  # (W, G)
        att = att_raw * aw
        A = jnp.tile(att, (1, C))                            # (W, CG)
        # forward rounding: mix runs in the compute dtype
        m = (z.astype(cdt) * A.astype(cdt))
        o = jnp.dot(m, sel_ref[...],
                    preferred_element_type=jnp.float32)      # (W, C)
        sig = jax.nn.sigmoid(o)
        do = gpad_ref[l, 1:W + 1, :].astype(jnp.float32) \
            * sig * (1. + o * (1. - sig))                    # swish'(o)
        dm = jax.lax.dot_general(
            do.astype(cdt), sel_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (W, CG)
        dz = dm * A
        dzpad_ref[l, 1:W + 1, :] = dz.astype(cdt)
        dzpad_ref[l, 0:1, :] = jnp.zeros((1, C * G), cdt)
        dzpad_ref[l, W + 1:W + 2, :] = jnp.zeros((1, C * G), cdt)
        if 1 <= l <= R:                                      # center rows only
            q = dm * z                                       # (W, CG)
            datt = jnp.dot(q.astype(cdt), p_ref[...],
                           preferred_element_type=jnp.float32)  # (W, G)
            datt_ref[0, l - 1] = (datt * aw).astype(datt_ref.dtype)
            daw_ref[0, 0] += jnp.sum(datt * att_raw, axis=0)
            dbias_ref[0, 0] += jnp.sum(dz, axis=0)
            dkd_ref[0] += jax.lax.dot_general(
                sc_ref[...], dz.astype(cdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (9C, CG)
    for r in range(R):
        # dh*[r] = transposed conv: dz rows r-1..r+1 = dzpad rows r..r+2
        for t, (ty, tx) in enumerate(_TAPS9):
            sc2_ref[:, t * C * G:(t + 1) * C * G] = \
                dzpad_ref[r + ty, tx:tx + W, :]
        dxh = jnp.dot(sc2_ref[...], kdf_ref[...],
                      preferred_element_type=jnp.float32)    # (W, C)
        dxh_ref[0, r] = dxh.astype(dxh_ref.dtype)


_TAPS9 = [(ty, tx) for ty in range(3) for tx in range(3)]


def _akgm_block_backward(h, att_sp, kernel, bias, res, g, nset: int,
                         norm_scale=None, norm_shift=None, attw=None,
                         rows_per_block: int = 0):
    """All gradients of the fused block tail in one Pallas pass. Returns
    (dh, datt_sp, dkernel, dbias, dres, dns, dnt, dattw) matching
    _block_bwd's output convention (None for absent optionals)."""
    B, H, W, C = h.shape
    G = nset
    had_attw = attw is not None
    if attw is None:
        attw = jnp.ones((B, G), h.dtype)
    if not rows_per_block:
        rows_per_block = next(r for r in (4, 2, 1) if H % r == 0)
    R = rows_per_block
    fold = norm_scale is not None
    kd = _densify_kernel(kernel, C, G)                       # (3,3,C,CG)
    kd2 = kd.reshape(9 * C, C * G).astype(h.dtype)
    # transposed-conv weights: flip taps, swap in/out channels
    kdf2 = kd[::-1, ::-1].transpose(0, 1, 3, 2) \
        .reshape(9 * C * G, C).astype(h.dtype)
    bias2 = bias.reshape(1, 1, C * G)
    sel = jnp.asarray(_selection_matrix(C, G, h.dtype))
    pm = jnp.asarray(_pmat(C, G, h.dtype))
    if fold:
        extra = [norm_scale.astype(h.dtype)[:, None, :],
                 norm_shift.astype(h.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, C), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2
    else:
        extra, extra_specs = [], []

    grid = (B, H // R)
    cdt = h.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((B, H, W, C), cdt),             # dxh (pre-affine)
        jax.ShapeDtypeStruct((B, H, W, G), att_sp.dtype),    # datt_sp
        jax.ShapeDtypeStruct((B, 9 * C, C * G), jnp.float32),  # dKd (dense)
        jax.ShapeDtypeStruct((B, 1, C * G), jnp.float32),    # dbias
        jax.ShapeDtypeStruct((B, 1, G), jnp.float32),        # dattw
    )
    out_specs = (
        pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, W, G), lambda b, y: (b, y, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 9 * C, C * G), lambda b, y: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C * G), lambda b, y: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, y: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    flops = (3 * 2 * B * H * W * 9 * C * C * G          # z, dKd, dx dots
             + 3 * 2 * B * H * W * C * G * C)           # o, dm, datt dots
    dxh, datt, dkd_b, dbias_b, daw_b = pl.pallas_call(
        functools.partial(_akgm_block_bwd_kernel, C=C, G=G, W=W, R=R,
                          fold=fold),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 4), _Element(W),
                          _Element(C)),
                         lambda b, y: (b, jnp.clip(y * R - 2, 0, H - R - 4),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W),
                          _Element(C)),
                         lambda b, y: (b, jnp.clip(y * R - 1, 0, H - R - 2),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W),
                          _Element(G)),
                         lambda b, y: (b, jnp.clip(y * R - 1, 0, H - R - 2),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, y: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C * G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C * G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C * G), lambda b, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * G, G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((W, 9 * C), cdt),
                        pltpu.VMEM((W, 9 * C * G), cdt),
                        pltpu.VMEM((R + 4, W + 2, C), cdt),
                        pltpu.VMEM((R + 2, W + 2, C), cdt),
                        pltpu.VMEM((R + 2, W + 2, G), cdt),
                        pltpu.VMEM((R + 2, W + 2, C * G), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True, True] + [False] * (7 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h.dtype.itemsize * B * H * W * (4 * C + 2 * G),
            transcendentals=B * H * W * C),
    )(h, g, att_sp, attw.astype(h.dtype)[:, None, :], kd2, kdf2, bias2,
      sel, pm, *extra)

    # densify is linear: pull dKd back to the grouped kernel layout
    dkd_sum = dkd_b.sum(0).reshape(3, 3, C, C * G)
    _, dens_vjp = jax.vjp(lambda k: _densify_kernel(k, C, G), kernel)
    dkernel, = dens_vjp(dkd_sum.astype(kernel.dtype))
    dbias = dbias_b.sum(axis=(0, 1)).astype(bias.dtype).reshape(bias.shape)
    if fold:
        dh = (dxh * norm_scale[:, None, None, :].astype(dxh.dtype)
              ).astype(h.dtype)
        dns = jnp.sum(dxh.astype(jnp.float32) * h.astype(jnp.float32),
                      axis=(1, 2)).astype(norm_scale.dtype)
        dnt = jnp.sum(dxh.astype(jnp.float32),
                      axis=(1, 2)).astype(norm_shift.dtype)
    else:
        dh, dns, dnt = dxh.astype(h.dtype), None, None
    daw = daw_b[:, 0].astype(attw.dtype) if had_attw else None
    return (dh, datt.astype(att_sp.dtype), dkernel, dbias, g.astype(res.dtype),
            dns, dnt, daw)


# ---------------------------------------------------------------------------
# ALIGNED-halo variant of the fused block tail (see conv_pallas.py for the
# rationale: Element-offset halo DMA never pipelines; three standard aligned
# R-row blocks at indices (y, y+1, y+2) of a rows-padded-by-R input do).
# ---------------------------------------------------------------------------


def _akgm_block_kernel_aligned(ha_ref, hm_ref, hb_ref, att_ref, aw_ref,
                               kd_ref, bias_ref, sel_ref, res_ref, *rest,
                               C, G, W, R, fold):
    if fold:
        a_ref, out_ref, scratch_ref = rest
    else:
        out_ref, scratch_ref = rest
    for r in range(R):
        rows = (ha_ref[0, R - 1] if r == 0 else hm_ref[0, r - 1],
                hm_ref[0, r],
                hb_ref[0, 0] if r == R - 1 else hm_ref[0, r + 1])
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            piece = rows[ty][tx:tx + W, :]
            if fold:
                piece = piece * a_ref[0]
            scratch_ref[:, t * C:(t + 1) * C] = piece
        acc = jnp.dot(scratch_ref[...], kd_ref[...],
                      preferred_element_type=jnp.float32)   # (W, CG)
        acc = acc + bias_ref[0]
        att = att_ref[0, r] * aw_ref[0]                     # (W, G)
        att_exp = jnp.tile(att, (1, C))
        mixed = (acc.astype(att_exp.dtype) * att_exp)
        out = jnp.dot(mixed, sel_ref[...],
                      preferred_element_type=jnp.float32)   # (W, C)
        out = out * jax.nn.sigmoid(out) + res_ref[0, r].astype(jnp.float32)
        out_ref[0, r] = out.astype(out_ref.dtype)


def _akgm_block_forward_aligned(h, att_sp, kernel, bias, res, nset: int,
                                norm_scale=None, norm_shift=None, attw=None,
                                rows_per_block: int = 0):
    import os
    B, H, W, C = h.shape
    G = nset
    if attw is None:
        attw = jnp.ones((B, G), h.dtype)
    if not rows_per_block:
        rows_per_block = int(os.environ.get('UCDIR_TPU_AKGM_R', '8'))
    R = next(r for r in (rows_per_block, 8, 4, 2, 1) if H % r == 0)
    fold = norm_scale is not None
    hp = jnp.pad(h, ((0, 0), (R, R), (1, 1), (0, 0)))
    kd = _densify_kernel(kernel, C, G)
    kd2 = kd.reshape(9 * C, C * G).astype(h.dtype)
    if fold:
        from ucdir_tpu.ops.conv_pallas import _ring_aligned
        hp = _ring_aligned(hp, jnp.where(jnp.abs(norm_scale) > 1e-12,
                                         -norm_shift / norm_scale,
                                         0.).astype(h.dtype), R)
        bias2 = (bias[None, :]
                 + jnp.tile(norm_shift.astype(jnp.float32), (1, 9))
                 @ kd2.astype(jnp.float32)).astype(h.dtype)[:, None, :]
        extra = [norm_scale.astype(h.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, C), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)]
        b_spec = pl.BlockSpec((1, 1, C * G), lambda b, y: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        bias2 = bias.reshape(1, 1, C * G)
        extra, extra_specs = [], []
        b_spec = pl.BlockSpec((1, 1, C * G), lambda b, y: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    sel = jnp.asarray(_selection_matrix(C, G, h.dtype))

    blk = lambda off: pl.BlockSpec(
        (1, R, W + 2, C), lambda b, y, o=off: (b, y + o, 0, 0),
        memory_space=pltpu.VMEM)
    flops = 2 * B * H * W * 9 * C * C * G + 2 * B * H * W * C * G * C
    return pl.pallas_call(
        functools.partial(_akgm_block_kernel_aligned, C=C, G=G, W=W, R=R,
                          fold=fold),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=(B, H // R),
        in_specs=[
            blk(0), blk(1), blk(2),
            pl.BlockSpec((1, R, W, G), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, y: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C * G), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
            pl.BlockSpec((C * G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, 9 * C), h.dtype)],
        # input fusion OFF: see conv_pallas._conv3x3_forward_aligned
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h.dtype.itemsize * B * H * W * (5 * C + G),
            transcendentals=B * H * W * C),
    )(hp, hp, hp, att_sp, attw.astype(h.dtype)[:, None, :], kd2, bias2,
      sel, res, *extra)


# ---------------------------------------------------------------------------
# v3: GROUP-PACKED fused block tail — zero FLOP waste.
#
# The densified v2 kernel contracts (W, 9C) @ (9C, C*G): the zero-expanded
# grouped kernel wastes G=8x the useful FLOPs (VERDICT r2 weak #5). Packing
# uses the identity
#     out_i = sum_j att_j * (conv_j(h) + b_ij)
#           = (im2col(h) * att_expanded) @ W_packed  +  att @ B
# where W_packed stacks each group's true (9*C/G, C) kernel rows at its input
# channels' rows — so the contraction is (W, 9C) @ (9C, C): G x fewer MXU
# FLOPs, a G x smaller weight operand in VMEM, and no selection matmul.
# att_expanded (lane c -> att[group(c)]) is built per row with a tiny
# (W, G) @ (G, C) 0/1 expansion dot. The attention multiply moves BEFORE the
# contraction (same algebra; bf16 rounding differs ~1e-3 rel from v2).
# ---------------------------------------------------------------------------


def _pack_grouped_kernel(kernel, C: int, G: int):
    """(3, 3, C/G, C*G) grouped-conv kernel -> (9C, C) packed matrix:
    row index = tap*C + c where c = j*(C/G) + cg is the input channel
    (group j, in-group index cg); column i; value kernel[tap, cg, i*G+j]."""
    Cg = C // G
    k9 = kernel.reshape(9, Cg, C, G)          # last axis (C*G) -> (i, j)
    return k9.transpose(0, 3, 1, 2).reshape(9 * C, C)


def _expand_matrix(C: int, G: int, dtype) -> np.ndarray:
    """E[j, c] = 1 where group(c) == j (c // (C/G) == j)."""
    e = np.zeros((G, C), np.float32)
    c = np.arange(C)
    e[c // (C // G), c] = 1.
    return e.astype(dtype)


def _akgm_block_kernel_packed(h_ref, att_ref, aw_ref, kd_ref, bm_ref, e_ref,
                              res_ref, *rest, C, G, W, R, fold):
    if fold:
        a_ref, out_ref, scratch_ref = rest
    else:
        out_ref, scratch_ref = rest
    for r in range(R):
        att = (att_ref[0, r] * aw_ref[0]).astype(jnp.float32)      # (W, G)
        att_exp = jnp.dot(att, e_ref[...],
                          preferred_element_type=jnp.float32)      # (W, C)
        mult = att_exp * a_ref[0] if fold else att_exp
        mult = mult.astype(h_ref.dtype)
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            piece = h_ref[0, r + ty, tx:tx + W, :]
            scratch_ref[:, t * C:(t + 1) * C] = piece * mult
        acc = jnp.dot(scratch_ref[...], kd_ref[...],
                      preferred_element_type=jnp.float32)          # (W, C)
        acc = acc + jnp.dot(att.astype(h_ref.dtype), bm_ref[0],
                            preferred_element_type=jnp.float32)
        out = acc * jax.nn.sigmoid(acc) + res_ref[0, r].astype(jnp.float32)
        out_ref[0, r] = out.astype(out_ref.dtype)


def _akgm_block_forward_packed(h, att_sp, kernel, bias, res, nset: int,
                               norm_scale=None, norm_shift=None, attw=None,
                               rows_per_block: int = 0):
    B, H, W, C = h.shape
    G = nset
    Cg = C // G
    if attw is None:
        attw = jnp.ones((B, G), h.dtype)
    if not rows_per_block:
        rows_per_block = next(r for r in (4, 2, 1) if H % r == 0)
    R = rows_per_block
    fold = norm_scale is not None
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kd = _pack_grouped_kernel(kernel, C, G).astype(h.dtype)        # (9C, C)
    bmat = bias.reshape(C, G).T                                    # (G, C)
    if fold:
        from ucdir_tpu.ops.conv_pallas import _ring
        hp = _ring(hp, jnp.where(jnp.abs(norm_scale) > 1e-12,
                                 -norm_shift / norm_scale, 0.).astype(h.dtype))
        # shift term: c_{j,i} = sum_{tap, c in group j} t_c * kd[tap*C+c, i]
        w_sum = kd.astype(jnp.float32).reshape(9, C, C).sum(0)     # (C, C)
        cmat = (norm_shift.astype(jnp.float32)[:, :, None]
                * w_sum[None]).reshape(B, G, Cg, C).sum(2)         # (B, G, C)
        bm = (bmat[None] + cmat).astype(h.dtype)
        bm_spec = pl.BlockSpec((1, G, C), lambda b, y: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        extra = [norm_scale.astype(h.dtype)[:, None, :]]
        extra_specs = [pl.BlockSpec((1, 1, C), lambda b, y: (b, 0, 0),
                                    memory_space=pltpu.VMEM)]
    else:
        bm = bmat.astype(h.dtype)[None]
        bm_spec = pl.BlockSpec((1, G, C), lambda b, y: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        extra, extra_specs = [], []
    e = jnp.asarray(_expand_matrix(C, G, h.dtype))

    grid = (B, H // R)
    flops = 2 * B * H * W * 9 * C * C + 2 * B * H * W * (G + 1) * C
    return pl.pallas_call(
        functools.partial(_akgm_block_kernel_packed, C=C, G=G, W=W, R=R,
                          fold=fold),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W + 2),
                          _Element(C)),
                         lambda b, y: (b, y * R, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, G), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, y: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            bm_spec,
            pl.BlockSpec((G, C), lambda b, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, R, W, C), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, 9 * C), h.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True] + [False] * (6 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h.dtype.itemsize * B * H * W * (3 * C + G),
            transcendentals=B * H * W * C),
    )(hp, att_sp, attw.astype(h.dtype)[:, None, :], kd, bm, e, res, *extra)


# ---------------------------------------------------------------------------
# v4: per-GROUP fused block tail with the CORRECT candidate pairing and no
# densified FLOP waste (VERDICT r4 next #3).
#
# Reference semantics (/root/reference/model/ucdir.py:132-137): conv output
# o = c*G + j (candidate j of output channel c) belongs to conv group
# g = o // C, and since G | C every candidate of one output channel reads the
# SAME input group g = c // (C/G). The r3 packing study showed attention can
# therefore NOT fold into a shared im2col operand (the packed v3 kernel
# computes a different net), and per-group dots need Cg = C/G-wide operand
# slices — hopeless at C=64 (8 lanes) but lane-viable at C>=256 (Cg>=32).
#
# Formulation (no sub-128-lane loads/stores/slices anywhere):
#   * the GRID gains a group axis: (B, G, H//R), row axis LAST so the per-
#     group weight slab stays VMEM-resident while rows stream;
#   * each program fetches ONLY its group's Cg input channels — the h block
#     is (1, R+2, W, Cg) at Element channel offset g*Cg; in VMEM the block's
#     lane dim IS Cg, so the 9 tap slices are full-lane;
#   * the conv runs as 9 (W, Cg) @ (Cg, C) tap dots against the group's TRUE
#     weights (kg slab (9*Cg, C), sublane-sliced per tap at t*Cg — sublane
#     granularity, not lane) accumulating the (W, C) candidate panel
#     (column m = o - g*C = cg*G + j, j minor — same candidate order as the
#     densified kernels, so the same lane-tiled attention expansion applies);
#   * mix + swish + residual fuse as usual; the per-group output block
#     (1, R, W, Cg) tiles the channel axis block-unit (G * Cg == C).
# MXU cost: the K=Cg dots pad to the 128-lane pass, so the effective MACs are
# 9*W*max(Cg,128)*C*G vs the densified 9*W*C*C*G + W*C*G*C — ~2x fewer at
# C=256 and ~3x at C=512; the COUNTED flops (cost_estimate) are the true
# 18*H*W*C^2, closing the hw-vs-useful MFU gap at these scales. Measured A/B
# gates the default (UCDIR_TPU_AKGM_GROUPED).
# ---------------------------------------------------------------------------


def _group_select_matrix(C: int, G: int, dtype) -> np.ndarray:
    """S[m, cg] = 1 where m // G == cg — reduces a group's (W, C) candidate
    panel (column m = cg*G + j) over its G candidates."""
    m = np.arange(C)
    s = np.zeros((C, C // G), np.float32)
    s[m, m // G] = 1.
    return s.astype(dtype)


def _group_kernel_slabs(kernel, C: int, G: int):
    """(3, 3, Cg, C*G) grouped HWIO kernel -> (G, 9*Cg, C): slab g holds
    group g's true weights; row t*Cg + cg, column m = o - g*C."""
    Cg = C // G
    k9 = kernel.reshape(9, Cg, G, C)        # (C*G) minor -> (g, m): o = g*C+m
    return k9.transpose(2, 0, 1, 3).reshape(G, 9 * Cg, C)


def grouped_tail_enabled(C: int, G: int) -> bool:
    """UCDIR_TPU_AKGM_GROUPED=1: per-group kernel for Cg>=32 (C>=256 at G=8);
    'all' drops the floor to Cg>=8 for experiments."""
    import os
    v = os.environ.get('UCDIR_TPU_AKGM_GROUPED', '0')
    if v == 'all':
        return C % G == 0 and C // G >= 8
    return v == '1' and C % G == 0 and C // G >= 32


def _akgm_block_kernel_grouped(h_ref, att_ref, aw_ref, kg_ref, bg_ref,
                               selg_ref, res_ref, v_ref, *rest,
                               Cg, C, G, W, R, fold):
    a_ref, t_ref = (rest[0], rest[1]) if fold else (None, None)
    n = 2 if fold else 0
    out_ref = rest[n]
    pad_ref = rest[n + 1]
    _stage_padfree(h_ref, pad_ref, v_ref[0],
                   a_ref[0] if fold else None,
                   t_ref[0] if fold else None, R=R, W=W, C=Cg, row_axis=2)
    for r in range(R):
        acc = None
        for t, (ty, tx) in enumerate(
                [(y, x) for y in range(3) for x in range(3)]):
            d = jnp.dot(pad_ref[r + ty, tx:tx + W, :],
                        kg_ref[0, t * Cg:(t + 1) * Cg, :],
                        preferred_element_type=jnp.float32)      # (W, C)
            acc = d if acc is None else acc + d
        acc = acc + bg_ref[0]
        att = att_ref[0, r] * aw_ref[0]                          # (W, G)
        att_exp = jnp.tile(att, (1, Cg))                         # m -> att[m%G]
        mixed = (acc.astype(att_exp.dtype) * att_exp)
        out = jnp.dot(mixed, selg_ref[...],
                      preferred_element_type=jnp.float32)        # (W, Cg)
        out = out * jax.nn.sigmoid(out) + res_ref[0, r].astype(jnp.float32)
        out_ref[0, r] = out.astype(out_ref.dtype)


def _akgm_block_forward_grouped(h, att_sp, kernel, bias, res, nset: int,
                                norm_scale=None, norm_shift=None, attw=None,
                                rows_per_block: int = 0):
    import os
    B, H, W, C = h.shape
    G = nset
    Cg = C // G
    if attw is None:
        attw = jnp.ones((B, G), h.dtype)
    if not rows_per_block:
        pref = int(os.environ.get('UCDIR_TPU_AKGM_R', '4'))
        rows_per_block = next(r for r in (pref, 4, 2, 1)
                              if H % r == 0 and H >= r + 2 and H // r >= 2)
    R = rows_per_block
    fold = norm_scale is not None
    kg = _group_kernel_slabs(kernel, C, G).astype(h.dtype)     # (G, 9Cg, C)
    bg = bias.reshape(G, 1, C).astype(jnp.float32)
    selg = jnp.asarray(_group_select_matrix(C, G, h.dtype))
    v2 = jnp.zeros((1, 1, Cg), h.dtype)
    if fold:
        extra = [norm_scale.astype(h.dtype).reshape(B, 1, C),
                 norm_shift.astype(h.dtype).reshape(B, 1, C)]
        extra_specs = [pl.BlockSpec((1, 1, Cg), lambda b, g, y: (b, 0, g),
                                    memory_space=pltpu.VMEM)] * 2
    else:
        extra, extra_specs = [], []

    grid = (B, G, H // R)      # row axis LAST: kg slab resident across rows
    flops = 2 * B * H * W * 9 * Cg * C * G + 2 * B * H * W * C * C
    return pl.pallas_call(
        functools.partial(_akgm_block_kernel_grouped, Cg=Cg, C=C, G=G,
                          W=W, R=R, fold=fold),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(1), _Element(R + 2), _Element(W),
                          _Element(Cg)),
                         lambda b, g, y: (b, jnp.clip(y * R - 1, 0, H - R - 2),
                                          0, g * Cg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, G), lambda b, g, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, g, y: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * Cg, C), lambda b, g, y: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, g, y: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Cg), lambda b, g, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W, Cg), lambda b, g, y: (b, y, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cg), lambda b, g, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, R, W, Cg), lambda b, g, y: (b, y, 0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R + 2, W + 2, Cg), h.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            allow_input_fusion=[True] + [False] * (7 + len(extra))),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h.dtype.itemsize * B * H * W * (3 * C + G * G),
            transcendentals=B * H * W * C),
    )(h, att_sp, attw.astype(h.dtype)[:, None, :], kg, bg, selg, res, v2,
      *extra)


def _block_ref(h, att_sp, kernel, bias, res, nset, norm_scale=None,
               norm_shift=None, attw=None):
    if norm_scale is not None:
        h = h * norm_scale[:, None, None, :] + norm_shift[:, None, None, :]
    if attw is not None:
        att_sp = att_sp * attw[:, None, None, :]
    y = akgm_mix_reference(h, att_sp, kernel, bias, nset)
    return y * jax.nn.sigmoid(y) + res


def _block_fwd(h, att_sp, kernel, bias, res, nset, norm_scale, norm_shift,
               attw):
    out = _akgm_block_forward(h, att_sp, kernel, bias, res, nset,
                              norm_scale, norm_shift, attw)
    return out, (h, att_sp, kernel, bias, res, norm_scale, norm_shift, attw)


def _use_pallas_bwd(H, W, C, R):
    """Fused-backward dispatch gate: real TPU, Element specs available, the
    2-row-halo staging fits (H >= R+4, >=2 row blocks), and the (W, 9CG)
    transposed-conv scratch stays VMEM-sane (train-crop scale)."""
    import os
    if os.environ.get('UCDIR_TPU_PALLAS_BWD', 'auto') == '0':
        return False
    return (HAS_ELEMENT and jax.devices()[0].platform == 'tpu'
            and H % R == 0 and H >= R + 4 and H // R >= 2 and W <= 1024)


def _block_bwd(nset, residuals, g):
    h, att_sp, kernel, bias, res, ns, nt, aw = residuals
    B, H, W, C = h.shape
    R = next(r for r in (4, 2, 1) if H % r == 0)
    if _use_pallas_bwd(H, W, C, R):
        return _akgm_block_backward(h, att_sp, kernel, bias, res, g, nset,
                                    ns, nt, aw, R)
    args = [h, att_sp, kernel, bias, res]
    opt = [ns, nt, aw]
    live = [i for i, a in enumerate(opt) if a is not None]

    def ref(*xs):
        base, rest = xs[:5], xs[5:]
        full = [None, None, None]
        for i, r in zip(live, rest):
            full[i] = r
        return _block_ref(*base, nset, *full)
    _, vjp = jax.vjp(ref, *args, *[opt[i] for i in live])
    grads = list(vjp(g))
    out = grads[:5]
    rest = grads[5:]
    full = [None, None, None]
    for i, r in zip(live, rest):
        full[i] = r
    return tuple(out) + tuple(full)


akgm_block_pallas.defvjp(_block_fwd, _block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def akgm_block_stats_pallas(h, att_sp, kernel, bias, res, nset: int,
                            norm_scale=None, norm_shift=None, attw=None):
    """akgm_block_pallas that ALSO emits the block output's (B, C) f32
    sum/sumsq from inside the kernel — the producer half of the chained
    GroupNorm(1) stats (the block output is the NEXT block's norm1 input).
    Returns (out, s, q)."""
    return _akgm_block_forward(h, att_sp, kernel, bias, res, nset,
                               norm_scale, norm_shift, attw, emit_stats=True)


def _blocks_fwd(h, att_sp, kernel, bias, res, nset, norm_scale, norm_shift,
                attw):
    out, s, q = _akgm_block_forward(h, att_sp, kernel, bias, res, nset,
                                    norm_scale, norm_shift, attw,
                                    emit_stats=True)
    return (out, s, q), (h, att_sp, kernel, bias, res, norm_scale,
                         norm_shift, attw, out)


def _blocks_bwd(nset, residuals, g):
    *res8, out = residuals
    go, ds, dq = g
    go = (go.astype(jnp.float32) + ds.astype(jnp.float32)[:, None, None, :]
          + 2. * out.astype(jnp.float32)
          * dq.astype(jnp.float32)[:, None, None, :]).astype(out.dtype)
    return _block_bwd(nset, tuple(res8), go)


akgm_block_stats_pallas.defvjp(_blocks_fwd, _blocks_bwd)
