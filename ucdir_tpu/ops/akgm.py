"""AKGM candidate-bank mix: grouped 3x3 conv -> per-pixel weighted sum.

The computation (reference: /root/reference/model/ucdir.py:132-137):
    hset = grouped_conv3x3(h)            # (b, H, W, C*G), groups=G
    hset = reshape(b, H, W, C, G)        # candidate j of channel i at i*G+j
    out  = sum_j hset[..., j] * att[..., j]

The torch implementation materializes the (b, C, G, H, W) tensor in HBM — a
G-fold activation blow-up. `akgm_mix` computes the same thing; the Pallas path
(`use_pallas=True`) keeps the candidate banks in VMEM, tiling over rows, so HBM
traffic is read(h) + read(att) + write(out) only.

Grouped-conv channel order: XLA (like torch) emits output features group-major
(output feature o belongs to group o // (C_out/G)), so the (C, G) reshape below
matches torch's `.view(b, dim_out, nset, H, w)` exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _grouped_conv3x3(h, kernel, bias, groups: int):
    """NHWC grouped 3x3 conv, padding SAME(1)."""
    y = lax.conv_general_dilated(
        h, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups)
    if bias is not None:
        y = y + bias
    return y


def akgm_mix_reference(h, att_sp, kernel, bias, nset: int):
    """Plain-XLA reference: materializes the (b,H,W,C,G) candidate tensor.

    h: (b,H,W,C); att_sp: (b,H,W,G); kernel: (3,3,C//G, C*G) HWIO; bias (C*G,).
    Returns (b,H,W,C).
    """
    b, H, W, C = h.shape
    hset = _grouped_conv3x3(h, kernel, bias, nset)        # (b,H,W,C*G)
    hset = hset.reshape(b, H, W, C, nset)
    return jnp.einsum('bhwcj,bhwj->bhwc', hset, att_sp,
                      preferred_element_type=h.dtype)


def _densify_kernel(kernel, C: int, G: int):
    """Zero-expand a grouped HWIO kernel (3,3,C/G,C*G) to dense (3,3,C,C*G).

    XLA:TPU lowers feature-grouped convs poorly (measured 0.9 TFLOP/s at
    672^2/C=64 vs 3.3x faster as a dense conv with zero blocks, despite the
    G-fold FLOP waste) — the MXU eats the zeros for free relative to the
    grouped lowering.
    """
    cg = C // G
    kd = jnp.zeros((3, 3, C, C * G), kernel.dtype)
    for g in range(G):
        kd = kd.at[:, :, g * cg:(g + 1) * cg, g * C:(g + 1) * C].set(
            kernel[:, :, :, g * C:(g + 1) * C])
    return kd


def akgm_mix_densified(h, att_sp, kernel, bias, nset: int):
    """Same math as the reference, grouped conv expressed as a dense conv."""
    b, H, W, C = h.shape
    kd = _densify_kernel(kernel, C, nset)
    hset = lax.conv_general_dilated(
        h, kd, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
    hset = hset.reshape(b, H, W, C, nset)
    return jnp.einsum('bhwcj,bhwj->bhwc', hset, att_sp,
                      preferred_element_type=h.dtype)


def akgm_mix_smallconvs(h, att_sp, kernel, bias, nset: int):
    """Same math as G separate dense convs (C/G -> C) with immediate per-group
    attention contraction — fastest XLA formulation at the deep scales
    (measured: 168^2/C=256 2.7ms, 84^2/C=512 2.3ms vs 4.1/3.5 densified)."""
    b, H, W, C = h.shape
    G = nset
    cg = C // G
    outs = []
    for g in range(G):
        kg = kernel[:, :, :, g * C:(g + 1) * C]
        hg = h[..., g * cg:(g + 1) * cg]
        yg = lax.conv_general_dilated(
            hg, kg, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias[g * C:(g + 1) * C]
        yg = yg.reshape(b, H, W, cg, G)
        outs.append(jnp.einsum('bhwcj,bhwj->bhwc', yg, att_sp,
                               preferred_element_type=h.dtype))
    return jnp.concatenate(outs, axis=-1)


def akgm_mix_batchgroup(h, att_sp, kernel, bias, nset: int):
    """Groups moved to the conv *batch* dim (batch_group_count=G): true FLOPs,
    no zero expansion. Input batch is laid out group-major ((g*b+bb) rows);
    XLA's batch-group semantics assign output-feature group g to batch group
    g, which is exactly the canonical grouped-conv output order."""
    b, H, W, C = h.shape
    G = nset
    cg = C // G
    hg = h.reshape(b, H, W, G, cg).transpose(3, 0, 1, 2, 4)
    hg = hg.reshape(G * b, H, W, cg)
    y = lax.conv_general_dilated(
        hg, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        batch_group_count=G) + bias
    y = y.reshape(b, H, W, C, G)
    return jnp.einsum('bhwcj,bhwj->bhwc', y, att_sp,
                      preferred_element_type=h.dtype)


def akgm_mix_patches(h, att_sp, kernel, bias, nset: int):
    """im2col + G-batched matmul with a 9*(C/G) contraction: true FLOPs at
    ~9x better MXU contraction depth than per-group small convs. The patch
    tensor is a 9x intermediate (vs the densified path's G=8x candidate
    tensor, which this replaces at equal HBM cost but 8x fewer FLOPs)."""
    b, H, W, C = h.shape
    G = nset
    cg = C // G
    # (b,H,W,C*9); feature index = c*9 + tap ("chw collapsed" per jax docs)
    p = lax.conv_general_dilated_patches(
        h, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    p = p.reshape(b, H, W, G, cg * 9)
    # weights (G, cg*9, C): w[g, i*9+t, cl] = kernel[ty, tx, i, g*C+cl]
    w = kernel.reshape(9, cg, C * G).transpose(1, 0, 2)       # (cg, 9, CG)
    w = w.reshape(cg * 9, G, C).transpose(1, 0, 2)            # (G, cg*9, C)
    y = jnp.einsum('bhwgk,gkc->bhwgc', p, w,
                   preferred_element_type=h.dtype) + bias.reshape(G, C)
    y = y.reshape(b, H, W, C, G)   # group-major flat == reference (C,G) view
    return jnp.einsum('bhwcj,bhwj->bhwc', y, att_sp,
                      preferred_element_type=h.dtype)


# VMEM budget for the Pallas kernel's resident zero-expanded weights
# (9, C, C*G); beyond this the kernel cannot fit alongside the pipeline
# buffers, and at those depths (small spatial dims) the densified XLA path is
# just as fast anyway (measured: 84^2/C=512 pallas 3.35ms vs XLA 3.46ms).
_PALLAS_WEIGHT_BUDGET_BYTES = 12 * 1024 * 1024


_FORMS = {}  # name -> fn, populated below for the env-var override


def akgm_mix(h, att_sp, kernel, bias, nset: int, use_pallas: bool = False,
             split_channels: int = 256):
    """Dispatch on measured TPU costs:
      * bf16, C >= split_channels (deep scales): G small convs;
      * otherwise densified dense conv (XLA) or the fused Pallas kernel when
        `use_pallas` and the resident weights fit VMEM.
    (fp32 full-model runs measured FASTER with densified everywhere, despite
    isolated per-op numbers favoring small convs — in-model fusion effects.)

    UCDIR_TPU_AKGM_FORM=<reference|densified|smallconvs|batchgroup|patches>
    forces one formulation everywhere (perf experiments only)."""
    import os
    forced = os.environ.get('UCDIR_TPU_AKGM_FORM')
    if forced:
        # read at TRACE time: changing the env var after a function is
        # jit-cached has no effect (perf-experiment knob only)
        if forced not in _FORMS:
            raise ValueError(
                'UCDIR_TPU_AKGM_FORM=%r unknown; valid forms: %s'
                % (forced, ', '.join(sorted(_FORMS))))
        return _FORMS[forced](h, att_sp, kernel, bias, nset)
    C = h.shape[-1]
    if C >= split_channels and h.dtype == jnp.bfloat16:
        return akgm_mix_smallconvs(h, att_sp, kernel, bias, nset)
    # r2 in-model A/B at tile size (1024^2 bf16, tools/inmodel_pallas_ab.py):
    # pallas wins at C=128 (block 10.0 vs 12.3 ms) but not at C=64 (25.7 vs
    # 24.8 — XLA fuses the mix epilogue into the densified conv there).
    if (h.dtype == jnp.bfloat16 and C != 128
            and os.environ.get('UCDIR_TPU_PALLAS_ALL') != '1'):
        use_pallas = False
    if use_pallas and jax.devices()[0].platform != 'tpu':
        use_pallas = False   # Mosaic kernels need real TPU (CPU tests/dryrun)
    kd_bytes = 9 * C * C * nset * h.dtype.itemsize
    if use_pallas and kd_bytes <= _PALLAS_WEIGHT_BUDGET_BYTES:
        from ucdir_tpu.ops import akgm_pallas
        if akgm_pallas.HAS_ELEMENT:
            return akgm_pallas.akgm_mix_pallas(h, att_sp, kernel, bias, nset)
        import warnings
        warnings.warn('pallas Element block dims unavailable in this jax; '
                      'falling back to the XLA densified AKGM', stacklevel=2)
    return akgm_mix_densified(h, att_sp, kernel, bias, nset)


_FORMS.update(reference=akgm_mix_reference, densified=akgm_mix_densified,
              smallconvs=akgm_mix_smallconvs, batchgroup=akgm_mix_batchgroup,
              patches=akgm_mix_patches)


def akgm_block_tail(h, att_sp, kernel, bias, res, nset: int,
                    use_pallas: bool = False, split_channels: int = 256,
                    norm_scale=None, norm_shift=None, attw=None,
                    emit_stats: bool = False):
    """The AKGM block tail `swish(akgm_mix(h, att)) + res` as ONE op.

    On TPU with `use_pallas` this runs the fused Pallas kernel
    (ops/akgm_pallas.akgm_block_pallas): candidate banks stay in VMEM, the
    epilogue never round-trips HBM, and the (W, 9C)@(9C, CG) im2col dot keeps
    the MXU full — measured 7.7 ms vs 10.9 (v1+XLA epilogue) vs ~15 (XLA
    densified + relayout copies) per 1024^2/C=64 call. Elsewhere it composes
    the XLA formulations from `akgm_mix`.

    emit_stats: also return the block output's GroupNorm(1) totals —
    ((B,) sum, (B,) sumsq) f32 or None — as a second value (the chained
    norm1 stats of the NEXT block; see ops.chain_stats_mode).
    """
    import os
    C = h.shape[-1]
    # The C=256 tail is spatial-size sensitive: it WINS the whole-image SID
    # program at /4 = 392x568 (783 -> 742 ms/step, r3) but LOSES small maps
    # (512px program 2.48 -> 2.86 s/img; r2 tiled: 1133 -> 1204 ms/step at
    # 256^2) — the 9.4 MB kd2 only amortizes on big grids. Gate C=256 on
    # area; UCDIR_TPU_TAIL_MAX_C re-measures.
    max_c = int(os.environ.get('UCDIR_TPU_TAIL_MAX_C', '256'))
    if C == 256 and h.shape[1] * h.shape[2] < 100_000 \
            and 'UCDIR_TPU_TAIL_MAX_C' not in os.environ:
        max_c = 255
    # the v4 per-group kernel (correct pairing, no densified waste) lifts the
    # channel cap — its weight slabs are 9*C*C/G bytes (G-fold smaller than
    # the densified kd2), so C=512 fits easily (UCDIR_TPU_AKGM_GROUPED=1)
    from ucdir_tpu.ops.akgm_pallas import grouped_tail_enabled
    c_ok = C <= max_c or grouped_tail_enabled(C, nset)
    pallas_ok = (use_pallas and c_ok
                 and jax.devices()[0].platform == 'tpu'
                 and os.environ.get('UCDIR_TPU_AKGM_FORM') is None
                 and os.environ.get('UCDIR_TPU_NO_FUSED_TAIL') != '1')
    from ucdir_tpu.ops.conv_pallas import _emit_mode, _totals, _stats_of
    mode = _emit_mode(emit_stats)
    if pallas_ok:
        from ucdir_tpu.ops import akgm_pallas
        if akgm_pallas.HAS_ELEMENT:
            # named so remat policies can SAVE kernel outputs instead of
            # re-running the kernel in the backward pass (train/step remat
            # policy save_only_these_names('pallas_out'))
            from jax.ad_checkpoint import checkpoint_name
            if mode == 'auto':
                out, s, q = akgm_pallas.akgm_block_stats_pallas(
                    h, att_sp, kernel, bias, res, nset, norm_scale,
                    norm_shift, attw)
                return checkpoint_name(out, 'pallas_out'), _totals(s, q)
            out = akgm_pallas.akgm_block_pallas(h, att_sp, kernel, bias,
                                                res, nset, norm_scale,
                                                norm_shift, attw)
            out = checkpoint_name(out, 'pallas_out')
            if emit_stats:
                return out, (_totals(*_stats_of(out)) if mode == 'xla'
                             else None)
            return out
    if norm_scale is not None:
        h = h * norm_scale[:, None, None, :] + norm_shift[:, None, None, :]
    if attw is not None:
        att_sp = att_sp * attw[:, None, None, :]
    y = akgm_mix(h, att_sp, kernel, bias, nset, use_pallas=use_pallas,
                 split_channels=split_channels)
    out = y * jax.nn.sigmoid(y) + res
    if emit_stats:
        return out, (_totals(*_stats_of(out)) if mode == 'xla' else None)
    return out
