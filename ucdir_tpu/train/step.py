"""Jitted train/eval steps with data-parallel shardings.

One fused XLA program per optimizer step: gamma/noise sampling, predictor +
denoiser forward, backward, grad all-reduce (implicit in jit partitioning over
the 'data' mesh axis), optimizer update, EMA blend. The reference splits this
across host python + DDP hooks (/root/reference/model/model.py:104-122).

Loss normalization matches model.py:107-109: sum-reduced pixel loss divided by
b*c*h*w of the *global* batch (equivalent to DDP's mean-of-per-rank-normalized
losses when shards are equal).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from ucdir_tpu.diffusion.sampler import (sample_continuous_gamma,
                                         super_resolution, ddpm_scan_segment,
                                         _snapshot_slots)
from ucdir_tpu.schedule import NoiseSchedule
from ucdir_tpu.train.state import TrainState


def _eval_traced(fn):
    """Trace the wrapped eval function under conv_pallas.eval_dispatch():
    the conv kernels' spatial floor relaxes to the measured eval optimum
    (MIN_DIM 196) inside eval programs only — in a train forward the same
    kernels pair with backward recompute and lose 2.7x (r4 tr-min196)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from ucdir_tpu.ops.conv_pallas import eval_dispatch
        with eval_dispatch():
            return fn(*args, **kwargs)
    return wrapped


def make_train_step(module, sched: NoiseSchedule, mesh: Optional[Mesh] = None,
                    donate: bool = True, compute_dtype=None) -> Callable:
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: {'HR': (B,H,W,C), 'SR': (B,H,W,C)} — global batch; when a mesh is
    given, inputs are sharded batch-major over the 'data' axis and params are
    replicated, so jit inserts the gradient psum over ICI.

    compute_dtype (e.g. jnp.bfloat16): mixed precision — master params,
    optimizer state and the loss stay f32; forward/backward run in the compute
    dtype (gradients flow through the cast back to the f32 masters).
    """

    refine_mode = getattr(module, 'sample_mode', 'reverse') == 'refine'

    def train_step(state: TrainState, batch, key):
        b, h, w, c = batch['HR'].shape
        k_gamma, k_noise, k_drop = jax.random.split(key, 3)
        if refine_mode:
            # NoDiffusion conditions on the constant
            # sqrt_alphas_cumprod_prev[1] (diffusion.py:638-644)
            gammas = jnp.full((b, 1), sched.sqrt_alphas_cumprod_prev[1],
                              batch['HR'].dtype)
        else:
            gammas = sample_continuous_gamma(k_gamma, sched, b)
        noise = jax.random.normal(k_noise, batch['HR'].shape,
                                  dtype=batch['HR'].dtype)

        if compute_dtype is not None:
            net_batch = {k: v.astype(compute_dtype) for k, v in batch.items()}
            net_gammas = gammas.astype(compute_dtype)
            net_noise = noise.astype(compute_dtype)
        else:
            net_batch, net_gammas, net_noise = batch, gammas, noise

        def loss_fn(params):
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(compute_dtype), params)
            l = module.apply({'params': params}, net_batch, net_gammas,
                             net_noise, deterministic=False,
                             rngs={'dropout': k_drop})
            return l.astype(jnp.float32) / (b * c * h * w)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, {'l_pix': loss}

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    batch_shardings = {'HR': data, 'SR': data}
    return jax.jit(
        train_step,
        in_shardings=(None, batch_shardings, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(module, sched: NoiseSchedule, pad: int = 64,
                   continous: bool = False, sampler: str = 'ddpm',
                   sampling_timesteps: int = 5, eta: float = 1.0,
                   compute_dtype=None, bucket: int = 0,
                   mesh: Optional[Mesh] = None,
                   tile: Optional[dict] = None,
                   seg_steps: Optional[int] = None) -> Callable:
    """Returns eval_step(variables, sr_img, key) -> (sr, initx[, snaps]).

    Reproduces DDPM.test (model.py:124-138): reflect-pad the degraded input by
    `pad`, run super_resolution, crop. Everything in one jit; re-compiles per
    distinct input shape.

    mesh: the data-parallel device mesh — the integrated multi-chip inference
    path (reference headline mode: 8-way DDP val, README.md:54-58). Inputs
    larger than skip^2 after padding run the intra-step tiled denoiser
    (utils/util.py:108-146) with tile chunks sharded over the mesh's 'data'
    axis (one chunk of `n_devices` tiles per UNet call, reassembly over ICI);
    smaller inputs shard the image batch axis when it divides the mesh.

    tile: overrides {skip, padding, tile_chunk, data_axis} for the tiled
    path; defaults skip=1024/padding=64 (ucdir.py:295-300) and
    tile_chunk=|mesh|, data_axis='data' when a mesh is given.

    bucket > 0: additionally reflect-pad H/W up to multiples of `bucket`
    before the 64-px pad, so variable-size datasets (e.g. the imagenet JPEG
    task) reuse a small set of compiled programs instead of recompiling the
    whole sampling scan per image. Slight border deviation vs the reference
    (extra reflected context), interior unchanged.

    seg_steps > 0 (ddpm only): run the reverse process as ceil(T/seg_steps)
    device executions with the carry round-tripping through jit boundaries —
    bit-identical to the single-scan program (same RNG stream), but each
    execution stays short. Needed where single device executions have a
    wall-clock ceiling (tunneled TPUs: a 50-step SID-size program runs ~81s
    and trips the RPC deadline); also gives natural progress/preemption
    points. Overhead: one dispatch (~ms) per segment.
    """
    explicit_tile = tile is not None
    tile = dict(tile or {})
    if mesh is not None:
        tile.setdefault('tile_chunk', int(mesh.shape['data']))
        tile.setdefault('data_axis', 'data')
    tile.setdefault('skip', 1024)
    tile.setdefault('padding', 64)
    skip = int(tile['skip'])

    def should_tile(h, w):
        # Reference trigger: tile everything >skip^2 (ucdir.py:295-300 —
        # a GPU-memory workaround, at a measured 1.57x pixel-overlap cost at
        # SID size). TPU-first default: run the UNet on the WHOLE image
        # while it fits HBM (UCDIR_TPU_UNTILED_MAX_PX, ~16 GB chip), tiling
        # only above that — no overlap recompute, no seams, full receptive
        # field. An explicitly-configured tile dict (CLI/tests/multi-chip
        # meshes) keeps the strict reference trigger.
        if h * w <= skip * skip:
            return False
        if explicit_tile or mesh is not None:
            return True
        import os
        return h * w > int(os.environ.get('UCDIR_TPU_UNTILED_MAX_PX',
                                          str(4_300_000)))

    if (seg_steps and sampler == 'ddpm' and not bucket
            and getattr(module, 'sample_mode', 'reverse') == 'reverse'):
        return _make_segmented_eval_step(
            module, sched, pad=pad, continous=continous,
            compute_dtype=compute_dtype, mesh=mesh, tile=tile, skip=skip,
            seg_steps=int(seg_steps), should_tile=should_tile)

    def eval_step(variables, sr_img, key):
        x = jnp.pad(sr_img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode='reflect') if pad else sr_img
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        tile_opts = tile if should_tile(h, w) else None
        if (tile_opts is None and mesh is not None and b > 1
                and b % mesh.shape['data'] == 0):
            # small images: parallelize whole images across chips instead
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P('data')))
        out = super_resolution(module, variables, sched, x, key,
                               continous=continous, sampler=sampler,
                               sampling_timesteps=sampling_timesteps, eta=eta,
                               compute_dtype=compute_dtype,
                               tile_opts=tile_opts)
        if pad:
            out = tuple(o[..., pad:-pad, pad:-pad, :] if o is not None and o.ndim >= 4
                        else o for o in out)
        return out

    jitted = jax.jit(_eval_traced(eval_step))

    if mesh is not None:
        _inner = jitted

        def jitted(variables, sr_img, key):  # noqa: F811 - mesh wrapper
            with jax.set_mesh(mesh):
                return _inner(variables, sr_img, key)

    if not bucket:
        return jitted

    def bucketed(variables, sr_img, key):
        h, w = sr_img.shape[1], sr_img.shape[2]
        bh, bw = (-h) % bucket, (-w) % bucket
        x = jnp.pad(sr_img, ((0, 0), (0, bh), (0, bw), (0, 0)),
                    mode='reflect') if (bh or bw) else sr_img
        out = jitted(variables, x, key)
        if bh or bw:
            out = tuple(o[..., :o.shape[-3] - bh, :o.shape[-2] - bw, :]
                        if o is not None and o.ndim >= 4 else o for o in out)
        return out

    return bucketed


def _make_segmented_eval_step(module, sched: NoiseSchedule, pad: int,
                              continous: bool, compute_dtype, mesh,
                              tile: dict, skip: int, seg_steps: int,
                              should_tile=None):
    if should_tile is None:
        should_tile = lambda h, w: h * w > skip * skip
    """Segmented DDPM eval (see make_eval_step seg_steps): prep + K segment
    executions + eager finish. Bit-identical to the one-scan path — the RNG
    stream, snapshot slots and posterior math are shared (ddpm_scan_segment)."""
    T = sched.num_timesteps
    slots_np, n_snap = _snapshot_slots(T)
    ts_np = np.arange(T - 1, -1, -1, dtype=np.int32)
    has_pred = getattr(module, 'has_predictor', False)
    guide_mode = getattr(module, 'guide_in_sample', None)

    def _cast_all(variables, x):
        if compute_dtype is None:
            return variables, x
        return (jax.tree_util.tree_map(lambda p: p.astype(compute_dtype),
                                       variables), x.astype(compute_dtype))

    def prep(variables, sr_img, key):
        x = jnp.pad(sr_img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode='reflect') if pad else sr_img
        net_vars, x_net = _cast_all(variables, x)
        initx = (module.apply(net_vars, x_net,
                              method='predict_init').astype(x.dtype)
                 if has_pred else None)
        guide = {'initx': initx, 'degraded': x, None: None}[guide_mode]
        key, k0 = jax.random.split(key)
        img0 = jax.random.normal(k0, x.shape, x.dtype)
        buf0 = (jnp.zeros((n_snap,) + x.shape, x.dtype) if continous else None)
        return x, initx, guide, img0, buf0, key

    def segment(variables, x, guide, img, key, buf, ts, slots):
        net_vars, x_net = _cast_all(variables, x)
        net_dtype = x_net.dtype
        guide_net = guide.astype(net_dtype) if guide is not None else None
        h, w = x.shape[1], x.shape[2]
        if should_tile(h, w):
            from ucdir_tpu.parallel.tiled import tiled_denoise_fn
            tiled = tiled_denoise_fn(
                module.denoise_fn, net_vars['params']['denoise_fn'], x_net,
                guide_net if guide_net is not None else x_net,
                skip=skip, padding=int(tile['padding']),
                tile_chunk=int(tile.get('tile_chunk') or 1),
                data_axis=tile.get('data_axis'))

            def denoise(im, nl):
                return tiled(im.astype(net_dtype),
                             nl.astype(net_dtype)).astype(im.dtype)
        else:
            from ucdir_tpu.diffusion.sampler import _hoisted_guide_maps
            gmaps = _hoisted_guide_maps(module, net_vars, guide_net)

            def denoise(im, nl):
                net_in = jnp.concatenate([x_net, im.astype(net_dtype)],
                                         axis=-1)
                return module.apply(net_vars, net_in, nl.astype(net_dtype),
                                    guide_net, method='denoise',
                                    guide_maps=gmaps).astype(im.dtype)
        return ddpm_scan_segment(denoise, sched, img, key, buf, ts, slots)

    prep_j = jax.jit(_eval_traced(prep))
    seg_j = jax.jit(_eval_traced(segment))

    # ---- tile-RESIDENT segmented path (parallel/resident.py) -------------
    # carries the TILED state across segment executions; one conditioning
    # prepare per image (vs per segment), exchange instead of reassembly.
    _res_cache = {}

    def _resident_fns(shape):
        if shape in _res_cache:
            return _res_cache[shape]
        from ucdir_tpu.parallel.resident import ResidentSampler
        b, h, w, _ = shape
        rs = ResidentSampler(module.denoise_fn, h, w, b, skip=skip,
                             padding=int(tile['padding']),
                             tile_chunk=int(tile.get('tile_chunk') or 1),
                             data_axis=tile.get('data_axis'))

        def prep_r(variables, sr_img, key):
            x = jnp.pad(sr_img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode='reflect') if pad else sr_img
            net_vars, x_net = _cast_all(variables, x)
            initx = (module.apply(net_vars, x_net,
                                  method='predict_init').astype(x.dtype)
                     if has_pred else None)
            guide = {'initx': initx, 'degraded': x, None: None}[guide_mode]
            guide_net = (guide.astype(x_net.dtype) if guide is not None
                         else x_net)
            ctx = rs.prepare(net_vars['params']['denoise_fn'], x_net,
                             guide_net)
            key, k0 = jax.random.split(key)
            img0 = jax.random.normal(k0, x.shape, x.dtype)
            tw = rs.init_tiles(img0)
            buf0 = (jnp.zeros((n_snap,) + tw.shape, tw.dtype)
                    if continous else None)
            return x, initx, ctx, tw, buf0, key

        def seg_r(variables, ctx, tw, key, buf, ts, slots):
            net_vars = (jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), variables)
                if compute_dtype is not None else variables)
            nd = (compute_dtype if compute_dtype is not None else tw.dtype)
            return rs.scan_segment(net_vars['params']['denoise_fn'], ctx,
                                   sched, tw, key, buf, ts, slots,
                                   net_dtype=nd)

        def fin_r(x, tw, buf):
            img = rs.materialize(tw)
            if continous:
                snaps = jax.lax.map(rs.materialize, buf)
                return img, jnp.concatenate([x[None], snaps], axis=0)
            return img, None

        fns = (jax.jit(_eval_traced(prep_r)),
               jax.jit(_eval_traced(seg_r), donate_argnums=(2, 4)),
               jax.jit(_eval_traced(fin_r)), rs)
        _res_cache[shape] = fns
        return fns

    def runner(variables, sr_img, key):
        import contextlib
        import os
        ctxm = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        b = sr_img.shape[0]
        h, w = sr_img.shape[1] + 2 * pad, sr_img.shape[2] + 2 * pad
        # tile-resident default only when tiles are sharded over a mesh
        # (its win is the ppermute layout + one-prepare-per-image); on a
        # single chip the reassembling path measured ~1% faster per step
        # (r4 18-step A/B: 1102 vs 1115 ms true per-step at SID size).
        # UCDIR_TPU_RESIDENT=1 forces it on, UCDIR_TPU_NO_RESIDENT=1 off.
        resident = (should_tile(h, w)
                    and os.environ.get('UCDIR_TPU_NO_RESIDENT') != '1'
                    and (int(tile.get('tile_chunk') or 1) > 1
                         or os.environ.get('UCDIR_TPU_RESIDENT') == '1'))
        with ctxm:
            if resident:
                prep_r, seg_r, fin_r, _ = _resident_fns(
                    (b, h, w, sr_img.shape[3]))
                x, initx, rctx, tw, buf, key = prep_r(variables, sr_img, key)
                for s in range(0, T, seg_steps):
                    e = min(s + seg_steps, T)
                    tw, key, buf = seg_r(variables, rctx, tw, key, buf,
                                         jnp.asarray(ts_np[s:e]),
                                         jnp.asarray(slots_np[s:e]))
                img, snaps = fin_r(x, tw, buf)
            else:
                x, initx, guide, img, buf, key = prep_j(variables, sr_img, key)
                for s in range(0, T, seg_steps):
                    e = min(s + seg_steps, T)
                    img, key, buf = seg_j(variables, x, guide, img, key, buf,
                                          jnp.asarray(ts_np[s:e]),
                                          jnp.asarray(slots_np[s:e]))
                snaps = (jnp.concatenate([x[None], buf], axis=0)
                         if continous else None)
        if initx is not None:
            img = img + initx
        out = [img, initx]
        if continous:
            if initx is not None:
                snaps = snaps + initx[None]
            out.append(snaps)
        if pad:
            out = [o[..., pad:-pad, pad:-pad, :] if o is not None else o
                   for o in out]
        return tuple(out)

    return runner
