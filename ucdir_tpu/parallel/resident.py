"""Tile-RESIDENT reverse diffusion — the state stays tiled across all T steps.

The reference (and round-2 port) re-materializes the full latent every
denoising step: pad -> gather all overlapping tiles -> UNet -> write centers
back -> posterior update on the full image (utils/util.py:108-146 invoked from
model/ucdir.py:295-300, 50x per image). That costs a full-image
gather/reassemble per step (~9% of the SID tile step) plus the posterior math
and fresh reflect pad at full resolution — and on a mesh the reassembly is an
all-gather every step.

Here the diffusion state lives as the tile WINDOWS for the whole reverse scan.
Per step, each tile:
  1. runs the UNet on its (static) window;
  2. applies the ancestral posterior update only on its OWNED region — the
     part of the canvas where this tile is the reference's last writer
     (later tiles overwrite earlier ones in the reference loop, so ownership
     is the write-order partition of the canvas interior);
  3. receives every non-owned part of its window from the owning tile
     (static window-to-window copies; the canvas's reflect-pad frame is
     served by flipped copies from the interior owners).

Because each pixel is updated exactly once (by its owner, with noise drawn at
global coordinates) and every window then equals the corresponding slice of
pad(state, reflect), the per-step tile inputs — and therefore the entire
reverse process — are BITWISE identical to the reassembling implementation
(test_resident.py proves it against parallel/tiled.py). The exchanged bytes
per step are the window overlaps (~17 MB at SID size) instead of two full
gathers + a full scatter, and on a mesh the copies become neighbor
permutes on the tile axis instead of an all-gather.
"""
from __future__ import annotations

import functools
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ucdir_tpu.parallel.tiled import _grid_pad, _extract_tiles


def _starts_1d(size: int, skip: int, padding: int) -> List[int]:
    """Per-axis tile starts in reference loop order (may repeat / go
    backwards at the snapped end — utils/util.py:129-135)."""
    shift = skip - padding * 2
    out = []
    for i in range(0, size, shift):
        out.append(i if i + skip <= size else size - skip)
    return out


def _owner_intervals(starts: Sequence[int], skip: int, padding: int
                     ) -> List[Tuple[int, int, int]]:
    """Partition [padding, size-padding) into (lo, hi, owner_idx): owner is
    the LAST tile (in loop order) whose center [s+padding, s+skip-padding)
    covers the interval — reference write order, later tiles overwrite."""
    edges = sorted({s + padding for s in starts}
                   | {s + skip - padding for s in starts})
    out: List[Tuple[int, int, int]] = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        mid = (lo + hi) // 2
        owners = [i for i, s in enumerate(starts)
                  if s + padding <= mid < s + skip - padding]
        if not owners:
            continue  # outside every center (cannot happen inside the span)
        if out and out[-1][2] == owners[-1] and out[-1][1] == lo:
            out[-1] = (out[-1][0], hi, owners[-1])
        else:
            out.append((lo, hi, owners[-1]))
    return out


class _Copy(NamedTuple):
    """One static window-to-window exchange: dst[t] rect <- maybe-flipped
    src[t] rect (all rects in window coordinates, [r0, r1, c0, c1))."""
    dst_t: int
    dst: Tuple[int, int, int, int]
    src_t: int
    src: Tuple[int, int, int, int]
    flip_r: bool
    flip_c: bool


class ResidentPlan:
    """Static geometry for a tile-resident reverse process.

    h, w: the sampler-state dims (the canvas is the state reflect-padded by
    pd, exactly like parallel/tiled.py / the reference pre-pad)."""

    def __init__(self, h: int, w: int, skip: int = 1024, padding: int = 64):
        self.h, self.w = h, w
        self.skip, self.padding = skip, padding
        pd = _grid_pad(h, w, skip, padding)
        self.pd = pd
        H, W = h + 2 * pd, w + 2 * pd
        self.H, self.W = H, W
        assert H >= 3 * pd + 1 and W >= 3 * pd + 1, (
            'canvas too small for reflect-frame exchange (%d, %d, pd=%d)'
            % (H, W, pd))
        self.hs = _starts_1d(H, skip, padding)
        self.ws = _starts_1d(W, skip, padding)
        self.n_rows, self.n_cols = len(self.hs), len(self.ws)
        self.n_tiles = self.n_rows * self.n_cols
        # tile order matches compute_tile_starts (rows outer, cols inner)
        self.starts = [(hs, ws) for hs in self.hs for ws in self.ws]

        # ownership spans [padding, S-padding); the canvas interior is
        # [pd, S-pd) — a subset when the image is smaller than a tile
        # (pd > padding, util.py:114-115) — so clip the bands to it
        def clip(bands, S):
            return [(max(lo, pd), min(hi, S - pd), o)
                    for (lo, hi, o) in bands if min(hi, S - pd) > max(lo, pd)]
        self.rbands = clip(_owner_intervals(self.hs, skip, padding), H)
        self.cbands = clip(_owner_intervals(self.ws, skip, padding), W)
        # ownership must tile the interior exactly
        assert self.rbands[0][0] == pd and self.rbands[-1][1] == H - pd
        assert self.cbands[0][0] == pd and self.cbands[-1][1] == W - pd

        # owned rect per tile, canvas coords (empty for shadowed duplicates)
        self.owned = {}
        for (rlo, rhi, ri) in self.rbands:
            for (clo, chi, cj) in self.cbands:
                self.owned[ri * self.n_cols + cj] = (rlo, rhi, clo, chi)

        self.copies = self._build_copies()

    # -- geometry helpers ---------------------------------------------------
    def _interior_cells(self):
        for (rlo, rhi, ri) in self.rbands:
            for (clo, chi, cj) in self.cbands:
                yield (rlo, rhi, clo, chi), ri * self.n_cols + cj

    def _frame_pieces(self):
        """Yield (dst_rect, src_rect, owner_t, flip_r, flip_c): canvas frame
        rects and their reflect sources, subdivided so each source rect lies
        in ONE owner's band (jnp reflect: frame index i < pd maps to 2*pd - i;
        i >= S-pd maps to 2*(S-pd-1) - i)."""
        H, W, pd = self.H, self.W, self.pd

        def zones(S):
            # (lo, hi, kind): kind -1 = low frame, 0 = interior, +1 = high
            return [(0, pd, -1), (pd, S - pd, 0), (S - pd, S, 1)]

        def src_range(lo, hi, kind, S):
            if kind == 0:
                return lo, hi, False
            if kind == -1:          # i -> 2*pd - i
                return 2 * pd - hi + 1, 2 * pd - lo + 1, True
            return 2 * (S - pd - 1) - hi + 1, 2 * (S - pd - 1) - lo + 1, True

        def split_by(bands, lo, hi):
            for (blo, bhi, owner) in bands:
                s, e = max(lo, blo), min(hi, bhi)
                if s < e:
                    yield s, e, owner

        for (rlo, rhi, rkind) in zones(H):
            for (clo, chi, ckind) in zones(W):
                if rkind == 0 and ckind == 0:
                    continue
                # subdivide the SOURCE region by ownership, map back to dst
                srlo, srhi, fr = src_range(rlo, rhi, rkind, H)
                sclo, schi, fc = src_range(clo, chi, ckind, W)
                for (sr0, sr1, ri) in split_by(self.rbands, srlo, srhi):
                    for (sc0, sc1, cj) in split_by(self.cbands, sclo, schi):
                        owner = ri * self.n_cols + cj
                        # dst sub-rect corresponding to [sr0,sr1) under the
                        # (possibly flipped) affine map
                        if fr:
                            dr0, dr1 = (2 * pd - sr1 + 1, 2 * pd - sr0 + 1) \
                                if rkind == -1 else \
                                (2 * (H - pd - 1) - sr1 + 1,
                                 2 * (H - pd - 1) - sr0 + 1)
                        else:
                            dr0, dr1 = sr0, sr1
                        if fc:
                            dc0, dc1 = (2 * pd - sc1 + 1, 2 * pd - sc0 + 1) \
                                if ckind == -1 else \
                                (2 * (W - pd - 1) - sc1 + 1,
                                 2 * (W - pd - 1) - sc0 + 1)
                        else:
                            dc0, dc1 = sc0, sc1
                        yield ((dr0, dr1, dc0, dc1), (sr0, sr1, sc0, sc1),
                               owner, fr, fc)

    def _build_copies(self) -> List[_Copy]:
        """All static window-to-window copies refreshing every non-owned
        window pixel after the owned-region updates."""
        copies: List[_Copy] = []

        def clip_to_window(t, rect):
            hs, ws = self.starts[t]
            r0, r1, c0, c1 = rect
            r0, r1 = max(r0, hs), min(r1, hs + self.skip)
            c0, c1 = max(c0, ws), min(c1, ws + self.skip)
            if r0 >= r1 or c0 >= c1:
                return None
            return (r0, r1, c0, c1)

        for t in range(self.n_tiles):
            hs, ws = self.starts[t]
            # interior cells owned by other tiles
            for rect, owner in self._interior_cells():
                if owner == t:
                    continue
                dst = clip_to_window(t, rect)
                if dst is None:
                    continue
                ohs, ows = self.starts[owner]
                copies.append(_Copy(
                    t, (dst[0] - hs, dst[1] - hs, dst[2] - ws, dst[3] - ws),
                    owner, (dst[0] - ohs, dst[1] - ohs,
                            dst[2] - ows, dst[3] - ows), False, False))
            # reflect frame pieces (including pieces whose owner is t itself)
            for dst_rect, src_rect, owner, fr, fc in self._frame_pieces():
                dst = clip_to_window(t, dst_rect)
                if dst is None:
                    continue
                # crop the source rect to match the clipped dst (flips swap
                # which end of the source gets cropped)
                dr0, dr1, dc0, dc1 = dst_rect
                r_lo_cut, r_hi_cut = dst[0] - dr0, dr1 - dst[1]
                c_lo_cut, c_hi_cut = dst[2] - dc0, dc1 - dst[3]
                sr0, sr1, sc0, sc1 = src_rect
                if fr:
                    sr0, sr1 = sr0 + r_hi_cut, sr1 - r_lo_cut
                else:
                    sr0, sr1 = sr0 + r_lo_cut, sr1 - r_hi_cut
                if fc:
                    sc0, sc1 = sc0 + c_hi_cut, sc1 - c_lo_cut
                else:
                    sc0, sc1 = sc0 + c_lo_cut, sc1 - c_hi_cut
                ohs, ows = self.starts[owner]
                copies.append(_Copy(
                    t, (dst[0] - hs, dst[1] - hs, dst[2] - ws, dst[3] - ws),
                    owner, (sr0 - ohs, sr1 - ohs, sc0 - ows, sc1 - ows),
                    fr, fc))
        return copies

    # -- array ops ----------------------------------------------------------
    def extract(self, img: jax.Array) -> jax.Array:
        """state (b, h, w, C) -> windows (n_tiles, b, skip, skip, C)."""
        pd = self.pd
        canvas = jnp.pad(img, ((0, 0), (pd, pd), (pd, pd), (0, 0)),
                         mode='reflect')
        return _extract_tiles(canvas, self.starts, self.skip)

    def materialize(self, tw: jax.Array) -> jax.Array:
        """windows -> state (b, h, w, C) from the owned regions."""
        b, C = tw.shape[1], tw.shape[-1]
        out = jnp.zeros((b, self.h, self.w, C), tw.dtype)
        for t, (r0, r1, c0, c1) in self.owned.items():
            hs, ws = self.starts[t]
            piece = tw[t, :, r0 - hs:r1 - hs, c0 - ws:c1 - ws, :]
            out = jax.lax.dynamic_update_slice(
                out, piece, (0, r0 - self.pd, c0 - self.pd, 0))
        return out

    def update_owned(self, tw: jax.Array, update_fn: Callable) -> jax.Array:
        """Apply `update_fn(t, window_rect_values, state_rect, window_rect)
        -> new_values` on every tile's owned rect; state_rect/window_rect are
        (r0, r1, c0, c1) in state / window coordinates."""
        for t, (r0, r1, c0, c1) in self.owned.items():
            hs, ws = self.starts[t]
            wr = (r0 - hs, r1 - hs, c0 - ws, c1 - ws)
            cur = tw[t, :, wr[0]:wr[1], wr[2]:wr[3], :]
            new = update_fn(t, cur,
                            (r0 - self.pd, r1 - self.pd,
                             c0 - self.pd, c1 - self.pd), wr)
            tw = jax.lax.dynamic_update_slice(
                tw, new[None], (t, 0, wr[0], wr[2], 0))
        return tw

    def exchange(self, tw: jax.Array) -> jax.Array:
        """Refresh every non-owned window pixel from its owner (must run
        after all owned rects are updated)."""
        for cp in self.copies:
            piece = tw[cp.src_t, :, cp.src[0]:cp.src[1],
                       cp.src[2]:cp.src[3], :]
            if cp.flip_r:
                piece = jnp.flip(piece, axis=1)
            if cp.flip_c:
                piece = jnp.flip(piece, axis=2)
            tw = jax.lax.dynamic_update_slice(
                tw, piece[None], (cp.dst_t, 0, cp.dst[0], cp.dst[2], 0))
        return tw


class ResidentSampler:
    """Tile-resident ancestral (DDPM) reverse process.

    Static config lives on the object; parameters and the prepared
    conditioning tiles are passed through `prepare`/`scan_segment` so the
    whole thing jits cleanly (and the segmented CLI runner can carry the
    tiled state across device executions).

    Bitwise-parity contract with the reassembling path
    (diffusion/sampler.p_sample_loop over parallel/tiled.tiled_denoise_fn):
    same key -> identical output (tests/test_resident.py).
    """

    def __init__(self, denoiser, h: int, w: int, b: int,
                 skip: int = 1024, padding: int = 64, tile_chunk: int = 1,
                 data_axis: Optional[str] = None, hoist_guide: bool = True,
                 out_channels: int = 3):
        self.denoiser = denoiser
        self.plan = ResidentPlan(h, w, skip, padding)
        self.b = b
        self.tile_chunk = tile_chunk
        self.data_axis = data_axis
        self.out_channels = out_channels
        self.n_pad = (-self.plan.n_tiles) % tile_chunk
        self.t_pad = self.plan.n_tiles + self.n_pad
        self.n_chunks = self.t_pad // tile_chunk
        self.k = tile_chunk * b
        self.hoist_guide = (hoist_guide and
                            getattr(denoiser, 'resname', None)
                            == 'ResnetBlockDY3h')

    # -- conditioning (computed once per image, outside the step scan) ------
    def _tiles(self, x: jax.Array) -> jax.Array:
        """(b, h, w, C) -> chunked window stack (n_chunks, k, skip, skip, C),
        dummy tiles replicating the last window (same as parallel/tiled.py)."""
        pd, skip = self.plan.pd, self.plan.skip
        xp = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode='reflect')
        starts = self.plan.starts + [self.plan.starts[-1]] * self.n_pad
        tiles = _extract_tiles(xp, starts, skip)
        return tiles.reshape(self.n_chunks, self.k, skip, skip, x.shape[-1])

    def prepare(self, params, x_cond_net: jax.Array, guide_net: jax.Array):
        """Build the step-invariant conditioning: condition tiles and (AKGM
        denoisers) hoisted guide-attention maps per tile."""
        xc = self._tiles(x_cond_net)
        if self.hoist_guide:
            from ucdir_tpu.models.dy3h import compute_guide_maps
            g_tiles = self._tiles(guide_net)
            maps = jax.lax.map(
                lambda g1: compute_guide_maps(self.denoiser, params, g1),
                g_tiles)
            need = {name for name, _ in self.denoiser.guide_block_scales()}
            assert need <= set(maps), (
                'hoisted guide maps incomplete: %s' % (need - set(maps)))
            return {'xc': xc, 'g': None, 'maps': maps}
        return {'xc': xc, 'g': self._tiles(guide_net), 'maps': None}

    # -- per-step UNet evaluation ------------------------------------------
    def eps_fn(self, params, ctx, tw_net: jax.Array,
               noise_level: jax.Array) -> jax.Array:
        """tw_net (t_pad, b, skip, skip, C) in net dtype -> eps tiles
        (t_pad, b, skip, skip, out_channels) in net dtype."""
        skip = self.plan.skip
        im = tw_net.reshape(self.n_chunks, self.k, skip, skip,
                            tw_net.shape[-1])
        guide_ch = 3
        data_axis = self.data_axis

        def run_chunk(args):
            xc_c, im_c, g_c, m_c = args
            net = jnp.concatenate([xc_c, im_c], axis=-1)
            if data_axis is not None:
                spec = jax.sharding.PartitionSpec(data_axis)
                net = jax.lax.with_sharding_constraint(net, spec)
                if g_c is not None:
                    g_c = jax.lax.with_sharding_constraint(g_c, spec)
                if m_c is not None:
                    m_c = jax.tree_util.tree_map(
                        lambda a: jax.lax.with_sharding_constraint(a, spec),
                        m_c)
            nl = jnp.broadcast_to(noise_level[:1],
                                  (net.shape[0], noise_level.shape[1]))
            if m_c is not None:
                return self.denoiser.apply(
                    {'params': params}, net, nl, net[..., :guide_ch],
                    method='naiveforward', guide_maps=m_c)
            return self.denoiser.apply({'params': params}, net, nl, g_c,
                                       method='naiveforward')

        out = jax.lax.map(run_chunk, (ctx['xc'], im, ctx['g'], ctx['maps']))
        return out.reshape(self.t_pad, self.b, skip, skip, self.out_channels)

    # -- state management ---------------------------------------------------
    def init_tiles(self, img: jax.Array) -> jax.Array:
        tw = self.plan.extract(img)
        if self.n_pad:
            tw = jnp.concatenate(
                [tw, jnp.repeat(tw[-1:], self.n_pad, axis=0)], axis=0)
        return tw

    def materialize(self, tw: jax.Array) -> jax.Array:
        return self.plan.materialize(tw)

    # -- the reverse scan ---------------------------------------------------
    def scan_segment(self, params, ctx, sched, tw, key, buf, ts, slots,
                     clip_denoised: bool = True, net_dtype=None):
        """Tile-resident counterpart of diffusion/sampler.ddpm_scan_segment:
        carry = (tw, key, buf); buf (if not None) holds TILED snapshots
        (n_snap, *tw.shape) — materialize each slot after the scan."""
        plan = self.plan
        state_shape = (self.b, plan.h, plan.w, self.out_channels)
        state_dtype = tw.dtype
        nd = net_dtype or state_dtype

        def step(carry, xs):
            tw, key, buf = carry
            t, slot = xs
            key, k = jax.random.split(key)
            noise_level = jnp.full((self.b, 1), 0., dtype=state_dtype) + \
                sched.sqrt_alphas_cumprod_prev[t + 1]
            eps = self.eps_fn(params, ctx, tw.astype(nd),
                              noise_level.astype(nd))
            noise = jax.random.normal(k, state_shape, dtype=state_dtype)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
            sigma = jnp.exp(0.5 * sched.posterior_log_variance_clipped[t])

            def upd(tile, cur, srect, wrect):
                e = eps[tile, :, wrect[0]:wrect[1],
                        wrect[2]:wrect[3], :].astype(cur.dtype)
                nz = noise[:, srect[0]:srect[1], srect[2]:srect[3], :]
                # elementwise math on a lane-filling (B*H, W*C) view — NHWC
                # keeps C=3 in 3/128 vector lanes (see sampler.py step);
                # bit-identical, reshape commutes with elementwise ops
                sh = cur.shape
                curf = cur.reshape(sh[0] * sh[1], sh[2] * sh[3])
                ef = e.reshape(curf.shape)
                nzf = nz.reshape(curf.shape)
                x0 = (sched.sqrt_recip_alphas_cumprod[t] * curf
                      - sched.sqrt_recipm1_alphas_cumprod[t] * ef)
                if clip_denoised:
                    x0 = jnp.clip(x0, -1., 1.)
                mean = (sched.posterior_mean_coef1[t] * x0
                        + sched.posterior_mean_coef2[t] * curf)
                return (mean + nzf * sigma).reshape(sh)

            tw = plan.update_owned(tw, upd)
            tw = plan.exchange(tw)
            if self.n_pad:
                last = tw[plan.n_tiles - 1:plan.n_tiles]
                tw = jax.lax.dynamic_update_slice(
                    tw, jnp.repeat(last, self.n_pad, axis=0),
                    (plan.n_tiles, 0, 0, 0, 0))
            if buf is not None:
                buf = jax.lax.dynamic_update_index_in_dim(buf, tw, slot, 0)
            return (tw, key, buf), None

        (tw, key, buf), _ = jax.lax.scan(step, (tw, key, buf), (ts, slots))
        return tw, key, buf


def resident_reverse(denoiser, params, sched, x_cond, x_cond_net, guide_net,
                     key, continous: bool = False, skip: int = 1024,
                     padding: int = 64, tile_chunk: int = 1,
                     data_axis: Optional[str] = None,
                     clip_denoised: bool = True):
    """Full tile-resident ancestral reverse loop — drop-in for
    p_sample_loop(tiled_denoise_fn(...)) (sampler.py) with identical RNG
    stream and snapshot cadence. x_cond: f32 sampler-state condition;
    x_cond_net/guide_net: net-dtype (e.g. bf16) conditioning inputs."""
    from ucdir_tpu.diffusion.sampler import _snapshot_slots

    b, h, w, _ = x_cond.shape
    rs = ResidentSampler(denoiser, h, w, b, skip=skip, padding=padding,
                         tile_chunk=tile_chunk, data_axis=data_axis)
    ctx = rs.prepare(params, x_cond_net,
                     guide_net if guide_net is not None else x_cond_net)

    T = sched.num_timesteps
    key, k0 = jax.random.split(key)
    img0 = jax.random.normal(k0, x_cond.shape, dtype=x_cond.dtype)
    tw = rs.init_tiles(img0)

    slots, n_snap = _snapshot_slots(T)
    buf0 = (jnp.zeros((n_snap,) + tw.shape, tw.dtype) if continous else None)
    ts = jnp.arange(T - 1, -1, -1)
    tw, _, buf = rs.scan_segment(params, ctx, sched, tw, key, buf0,
                                 ts, jnp.asarray(slots),
                                 clip_denoised=clip_denoised,
                                 net_dtype=x_cond_net.dtype)
    img = rs.materialize(tw)
    if continous:
        snaps = jax.lax.map(rs.materialize, buf)
        return img, jnp.concatenate([x_cond[None], snaps], axis=0)
    return img
