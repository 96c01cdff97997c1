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
gathers + a full scatter.

Multi-chip layout (the TPU counterpart of the reference's sequential tile
loop): tiles are block-sharded over the mesh's data axis — device d owns
tiles [d*tpd, (d+1)*tpd) — and the per-step update+exchange runs under
`jax.shard_map`: posterior updates and same-device window copies are local;
cross-device window overlaps are packed into one buffer per device offset
and moved with `lax.ppermute` over ICI. There is NO per-step all-gather —
`tests/test_resident.py::test_resident_mesh_comm_is_ppermute_only` asserts
it on the partitioned HLO, and `__graft_entry__.dryrun_multichip` re-checks
it on every driver run.

State layout: the scan carry keeps each window FLAT, (t_pad, b, skip,
skip*C) — in natural NHWC the C=3 minor dim fills 3 of 128 vector lanes and
the fused posterior+RNG update runs ~4x off its roofline (the same effect
fixed for the whole-image sampler in diffusion/sampler.ddpm_scan_segment).
Window rects map to flat coords as rows [r0:r1) x lanes [c0*C:c1*C), so
every owned-region update and exchange copy is a lane-filling 2-D slice;
reshape to NHWC happens only around the UNet call. Bit-identical: reshape
commutes with the elementwise math, and threefry RNG depends only on element
count.
"""
from __future__ import annotations

import functools
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

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

    # -- array ops (NHWC window-stack layout; used by tests + materialize) ---
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


def _ambient_axis_size(axis: Optional[str]) -> int:
    """Size of `axis` in the ambient (set_mesh) mesh, 1 if absent."""
    if axis is None:
        return 1
    try:
        am = jax.sharding.get_abstract_mesh()
        return int(dict(getattr(am, 'shape', {}) or {}).get(axis, 1))
    except Exception:
        return 1


class ResidentSampler:
    """Tile-resident ancestral (DDPM) reverse process.

    Static config lives on the object; parameters and the prepared
    conditioning tiles are passed through `prepare`/`scan_segment` so the
    whole thing jits cleanly (and the segmented CLI runner can carry the
    tiled state across device executions).

    Bitwise-parity contract with the reassembling path
    (diffusion/sampler.p_sample_loop over parallel/tiled.tiled_denoise_fn):
    same key -> identical output (tests/test_resident.py).

    Layouts: windows are chunked DEVICE-MAJOR — tile t maps to (device
    t // n_chunks, chunk t % n_chunks), so block-sharding the tile axis over
    `data_axis` puts chunk j's k-axis one-tile-per-device (matching eps_fn's
    per-chunk sharding constraint) and the shard_map exchange sees device d
    owning tiles [d*n_chunks, (d+1)*n_chunks). The scan carry is the FLAT
    window stack (t_pad, b, skip, skip*C) — see the module docstring.
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
        self._comm = None  # built lazily (static shard_map exchange plan)

    # -- layout helpers -------------------------------------------------------
    def _dev_of(self, t: int) -> int:
        return t // self.n_chunks

    def _chunked(self, t5: jax.Array) -> jax.Array:
        """(t_pad, b, ...) window stack -> (n_chunks, tile_chunk*b, ...)
        device-major chunks: chunk j holds tiles {d*n_chunks + j}."""
        rest = t5.shape[1:]
        x = t5.reshape((self.tile_chunk, self.n_chunks) + rest)
        x = jnp.swapaxes(x, 0, 1)
        return x.reshape((self.n_chunks, self.k) + rest[1:])

    def _unchunk(self, ch: jax.Array) -> jax.Array:
        """(n_chunks, tile_chunk*b, ...) -> (t_pad, b, ...)."""
        rest = ch.shape[2:]
        x = ch.reshape((self.n_chunks, self.tile_chunk, self.b) + rest)
        x = jnp.swapaxes(x, 0, 1)
        return x.reshape((self.t_pad, self.b) + rest)

    def _flat(self, tw5: jax.Array) -> jax.Array:
        t, b, s, _, c = tw5.shape
        return tw5.reshape(t, b, s, s * c)

    def _unflat(self, twf: jax.Array, C: Optional[int] = None) -> jax.Array:
        C = C or self.out_channels
        t, b, s, sc = twf.shape
        return twf.reshape(t, b, s, sc // C, C)

    # -- conditioning (computed once per image, outside the step scan) ------
    def _tiles(self, x: jax.Array) -> jax.Array:
        """(b, h, w, C) -> chunked window stack (n_chunks, k, skip, skip, C),
        dummy tiles replicating the last window (same as parallel/tiled.py)."""
        pd, skip = self.plan.pd, self.plan.skip
        xp = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode='reflect')
        starts = self.plan.starts + [self.plan.starts[-1]] * self.n_pad
        tiles = _extract_tiles(xp, starts, skip)
        return self._chunked(tiles)

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
    def eps_fn(self, params, ctx, twf_net: jax.Array,
               noise_level: jax.Array) -> jax.Array:
        """twf_net (t_pad, b, skip, skip*C) flat windows in net dtype ->
        flat eps windows (t_pad, b, skip, skip*out_channels) in net dtype."""
        im = self._chunked(self._unflat(twf_net))
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
        return self._flat(self._unchunk(out))

    # -- state management ---------------------------------------------------
    def init_tiles(self, img: jax.Array) -> jax.Array:
        tw = self.plan.extract(img)
        if self.n_pad:
            tw = jnp.concatenate(
                [tw, jnp.repeat(tw[-1:], self.n_pad, axis=0)], axis=0)
        return self._flat(tw)

    def materialize(self, twf: jax.Array) -> jax.Array:
        return self.plan.materialize(self._unflat(twf))

    # -- posterior update + exchange -----------------------------------------
    def _posterior(self, cur, e, nz, coefs, clip_denoised: bool):
        """Flat-view ancestral update on one owned rect (all lane-filling
        2-D+ elementwise — the sampler.py:70-87 layout fix)."""
        sra, srm1, c1, c2, sigma = coefs
        x0 = sra * cur - srm1 * e.astype(cur.dtype)
        if clip_denoised:
            x0 = jnp.clip(x0, -1., 1.)
        return c1 * x0 + c2 * cur + nz * sigma

    def _owned_flat(self, t: int):
        """(slot_rows, flat window rect, flat state rect) for tile t."""
        C = self.out_channels
        r0, r1, c0, c1 = self.plan.owned[t]
        hs, ws = self.plan.starts[t]
        pd = self.plan.pd
        wr = (r0 - hs, r1 - hs, (c0 - ws) * C, (c1 - ws) * C)
        sr = (r0 - pd, r1 - pd, (c0 - pd) * C, (c1 - pd) * C)
        return wr, sr

    def _update_exchange_local(self, twf, epsf, noise_f, coefs,
                               clip_denoised: bool) -> jax.Array:
        """Single-shard path: owned-rect posterior updates then the static
        window-to-window copies, all on the flat layout."""
        C = self.out_channels
        for t in self.plan.owned:
            wr, sr = self._owned_flat(t)
            cur = twf[t, :, wr[0]:wr[1], wr[2]:wr[3]]
            e = epsf[t, :, wr[0]:wr[1], wr[2]:wr[3]]
            nz = noise_f[:, sr[0]:sr[1], sr[2]:sr[3]]
            new = self._posterior(cur, e, nz, coefs, clip_denoised)
            twf = jax.lax.dynamic_update_slice(
                twf, new[None], (t, 0, wr[0], wr[2]))
        for cp in self.plan.copies:
            piece = self._copy_piece(twf[cp.src_t], cp)
            twf = jax.lax.dynamic_update_slice(
                twf, piece[None], (cp.dst_t, 0, cp.dst[0], cp.dst[2] * C))
        return twf

    def _copy_piece(self, src_window_f: jax.Array, cp: _Copy) -> jax.Array:
        """Slice (and maybe flip) cp's source rect out of one flat window
        (b, skip, skip*C)."""
        C = self.out_channels
        piece = src_window_f[:, cp.src[0]:cp.src[1],
                             cp.src[2] * C:cp.src[3] * C]
        if cp.flip_r:
            piece = jnp.flip(piece, axis=1)
        if cp.flip_c:
            b, rows, cc = piece.shape
            piece = jnp.flip(piece.reshape(b, rows, cc // C, C),
                             axis=2).reshape(b, rows, cc)
        return piece

    def _comm_plan(self):
        """Static shard_map exchange plan: per-device owned updates, local
        copies, and cross-device copies grouped by device offset."""
        if self._comm is not None:
            return self._comm
        ndev, C, b = self.tile_chunk, self.out_channels, self.b
        upd = [[] for _ in range(ndev)]
        for t in sorted(self.plan.owned):
            upd[self._dev_of(t)].append(t)
        local = [[] for _ in range(ndev)]
        cross = {}  # offset -> per-src-device ordered copy list
        for cp in self.plan.copies:
            sd, dd = self._dev_of(cp.src_t), self._dev_of(cp.dst_t)
            if sd == dd:
                local[sd].append(cp)
            else:
                cross.setdefault(dd - sd, [[] for _ in range(ndev)])[sd] \
                    .append(cp)

        def numel(cp):
            return (b * (cp.src[1] - cp.src[0])
                    * (cp.src[3] - cp.src[2]) * C)

        offs = sorted(cross)
        sizes = [max(sum(numel(cp) for cp in cross[o][d])
                     for d in range(ndev)) for o in offs]
        pairs = [[(d, d + o) for d in range(ndev)
                  if 0 <= d + o < ndev and cross[o][d]] for o in offs]
        self._comm = (upd, local, offs, [cross[o] for o in offs], sizes,
                      pairs)
        return self._comm

    def _update_exchange_shmap(self, twf, epsf, noise_f, coefs,
                               clip_denoised: bool, axis: str) -> jax.Array:
        """Mesh path: tiles block-sharded over `axis`; posterior updates and
        same-device copies run locally, cross-device window overlaps ride
        ONE lax.ppermute per device offset (packed buffers) — neighbor
        traffic only, no per-step all-gather."""
        upd, local, offs, cross, sizes, pairs = self._comm_plan()
        ndev, C, nc = self.tile_chunk, self.out_channels, self.n_chunks
        dtype = twf.dtype

        def pack_branch(d):
            def f(tw_l, eps_l, noise_f, coefs):
                # 1) posterior update on this device's owned rects
                for t in upd[d]:
                    slot = t % nc
                    wr, sr = self._owned_flat(t)
                    cur = tw_l[slot, :, wr[0]:wr[1], wr[2]:wr[3]]
                    e = eps_l[slot, :, wr[0]:wr[1], wr[2]:wr[3]]
                    nz = noise_f[:, sr[0]:sr[1], sr[2]:sr[3]]
                    new = self._posterior(cur, e, nz, coefs, clip_denoised)
                    tw_l = jax.lax.dynamic_update_slice(
                        tw_l, new[None], (slot, 0, wr[0], wr[2]))
                # 2) same-device window copies
                for cp in local[d]:
                    piece = self._copy_piece(tw_l[cp.src_t % nc], cp)
                    tw_l = jax.lax.dynamic_update_slice(
                        tw_l, piece[None],
                        (cp.dst_t % nc, 0, cp.dst[0], cp.dst[2] * C))
                # 3) pack outgoing overlaps, one flat buffer per offset
                bufs = []
                for o, per_src, L in zip(offs, cross, sizes):
                    parts = [self._copy_piece(tw_l[cp.src_t % nc], cp)
                             .reshape(-1) for cp in per_src[d]]
                    flat = (jnp.concatenate(parts) if parts
                            else jnp.zeros((0,), dtype))
                    bufs.append(jnp.pad(flat, (0, L - flat.shape[0])))
                return (tw_l,) + tuple(bufs)
            return f

        def unpack_branch(d):
            def f(tw_l, *bufs):
                for o, per_src, buf in zip(offs, cross, bufs):
                    src_dev = d - o
                    if not (0 <= src_dev < ndev):
                        continue
                    pos = 0
                    for cp in per_src[src_dev]:
                        b_, rows = self.b, cp.src[1] - cp.src[0]
                        cols = (cp.src[3] - cp.src[2]) * C
                        n = b_ * rows * cols
                        piece = jax.lax.dynamic_slice(
                            buf, (pos,), (n,)).reshape(b_, rows, cols)
                        pos += n
                        tw_l = jax.lax.dynamic_update_slice(
                            tw_l, piece[None],
                            (cp.dst_t % nc, 0, cp.dst[0], cp.dst[2] * C))
                return tw_l
            return f

        def body(twf, epsf, noise_f, coefs):
            d = jax.lax.axis_index(axis)
            out = jax.lax.switch(d, [pack_branch(i) for i in range(ndev)],
                                 twf, epsf, noise_f, coefs)
            tw_l, bufs = out[0], out[1:]
            recv = [jax.lax.ppermute(buf, axis, prs)
                    for buf, prs in zip(bufs, pairs)]
            return jax.lax.switch(d, [unpack_branch(i) for i in range(ndev)],
                                  tw_l, *recv)

        return jax.shard_map(
            body, in_specs=(P(axis), P(axis), P(), P()), out_specs=P(axis),
            check_vma=False,  # empty-sender pack buffers are unvarying consts
        )(twf, epsf, noise_f, coefs)

    # -- the reverse scan ---------------------------------------------------
    def scan_segment(self, params, ctx, sched, twf, key, buf, ts, slots,
                     clip_denoised: bool = True, net_dtype=None):
        """Tile-resident counterpart of diffusion/sampler.ddpm_scan_segment:
        carry = (twf, key, buf) with twf the FLAT window stack
        (t_pad, b, skip, skip*C); buf (if not None) holds TILED snapshots
        (n_snap, *twf.shape) — materialize each slot after the scan."""
        plan = self.plan
        C = self.out_channels
        state_dtype = twf.dtype
        nd = net_dtype or state_dtype
        use_shmap = (self.data_axis is not None
                     and _ambient_axis_size(self.data_axis) == self.tile_chunk
                     and self.tile_chunk > 1)
        spec = P(self.data_axis) if self.data_axis is not None else None

        def pin(a, lead=0):
            if spec is None or a is None:
                return a
            s = P(*((None,) * lead), self.data_axis)
            return jax.lax.with_sharding_constraint(a, s)

        def step(carry, xs):
            twf, key, buf = carry
            t, slot = xs
            key, k = jax.random.split(key)
            noise_level = jnp.full((self.b, 1), 0., dtype=state_dtype) + \
                sched.sqrt_alphas_cumprod_prev[t + 1]
            epsf = self.eps_fn(params, ctx, twf.astype(nd),
                               noise_level.astype(nd))
            # flat global noise — same threefry stream as the NHWC draw
            noise_f = jax.random.normal(
                k, (self.b, plan.h, plan.w * C), dtype=state_dtype)
            noise_f = jnp.where(t > 0, noise_f, jnp.zeros_like(noise_f))
            sigma = jnp.exp(0.5 * sched.posterior_log_variance_clipped[t])
            coefs = (sched.sqrt_recip_alphas_cumprod[t],
                     sched.sqrt_recipm1_alphas_cumprod[t],
                     sched.posterior_mean_coef1[t],
                     sched.posterior_mean_coef2[t], sigma)
            if use_shmap:
                twf = self._update_exchange_shmap(
                    twf, pin(epsf), noise_f, coefs, clip_denoised,
                    self.data_axis)
            else:
                twf = self._update_exchange_local(twf, epsf, noise_f, coefs,
                                                  clip_denoised)
            twf = pin(twf)
            # NOTE: the n_pad dummy windows are NOT refreshed — they exist
            # only to keep eps chunk shapes static and their UNet outputs are
            # discarded; materialize/exchange never read them.
            if buf is not None:
                buf = pin(jax.lax.dynamic_update_index_in_dim(
                    buf, twf, slot, 0), lead=1)
            return (twf, key, buf), None

        (twf, key, buf), _ = jax.lax.scan(step, (pin(twf), key,
                                                 pin(buf, lead=1)),
                                          (ts, slots))
        return twf, key, buf


def compiled_segment_text(denoiser, params, sched, x_cond, x_cond_net,
                          guide_net, key, skip: int = 1024,
                          padding: int = 64, tile_chunk: int = 1,
                          data_axis: Optional[str] = None,
                          n_steps: int = 2) -> str:
    """Compile an n_steps resident scan segment under the ambient mesh and
    return the PARTITIONED HLO text — the evidence surface for the
    multi-chip communication contract (asserted by assert_neighbor_comm in
    tests/test_resident.py and __graft_entry__.dryrun_multichip)."""
    b, h, w, _ = x_cond.shape
    rs = ResidentSampler(denoiser, h, w, b, skip=skip, padding=padding,
                         tile_chunk=tile_chunk, data_axis=data_axis)
    ctx = rs.prepare(params, x_cond_net,
                     guide_net if guide_net is not None else x_cond_net)
    key, k0 = jax.random.split(key)
    twf = rs.init_tiles(jax.random.normal(k0, x_cond.shape, x_cond.dtype))
    ts = jnp.arange(n_steps - 1, -1, -1)
    slots = jnp.zeros((n_steps,), jnp.int32)

    def seg(params, ctx, twf, key):
        return rs.scan_segment(params, ctx, sched, twf, key, None, ts, slots,
                               net_dtype=x_cond_net.dtype)[0]

    return jax.jit(seg).lower(params, ctx, twf, key).compile().as_text()


def assert_neighbor_comm(hlo_text: str):
    """The per-step communication contract of the tile-resident sampler on a
    mesh: window overlaps move as collective-permutes (neighbor traffic over
    ICI) — NO all-gather / all-reduce / all-to-all anywhere in the step
    program (the reassembling path would all-gather the full latent every
    step)."""
    low = hlo_text.lower()
    for bad in ('all-gather', 'all-reduce', 'all-to-all'):
        assert bad not in low, (
            'resident step program contains a %s — the tile exchange must '
            'be neighbor collective-permutes only' % bad)
    assert 'collective-permute' in low, (
        'resident step program has no collective-permute — the shard_map '
        'ppermute exchange did not engage')


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
    twf = rs.init_tiles(img0)

    slots, n_snap = _snapshot_slots(T)
    buf0 = (jnp.zeros((n_snap,) + twf.shape, twf.dtype) if continous else None)
    ts = jnp.arange(T - 1, -1, -1)
    twf, _, buf = rs.scan_segment(params, ctx, sched, twf, key, buf0,
                                  ts, jnp.asarray(slots),
                                  clip_denoised=clip_denoised,
                                  net_dtype=x_cond_net.dtype)
    img = rs.materialize(twf)
    if continous:
        snaps = jax.lax.map(rs.materialize, buf)
        return img, jnp.concatenate([x_cond[None], snaps], axis=0)
    return img
