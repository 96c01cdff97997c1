"""Tiled high-resolution denoiser evaluation — sharded across chips.

Parity target: /root/reference/utils/util.py:108-146 (`patch_forward_guide`)
as invoked from model/ucdir.py:295-300: inside EVERY denoising step, inputs
larger than `skip`x`skip` (1024) are split into overlapping tiles with
`padding` (64) px halos, each tile runs through the UNet, and the halo-cropped
centers are reassembled — so the diffusion state stays globally consistent
between steps and no grid seams appear.

The reference is a sequential host Python loop over tiles. Here the tile grid
is STATIC (computed from the traced shape), all tiles are gathered with static
slices, and the UNet runs over tile-chunks inside `lax.map` — one XLA program,
with the chunk batch dimension sharded over the mesh's data axis when a mesh
is active, so tiles are computed on different chips in parallel and the
reassembly all-gather rides ICI.

Reference edge semantics preserved exactly:
  * reflect pre-pad of `padding` (64) px on all sides (pd adjusts when the
    image is barely larger than a tile, util.py:114-115);
  * overflow tiles snap to the end (`h_start = H - skip`, util.py:129-135);
  * tiles are written in loop order, later (snapped) tiles overwriting
    earlier ones.
"""
from __future__ import annotations

import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_tile_starts(H: int, W: int, skip: int, padding: int
                        ) -> List[Tuple[int, int]]:
    """Static (h_start, w_start) grid with reference snap-to-end semantics.
    H, W are the dims AFTER the reflect pre-pad."""
    shift = skip - padding * 2
    starts = []
    for i in range(0, H, shift):
        h_start, h_end = i, i + skip
        if h_end > H:
            h_start = H - skip
        for j in range(0, W, shift):
            w_start, w_end = j, j + skip
            if w_end > W:
                w_start = W - skip
            starts.append((h_start, w_start))
    return starts


def _grid_pad(h: int, w: int, skip: int, padding: int) -> int:
    """Reflect pre-pad width (pd adjusts when the image is barely larger than
    a tile, util.py:114-115)."""
    pd = min(h, w)
    return skip - pd + padding if pd < skip else padding


def _extract_tiles(x_padded: jax.Array, starts, skip: int) -> jax.Array:
    """Static-slice tile gather: (T, b, skip, skip, C)."""
    return jnp.stack([x_padded[:, hs:hs + skip, ws:ws + skip, :]
                      for hs, ws in starts])


def _reassemble(out_tiles, starts, b, H, W, padding, pd):
    """Sequential reassembly in reference write order (later tiles overwrite)."""
    denoised = jnp.zeros((b, H, W, out_tiles.shape[-1]), out_tiles.dtype)
    for t, (hs, ws) in enumerate(starts):
        center = out_tiles[t, :, padding:-padding, padding:-padding, :]
        denoised = jax.lax.dynamic_update_slice(
            denoised, center, (0, hs + padding, ws + padding, 0))
    return denoised[:, pd:-pd, pd:-pd, :]


def patch_forward_guide(fn: Callable, noisy: jax.Array, guide: jax.Array,
                        skip: int = 1024, padding: int = 64,
                        out_channels: int = 3,
                        tile_chunk: int = 1,
                        data_axis: Optional[str] = None) -> jax.Array:
    """Tiled evaluation of `fn` over `noisy` (NHWC, any C) with `guide` tiled
    in lockstep.

    fn: (tiles (k, skip, skip, C), guide_tiles (k, skip, skip, Cg)) ->
        (k, skip, skip, out_channels); called on chunks of `tile_chunk` tiles.
    data_axis: mesh axis name to shard the chunk batch over (set tile_chunk to
        the axis size); None = single-chip sequential chunks.
    """
    b, h, w, c = noisy.shape
    pd = _grid_pad(h, w, skip, padding)

    noisy = jnp.pad(noisy, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode='reflect')
    guide_pad = jnp.pad(guide, ((0, 0), (pd, pd), (pd, pd), (0, 0)),
                        mode='reflect')
    H, W = noisy.shape[1], noisy.shape[2]

    starts = compute_tile_starts(H, W, skip, padding)
    n_tiles = len(starts)
    n_pad = (-n_tiles) % tile_chunk
    starts_padded = starts + [starts[-1]] * n_pad  # dummies recompute last tile

    tiles = _extract_tiles(noisy, starts_padded, skip)
    gtiles = _extract_tiles(guide_pad, starts_padded, skip)

    T = tiles.shape[0]
    n_chunks = T // tile_chunk
    tiles = tiles.reshape(n_chunks, tile_chunk * b, skip, skip, c)
    gtiles = gtiles.reshape(n_chunks, tile_chunk * b, skip, skip,
                            guide.shape[-1])

    def run_chunk(args):
        xt, gt = args
        if data_axis is not None:
            spec = jax.sharding.PartitionSpec(data_axis)
            xt = jax.lax.with_sharding_constraint(xt, spec)
            gt = jax.lax.with_sharding_constraint(gt, spec)
        return fn(xt, gt)

    out_tiles = jax.lax.map(run_chunk, (tiles, gtiles))
    out_tiles = out_tiles.reshape(T, b, skip, skip, out_channels)
    return _reassemble(out_tiles, starts, b, H, W, padding, pd)


def tiled_denoise_fn(denoiser, params, x_cond: jax.Array, guide: jax.Array,
                     skip: int = 1024, padding: int = 64,
                     tile_chunk: int = 1,
                     data_axis: Optional[str] = None,
                     hoist_guide: bool = True) -> Callable:
    """Builds a `denoise(img, noise_level) -> eps` closure whose UNet
    evaluation is tiled — a drop-in for the sampler loops in
    ucdir_tpu.diffusion.sampler (the >1024^2 branch of ucdir.py:295-300).

    denoiser: the DY3h module; params: its params subtree.

    Reverse-process-invariant work is hoisted out of the returned closure so
    the sampling scan never repeats it: the condition/guide tile gathers run
    once, and (hoist_guide, AKGM denoisers) every tile's guide-attention maps
    are precomputed once via compute_guide_maps — the torch reference re-runs
    the guide convs inside every one of the T steps (ucdir.py:122-131).
    """
    b, h, w, c = x_cond.shape
    pd = _grid_pad(h, w, skip, padding)
    xc_pad = jnp.pad(x_cond, ((0, 0), (pd, pd), (pd, pd), (0, 0)),
                     mode='reflect')
    g_pad = jnp.pad(guide, ((0, 0), (pd, pd), (pd, pd), (0, 0)),
                    mode='reflect')
    H, W = xc_pad.shape[1], xc_pad.shape[2]

    starts = compute_tile_starts(H, W, skip, padding)
    n_pad = (-len(starts)) % tile_chunk
    starts_padded = starts + [starts[-1]] * n_pad
    T = len(starts_padded)
    n_chunks = T // tile_chunk
    k = tile_chunk * b

    xc_tiles = _extract_tiles(xc_pad, starts_padded, skip)
    xc_tiles = xc_tiles.reshape(n_chunks, k, skip, skip, c)
    g_tiles = _extract_tiles(g_pad, starts_padded, skip)
    g_tiles = g_tiles.reshape(n_chunks, k, skip, skip, guide.shape[-1])

    maps = None
    if hoist_guide and getattr(denoiser, 'resname', None) == 'ResnetBlockDY3h':
        from ucdir_tpu.models.dy3h import compute_guide_maps
        # chunk-wise map computation bounds peak memory; result pytree
        # {block: (n_chunks, k, hs, ws, nset)} rides lax.map as xs below
        maps = jax.lax.map(
            lambda g1: compute_guide_maps(denoiser, params, g1), g_tiles)
        # the real guide tiles are dropped below (a placeholder is passed in
        # their place) — every AKGM block MUST be covered by the hoisted maps
        # or it would silently recompute guide convs from the placeholder
        need = {name for name, _ in denoiser.guide_block_scales()}
        assert need <= set(maps), (
            'hoisted guide maps incomplete: missing %s' % (need - set(maps)))
        g_xs = None
    else:
        g_xs = g_tiles

    def denoise(img, noise_level):
        img_pad = jnp.pad(img, ((0, 0), (pd, pd), (pd, pd), (0, 0)),
                          mode='reflect')
        im_tiles = _extract_tiles(img_pad, starts_padded, skip)
        im_tiles = im_tiles.reshape(n_chunks, k, skip, skip, img.shape[-1])

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
            nl = jnp.broadcast_to(noise_level[:1], (net.shape[0],
                                                    noise_level.shape[1]))
            if m_c is not None:
                return denoiser.apply({'params': params}, net, nl,
                                      net[..., :guide.shape[-1]],
                                      method='naiveforward', guide_maps=m_c)
            return denoiser.apply({'params': params}, net, nl, g_c,
                                  method='naiveforward')

        out_tiles = jax.lax.map(run_chunk, (xc_tiles, im_tiles, g_xs, maps))
        out_tiles = out_tiles.reshape(T, b, skip, skip, out_tiles.shape[-1])
        return _reassemble(out_tiles, starts, b, H, W, padding, pd)

    return denoise
