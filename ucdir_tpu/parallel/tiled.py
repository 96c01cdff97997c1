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
    pd = min(h, w)
    pd = skip - pd + padding if pd < skip else padding

    noisy = jnp.pad(noisy, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode='reflect')
    guide_pad = jnp.pad(guide, ((0, 0), (pd, pd), (pd, pd), (0, 0)),
                        mode='reflect')
    H, W = noisy.shape[1], noisy.shape[2]

    starts = compute_tile_starts(H, W, skip, padding)
    n_tiles = len(starts)
    n_pad = (-n_tiles) % tile_chunk
    starts_padded = starts + [starts[-1]] * n_pad  # dummies recompute last tile

    # gather all tiles with static slices: (T, b, skip, skip, C)
    tiles = jnp.stack([noisy[:, hs:hs + skip, ws:ws + skip, :]
                       for hs, ws in starts_padded])
    gtiles = jnp.stack([guide_pad[:, hs:hs + skip, ws:ws + skip, :]
                        for hs, ws in starts_padded])

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

    # sequential reassembly in reference write order (later tiles overwrite)
    denoised = jnp.zeros((b, H, W, out_channels), out_tiles.dtype)
    inner = skip - 2 * padding
    for t, (hs, ws) in enumerate(starts):
        center = out_tiles[t, :, padding:-padding, padding:-padding, :]
        denoised = jax.lax.dynamic_update_slice(
            denoised, center, (0, hs + padding, ws + padding, 0))
    return denoised[:, pd:-pd, pd:-pd, :]


def tiled_denoise_fn(denoiser, params, x_cond: jax.Array, guide: jax.Array,
                     skip: int = 1024, padding: int = 64,
                     tile_chunk: int = 1,
                     data_axis: Optional[str] = None) -> Callable:
    """Builds a `denoise(img, noise_level) -> eps` closure whose UNet
    evaluation is tiled — a drop-in for the sampler loops in
    ucdir_tpu.diffusion.sampler (the >1024^2 branch of ucdir.py:295-300).

    denoiser: the DY3h module; params: its params subtree.
    """
    def denoise(img, noise_level):
        net_in = jnp.concatenate([x_cond, img], axis=-1)

        def fn(tiles, gtiles):
            k = tiles.shape[0]
            nl = jnp.broadcast_to(noise_level[:1], (k, noise_level.shape[1]))
            return denoiser.apply({'params': params}, tiles, nl, gtiles,
                                  method='naiveforward')

        return patch_forward_guide(fn, net_in, guide, skip=skip,
                                   padding=padding, tile_chunk=tile_chunk,
                                   data_axis=data_axis)
    return denoise
