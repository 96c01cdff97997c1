"""Tile-scoped GroupNorm(1) statistics for whole-image eval (VERDICT r4 #2).

The reference tiles every >1024^2 image through the denoiser
(/root/reference/model/ucdir.py:295-300 under utils/util.py:108-146), so each
GroupNorm(1) inside the net computes its mean/var over ONE ~1024px tile. The
TPU-first whole-image eval computes them over the full canvas — measurably
different statistics scope (PARITY.md quality table: 0.54 dB on the crop-128
toy at r4).

`UCDIR_TPU_GN_SCOPE=tile` reproduces the reference's effective scope inside
the seamless whole-image program: every GN(1) normalizes per ~(1024/k)^2
window of its feature map, where k = the feature map's downscale factor vs
the canvas (so a window always corresponds to a 1024px canvas tile;
`UCDIR_TPU_GN_TILE` overrides the 1024). Ragged edge windows use their true
pixel counts, mirroring the reference's edge tiles.

Scope plumbing: `DY3h.naiveforward` enters `gn_canvas(H, W)` (a no-op unless
the env knob is set), recording the canvas size at trace time; each norm site
asks `gn_tile_window(h, w)` whether to window. Maps that fit inside ~1.5
windows return None — there per-canvas == per-tile scope and the fused
folded-norm kernels keep running (this also keeps the reference-semantics
TILED path, whose per-call canvas is one 1152px tile, on its normal kernels
even with the knob set).

Default remains 'canvas' (the fast folded path); this mode exists so the
untiled-vs-tiled quality gap can be attributed and closed with data —
see tools/quality_ab.py leg F and QUALITY_r5.json.
"""
from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_CANVAS = [None]  # (H, W) of the /32-padded canvas during an eval trace


def gn_scope_mode() -> str:
    return os.environ.get('UCDIR_TPU_GN_SCOPE', 'canvas')


@contextlib.contextmanager
def gn_canvas(h: int, w: int):
    """Record the canvas size for the enclosed trace (no-op unless
    UCDIR_TPU_GN_SCOPE=tile)."""
    if gn_scope_mode() != 'tile':
        yield
        return
    old = _CANVAS[0]
    _CANVAS[0] = (int(h), int(w))
    try:
        yield
    finally:
        _CANVAS[0] = old


def gn_tile_window(h: int, w: int):
    """Window size (feature-map pixels per axis) for a GN(1) at feature size
    (h, w), or None when canvas scope applies (knob off, no canvas recorded,
    or the map fits within ~1.5 windows so the scopes coincide)."""
    if _CANVAS[0] is None or gn_scope_mode() != 'tile':
        return None
    ch, _cw = _CANVAS[0]
    k = max(1, round(ch / float(h)))
    win = max(1, int(os.environ.get('UCDIR_TPU_GN_TILE', '1024')) // k)
    if h <= (win * 3) // 2 and w <= (win * 3) // 2:
        return None
    return win


def tile_gn(x, scale, bias, win: int, eps: float = 1e-5):
    """GroupNorm(num_groups=1) with per-(win x win)-window statistics.

    x: (B, H, W, C); scale/bias: (C,). Stats in f32 over (win, win, C) per
    window; ragged bottom/right windows use their true element counts (the
    zero-padding contributes 0 to the sums and is excluded from the counts).
    Returns x normalized per window, in x.dtype.
    """
    B, H, W, C = x.shape
    ph, pw = (-H) % win, (-W) % win
    xf = x.astype(jnp.float32)
    if ph or pw:
        xf = jnp.pad(xf, ((0, 0), (0, ph), (0, pw), (0, 0)))
    nH, nW = (H + ph) // win, (W + pw) // win
    xr = xf.reshape(B, nH, win, nW, win, C)
    s = jnp.sum(xr, axis=(2, 4, 5))                        # (B, nH, nW)
    q = jnp.sum(xr * xr, axis=(2, 4, 5))
    cnt = (jnp.minimum(win, H - jnp.arange(nH) * win)[:, None]
           * jnp.minimum(win, W - jnp.arange(nW) * win)[None, :]
           ).astype(jnp.float32) * C                       # (nH, nW)
    mean = s / cnt
    var = q / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    m = mean[:, :, None, :, None, None]
    r = rstd[:, :, None, :, None, None]
    y = (xr - m) * r
    y = y.reshape(B, H + ph, W + pw, C)
    if ph or pw:
        y = y[:, :H, :W, :]
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
