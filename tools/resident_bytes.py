"""Static communication audit of the tile-resident multi-chip exchange.

Builds the ResidentPlan at a given image size / tile geometry, applies the
ResidentSampler's device-major tile->chip mapping, and reports the EXACT
per-step cross-chip traffic of the shard_map+ppermute exchange
(parallel/resident.py:_comm_plan): bytes per device offset, the padded
ppermute buffer sizes actually transmitted, and a v5e ICI latency estimate.

This is the evidence behind PROFILE_r4's multi-chip single-image latency
row (VERDICT r3 item 7): per-step time on n chips ~= (tiles_per_chip x
measured per-tile UNet time) + exchange_bytes / ICI_bw. No TPU needed —
the plan is static python/numpy.

Usage: python tools/resident_bytes.py [H W] [skip padding] [n_chips...]
Defaults: 1424 2128, 1024 64, chips 2 3 6.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

from ucdir_tpu.parallel.resident import ResidentPlan, ResidentSampler

# v5e: 4 ICI links/chip at ~186 GB/s aggregate bidirectional per the public
# spec; the conservative planning number here is one link direction
ICI_BW = 45e9   # bytes/s, single-direction single-link planning figure


def audit(H, W, skip, padding, n_chips, b=1, C=3, bytes_per_el=4):
    # bytes_per_el=4: the resident scan carry is the f32 sampler state
    # (posterior math runs f32; only the UNet inputs are cast to bf16)
    plan = ResidentPlan(H, W, skip, padding)
    n = plan.n_tiles
    tpd = -(-n // n_chips)          # tiles per device (ceil)
    t_pad = tpd * n_chips

    # reuse the real mapping + comm plan without building a denoiser
    rs = object.__new__(ResidentSampler)
    rs.plan, rs.tile_chunk, rs.n_chunks = plan, n_chips, tpd
    rs.out_channels, rs.b, rs._comm = C, b, None
    rs.t_pad, rs.k = t_pad, tpd * b

    upd, local, offs, cross, sizes, pairs = rs._comm_plan()
    total_payload = 0
    total_wire = 0
    print('== %dx%d skip=%d pad=%d -> %d tiles on %d chips (%d/chip)' %
          (H, W, skip, padding, n, n_chips, tpd))
    for o, per_src, L, prs in zip(offs, cross, sizes, pairs):
        payload = sum((cp.src[1] - cp.src[0]) * (cp.src[3] - cp.src[2])
                      * C * b for d in range(n_chips) for cp in per_src[d])
        wire = L * len(prs)          # padded buffer x participating pairs
        total_payload += payload
        total_wire += wire
        print('  offset %+d: %2d sender(s), payload %.2f MB, wire %.2f MB '
              '(padded buf %.2f MB each)' %
              (o, len(prs), payload * bytes_per_el / 1e6,
               wire * bytes_per_el / 1e6, L * bytes_per_el / 1e6))
    n_local = sum(len(l) for l in local)
    n_cross = sum(len(per_src[d]) for per_src in cross
                  for d in range(n_chips))
    # ppermutes of different offsets can overlap on different links; the
    # serial bound below is the worst case (all on one link direction)
    t_ici = total_wire * bytes_per_el / ICI_BW
    print('  copies: %d local, %d cross-chip; payload %.2f MB/step, wire '
          '%.2f MB/step' % (n_local, n_cross,
                            total_payload * bytes_per_el / 1e6,
                            total_wire * bytes_per_el / 1e6))
    print('  ICI serial bound @ %.0f GB/s: %.3f ms/step' %
          (ICI_BW / 1e9, t_ici * 1e3))
    return t_ici


def main():
    args = [int(a) for a in sys.argv[1:]]
    H, W = (args[0], args[1]) if len(args) >= 2 else (1424, 2128)
    skip, padding = (args[2], args[3]) if len(args) >= 4 else (1024, 64)
    chips = args[4:] or [2, 3, 6]
    # eval-path geometry: the driver pads by 64 reflect before tiling
    Hp, Wp = H + 128, W + 128
    for nc in chips:
        audit(Hp, Wp, skip, padding, nc)


if __name__ == '__main__':
    main()
