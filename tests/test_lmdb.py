"""Pure-Python LMDB backend (data/lmdb_io.py + the LRHRDataset lmdb branch).

The `lmdb` C binding is absent from this image, so the reader/writer pair is
validated structurally (spec invariants: meta layout, sorted even-aligned
nodes, overflow page chains) and functionally (roundtrips across tree
depths, the reference key schema end-to-end through prepare_data --lmdb and
LRHRDataset(datatype='lmdb') — /root/reference/data/LRHR_dataset.py:144-206).
"""
import os
import struct

import numpy as np
import pytest

from ucdir_tpu.data.lmdb_io import (F_BIGDATA, MAGIC, P_BRANCH, P_INVALID,
                                    P_LEAF, P_META, P_OVERFLOW, PAGEHDRSZ,
                                    LmdbReader, write_lmdb, _DB, _META,
                                    _NODE, _PGHDR)


def _roundtrip(tmp_path, items, **kw):
    env = str(tmp_path / 'env')
    write_lmdb(env, items, **kw)
    with LmdbReader(env) as r:
        d = dict(items) if isinstance(items, dict) else dict(items)
        assert len(r) == len(d)
        for k, v in d.items():
            got = r.get(k)
            want = v.encode() if isinstance(v, str) else bytes(v)
            assert got == want, k
        assert r.get(b'\x00definitely-missing') is None
        assert r.get('zzzz-way-past-the-last-key') is None
        scanned = {bytes(k): bytes(v) for k, v in r.items()}
        assert len(scanned) == len(d)
        return r._main


def test_small_single_leaf(tmp_path):
    main = _roundtrip(tmp_path, {'a': 'alpha', 'b': 'beta', 'length': '2'})
    assert main[2] == 1           # depth: one leaf page
    assert main[3] == 0           # no branch pages


def test_multi_leaf_one_branch_level(tmp_path):
    rng = np.random.default_rng(0)
    items = {'k%05d' % i: bytes(rng.integers(0, 256, 200, dtype=np.uint8))
             for i in range(200)}
    main = _roundtrip(tmp_path, items)
    assert main[2] >= 2 and main[3] >= 1


def test_three_level_tree(tmp_path):
    # long keys force small leaf fan-out -> depth 3
    items = {('k' * 120 + '%06d' % i): ('v%d' % i) for i in range(3000)}
    main = _roundtrip(tmp_path, items)
    assert main[2] >= 3


def test_overflow_values(tmp_path):
    rng = np.random.default_rng(1)
    items = {'big%02d' % i:
             bytes(rng.integers(0, 256, 3000 + 4096 * i, dtype=np.uint8))
             for i in range(4)}
    items['small'] = b'tiny'
    main = _roundtrip(tmp_path, items)
    assert main[5] >= 4           # md_overflow_pages


def test_empty_env(tmp_path):
    env = str(tmp_path / 'env')
    write_lmdb(env, {})
    with LmdbReader(env) as r:
        assert len(r) == 0
        assert r.get('anything') is None
        assert list(r.items()) == []


def test_structural_invariants(tmp_path):
    """Walk every page of a written env and check the mdb.c layout rules the
    C library relies on (the cross-implementation contract)."""
    rng = np.random.default_rng(2)
    env = str(tmp_path / 'env')
    items = {'k%04d' % i: bytes(rng.integers(0, 256, 300, dtype=np.uint8))
             for i in range(150)}
    items['huge'] = bytes(rng.integers(0, 256, 9000, dtype=np.uint8))
    path = write_lmdb(env, items)
    raw = open(path, 'rb').read()
    psize = 4096
    assert len(raw) % psize == 0
    # both meta pages: magic/version, psize in FREE db md_pad, same root
    for base in (0, psize):
        pgno, _, flags, _, _ = _PGHDR.unpack_from(raw, base)
        assert flags == P_META and pgno == base // psize
        magic, version, _, _ = _META.unpack_from(raw, base + PAGEHDRSZ)
        assert magic == MAGIC and version == 1
        o = base + PAGEHDRSZ + _META.size
        free_db = _DB.unpack_from(raw, o)
        assert free_db[0] == psize and free_db[7] == P_INVALID
    main = _DB.unpack_from(raw, psize + PAGEHDRSZ + _META.size + _DB.size)
    n_branch, n_leaf, n_ovf, n_entries, root = main[3:8]
    assert n_entries == len(items) and root != P_INVALID
    seen = {'branch': 0, 'leaf': 0, 'ovf': 0}
    pg = 2
    while pg * psize < len(raw):
        base = pg * psize
        pgno, _, flags, lower, upper = _PGHDR.unpack_from(raw, base)
        assert pgno == pg
        if flags & P_OVERFLOW:
            npages = struct.unpack_from('<I', raw, base + 12)[0]
            seen['ovf'] += npages
            pg += npages
            continue
        assert flags in (P_BRANCH, P_LEAF)
        seen['branch' if flags == P_BRANCH else 'leaf'] += 1
        n = (lower - PAGEHDRSZ) >> 1
        assert PAGEHDRSZ + 2 * n == lower <= upper <= psize
        ptrs = struct.unpack_from('<%dH' % n, raw, base + PAGEHDRSZ)
        prev = None
        for off in ptrs:
            assert off % 2 == 0 and lower <= off < psize  # even-aligned
            lo, hi, nflags, ksize = _NODE.unpack_from(raw, base + off)
            key = raw[base + off + _NODE.size:
                      base + off + _NODE.size + ksize]
            if prev is not None:
                assert key > prev                          # sorted
            prev = key
            if flags == P_LEAF and nflags & F_BIGDATA:
                ovf = struct.unpack_from(
                    '<Q', raw, base + off + _NODE.size + ksize)[0]
                _, _, oflags, _, _ = _PGHDR.unpack_from(raw, ovf * psize)
                assert oflags & P_OVERFLOW
        pg += 1
    assert seen == {'branch': n_branch, 'leaf': n_leaf, 'ovf': n_ovf}


def test_lrhr_dataset_lmdb_end_to_end(tmp_path):
    """prepare_data --lmdb -> LRHRDataset(datatype='lmdb') with the
    reference key schema and the invalid-index resample loop."""
    from PIL import Image
    from ucdir_tpu.data.datasets import LRHRDataset
    from ucdir_tpu.data.prepare_data import prepare_lmdb
    src = tmp_path / 'src'
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
                        ).save(str(src / f'{i}.png'))
    env = str(tmp_path / 'env')
    prepare_lmdb(str(src), env, sizes=(8, 16), n_worker=1)

    ds = LRHRDataset(env, datatype='lmdb', l_resolution=8, r_resolution=16,
                     split='val', data_len=-1, need_LR=True)
    assert len(ds) == 3
    s = ds[1]
    assert s['HR'].shape == (16, 16, 3) and s['SR'].shape == (16, 16, 3)
    assert s['LR'].shape == (8, 8, 3)
    assert s['HR'].min() >= -1 and s['HR'].max() <= 1

    # invalid-index resample: length over-reported -> missing keys resample
    # to a valid pair instead of crashing (reference :197-206)
    from ucdir_tpu.data.lmdb_io import LmdbReader as R
    items = dict(R(env).items())
    items[b'length'] = b'5'
    env2 = str(tmp_path / 'env2')
    write_lmdb(env2, items)
    ds2 = LRHRDataset(env2, datatype='lmdb', l_resolution=8,
                      r_resolution=16, split='val')
    assert len(ds2) == 5
    s2 = ds2[4]                   # keys 00004 missing -> resampled
    assert s2['HR'].shape == (16, 16, 3)
