"""Tile-resident reverse process (parallel/resident.py): geometry exactness
and bitwise parity with the reassembling path (VERDICT r2 item 1)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucdir_tpu.parallel.resident import ResidentPlan, resident_reverse
from ucdir_tpu.parallel import make_mesh
from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.schedule import make_schedule

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize('h,w,skip,pad', [
    (96, 96, 64, 16), (100, 140, 64, 16), (130, 130, 64, 16),
    (48, 56, 64, 8),  # image smaller than a tile: enlarged pre-pad
    (200, 330, 96, 16),
])
def test_plan_geometry_exact(h, w, skip, pad, rng):
    """extract -> materialize roundtrips; after arbitrary owned-region
    updates, exchange() reproduces extract(pad(materialize(tw))) exactly."""
    plan = ResidentPlan(h, w, skip, pad)
    s = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
    tw = plan.extract(s)
    assert np.array_equal(np.asarray(plan.materialize(tw)), np.asarray(s))

    def upd(t, cur, srect, wrect):
        r0, r1, c0, c1 = srect
        g = jnp.arange(r0, r1)[None, :, None, None] * 1000 + \
            jnp.arange(c0, c1)[None, None, :, None]
        return cur * 0.5 + g.astype(cur.dtype)

    tw2 = plan.update_owned(tw, upd)
    ref = plan.extract(plan.materialize(tw2))
    assert np.array_equal(np.asarray(plan.exchange(tw2)), np.asarray(ref))


def _tiny_sid_parts(rng, size=96):
    m = DY3h(in_channel=6, out_channel=3, inner_channel=8,
             channel_mults=(1, 2), attn_res=(), res_blocks=1,
             dropout=0.0, norm_groups=1, image_size=64)
    x = jnp.asarray(rng.standard_normal((1, size, size, 6)) * 0.3, jnp.float32)
    nl = jnp.full((1, 1), 0.5, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, size, size, 3)) * 0.3, jnp.float32)
    v = jax.jit(m.init)(KEY, x, nl, g)
    sched = make_schedule({'schedule': 'linear', 'n_timestep': 3,
                           'linear_start': 1e-6, 'linear_end': 0.4})
    return m, v['params'], sched


def _old_path_reverse(m, params, sched, x_cond, guide, key, skip, padding,
                      continous=False):
    """The round-2 reassembling implementation, for reference output."""
    from ucdir_tpu.parallel.tiled import tiled_denoise_fn
    from ucdir_tpu.diffusion.sampler import p_sample_loop
    tiled = tiled_denoise_fn(m, params, x_cond, guide,
                             skip=skip, padding=padding)
    return p_sample_loop(lambda img, nl: tiled(img, nl), x_cond, sched, key,
                         continous=continous)


@pytest.mark.parametrize('continous', [False, True])
def test_resident_matches_reassembling_bitwise(rng, continous):
    m, params, sched = _tiny_sid_parts(rng)
    x_cond = jnp.asarray(rng.standard_normal((1, 96, 96, 3)) * 0.2,
                         jnp.float32)
    guide = jnp.asarray(rng.standard_normal((1, 96, 96, 3)) * 0.2,
                        jnp.float32)
    key = jax.random.PRNGKey(7)

    old = jax.jit(lambda k: _old_path_reverse(
        m, params, sched, x_cond, guide, k, 64, 16, continous))(key)
    new = jax.jit(lambda k: resident_reverse(
        m, params, sched, x_cond, x_cond, guide, k, continous=continous,
        skip=64, padding=16))(key)

    if continous:
        np.testing.assert_allclose(np.asarray(new[0]), np.asarray(old[0]),
                                   rtol=0, atol=1e-6)
        assert new[1].shape == old[1].shape
        np.testing.assert_allclose(np.asarray(new[1]), np.asarray(old[1]),
                                   rtol=0, atol=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                                   rtol=0, atol=1e-6)


def test_resident_multichip_matches_single(rng):
    """tile_chunk=|mesh| with the state's tile axis sharded over 'data' must
    reproduce the single-chip result (the multi-chip serving layout)."""
    m, params, sched = _tiny_sid_parts(rng)
    x_cond = jnp.asarray(rng.standard_normal((1, 96, 96, 3)) * 0.2,
                         jnp.float32)
    guide = jnp.asarray(rng.standard_normal((1, 96, 96, 3)) * 0.2,
                        jnp.float32)
    key = jax.random.PRNGKey(3)

    single = jax.jit(lambda k: resident_reverse(
        m, params, sched, x_cond, x_cond, guide, k,
        skip=64, padding=16, tile_chunk=1))(key)
    mesh = make_mesh(8)
    with jax.set_mesh(mesh):
        multi = jax.jit(lambda k: resident_reverse(
            m, params, sched, x_cond, x_cond, guide, k,
            skip=64, padding=16, tile_chunk=8, data_axis='data'))(key)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               rtol=0, atol=1e-6)


def test_resident_mesh_comm_is_ppermute_only(rng):
    """VERDICT r3 item 1: the multi-chip exchange must be REAL — on an
    8-device mesh the partitioned HLO of a resident scan segment contains
    collective-permutes (the shard_map ppermute halo exchange) and NO
    all-gather/all-reduce/all-to-all. The reassembling path would all-gather
    the full latent every step; this proves the resident layout doesn't."""
    from ucdir_tpu.parallel.resident import (compiled_segment_text,
                                             assert_neighbor_comm)
    m, params, sched = _tiny_sid_parts(rng)
    x_cond = jnp.asarray(rng.standard_normal((1, 96, 96, 3)) * 0.2,
                         jnp.float32)
    mesh = make_mesh(8)
    with jax.set_mesh(mesh):
        txt = compiled_segment_text(m, params, sched, x_cond, x_cond, x_cond,
                                    jax.random.PRNGKey(0), skip=64,
                                    padding=16, tile_chunk=8,
                                    data_axis='data')
    assert_neighbor_comm(txt)


def test_segmented_runner_matches_single_scan(rng):
    """make_eval_step(seg_steps=N) (the CLI/bench path) must be bit-identical
    to the one-scan program on a tiled-size input."""
    from ucdir_tpu.train.step import make_eval_step
    from ucdir_tpu.diffusion.base import ResiGaussianGuideDY

    dy = DY3h(in_channel=6, out_channel=3, inner_channel=8,
              channel_mults=(1, 2), attn_res=(), res_blocks=1,
              dropout=0.0, norm_groups=1, image_size=64)
    module = ResiGaussianGuideDY(denoise_fn=dy)
    sr = jnp.asarray(rng.standard_normal((1, 40, 40, 3)) * 0.2, jnp.float32)
    nl = jnp.full((1, 1), 0.5, jnp.float32)
    v = jax.jit(module.init)({'params': KEY, 'dropout': KEY},
                             {'HR': sr, 'SR': sr}, nl, sr)
    sched = make_schedule({'schedule': 'linear', 'n_timestep': 3,
                           'linear_start': 1e-6, 'linear_end': 0.4})
    key = jax.random.PRNGKey(11)
    tile = {'skip': 64, 'padding': 16}

    one = make_eval_step(module, sched, pad=16, tile=tile)(v, sr, key)
    segd = make_eval_step(module, sched, pad=16, tile=tile,
                          seg_steps=2)(v, sr, key)
    for a, b in zip(one, segd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-6)
