"""Train-step tests: loss decreases, EMA gating, 8-device data-parallel mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.diffusion import ResiGaussianGuideDY
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.parallel import make_mesh
from ucdir_tpu.train import make_optimizer, create_train_state, make_train_step

KEY = jax.random.PRNGKey(0)
SCHED = make_schedule(dict(schedule='linear', n_timestep=10,
                           linear_start=1e-6, linear_end=1e-2))


def tiny_module():
    unet = DY3h(in_channel=6, out_channel=3, inner_channel=8,
                channel_mults=(1, 2), attn_res=(), res_blocks=1,
                dropout=0.0, norm_groups=1, image_size=16)
    return ResiGaussianGuideDY(denoise_fn=unet, image_size=16, channels=3)


def make_state(module, b=2, s=16, ema_opt=None):
    x_in = {'HR': jnp.zeros((b, s, s, 3)), 'SR': jnp.zeros((b, s, s, 3))}
    variables = jax.jit(module.init)(
        {'params': KEY, 'dropout': KEY}, x_in, jnp.ones((b, 1)) * 0.5,
        jnp.zeros((b, s, s, 3)))
    tx = make_optimizer({'type': 'adamw', 'lr': 1e-3})
    return create_train_state(variables['params'], tx, ema_opt)


def test_train_step_reduces_loss():
    module = tiny_module()
    state = make_state(module)
    step = make_train_step(module, SCHED)
    batch = {'HR': jnp.ones((2, 16, 16, 3)) * 0.3,
             'SR': jnp.ones((2, 16, 16, 3)) * 0.1}
    key = KEY
    losses = []
    for i in range(12):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
        losses.append(float(m['l_pix']))
    assert int(state.step) == 12
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_ema_gating():
    module = tiny_module()
    state = make_state(module, ema_opt={'use': True, 'ema_decay': 0.5,
                                        'step_start_ema': 3,
                                        'update_ema_every': 1})
    step = make_train_step(module, SCHED, donate=False)
    batch = {'HR': jnp.ones((2, 16, 16, 3)) * 0.3,
             'SR': jnp.zeros((2, 16, 16, 3))}
    p0 = jax.tree_util.tree_map(jnp.array, state.params)
    key = KEY
    # steps 1..3: the reference gate is step > start (pre-increment counter),
    # so EMA must stay at the initial weights for a few steps
    for i in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, batch, k)
    diff_ema = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.ema_params, p0)
    assert max(jax.tree_util.tree_leaves(diff_ema)) == 0.0
    diff_p = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, p0)
    assert max(jax.tree_util.tree_leaves(diff_p)) > 0.0
    # a few more steps: EMA moves
    for i in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, batch, k)
    diff_ema = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.ema_params, p0)
    assert max(jax.tree_util.tree_leaves(diff_ema)) > 0.0


def test_data_parallel_mesh_8dev():
    assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
    module = tiny_module()
    state = make_state(module, b=8)
    mesh = make_mesh(8)
    step = make_train_step(module, SCHED, mesh=mesh, donate=False)
    batch = {'HR': jnp.ones((8, 16, 16, 3)) * 0.3,
             'SR': jnp.zeros((8, 16, 16, 3))}
    state2, m = step(state, batch, KEY)
    assert np.isfinite(float(m['l_pix']))
    # sharded and unsharded paths agree
    step_local = make_train_step(module, SCHED, donate=False)
    state3, m3 = step_local(state, batch, KEY)
    np.testing.assert_allclose(float(m['l_pix']), float(m3['l_pix']),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(state2.params)[0]
    b = jax.tree_util.tree_leaves(state3.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize('kind', ['adamw', 'adam', 'lion'])
def test_optimizers_run(kind):
    module = tiny_module()
    x_in = {'HR': jnp.zeros((2, 16, 16, 3)), 'SR': jnp.zeros((2, 16, 16, 3))}
    variables = jax.jit(module.init)(
        {'params': KEY, 'dropout': KEY}, x_in, jnp.ones((2, 1)) * 0.5,
        jnp.zeros((2, 16, 16, 3)))
    tx = make_optimizer({'type': kind, 'lr': 1e-3}, clip_norm=1.0)
    state = create_train_state(variables['params'], tx, None)
    step = make_train_step(module, SCHED, donate=False)
    batch = {'HR': jnp.ones((2, 16, 16, 3)) * 0.3,
             'SR': jnp.zeros((2, 16, 16, 3))}
    state, m = step(state, batch, KEY)
    assert np.isfinite(float(m['l_pix']))


def test_checkpoint_save_restore_roundtrip(tmp_path):
    """orbax save/restore preserves params, EMA, optimizer state and step
    (reference resume semantics: model.py:252-259)."""
    from ucdir_tpu.utils.checkpoint import save_state, restore_state
    module = tiny_module()
    state = make_state(module)
    step = make_train_step(module, SCHED, donate=False)
    batch = {'HR': jnp.ones((2, 16, 16, 3)) * 0.3,
             'SR': jnp.zeros((2, 16, 16, 3))}
    key = KEY
    for i in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, batch, k)
    save_state(str(tmp_path), 'latest', state)

    fresh = make_state(module)
    restored = restore_state(str(tmp_path), fresh, tag='latest')
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues identically from the restored state
    key2, k = jax.random.split(key)
    s1, m1 = step(state, batch, k)
    s2, m2 = step(restored, batch, k)
    np.testing.assert_allclose(float(m1['l_pix']), float(m2['l_pix']),
                               rtol=1e-6)


def test_train_rng_identical_across_processes():
    """Multi-host SPMD contract (VERDICT r1 item 4): the jitted global-batch
    train step must receive an IDENTICAL key on every process — per-process
    keys inside the replicated step silently diverge params across hosts.
    Simulate two hosts by patching jax.process_index at Trainer construction
    and assert one optimizer step on identical data yields identical params."""
    from unittest import mock
    from ucdir_tpu.trainer import Trainer

    opt = {
        'phase': 'train', 'name': 'rngtest',
        'path': {'checkpoint': '/tmp/rngtest', 'resume_state': None},
        'datasets': {'train': {'batch_size': 2}},
        'model': {
            'which_model_G': 'ucdir', 'unet_name': 'DY3h',
            'diffusion_name': 'ResiGaussianGuideDY',
            'unet': {'in_channel': 6, 'out_channel': 3, 'inner_channel': 8,
                     'channel_mults': [1, 2], 'attn_res': [],
                     'res_blocks': 1, 'dropout': 0.0, 'norm_groups': 1},
            'beta_schedule': {
                'train': {'schedule': 'linear', 'n_timestep': 10,
                          'linear_start': 1e-6, 'linear_end': 1e-2},
                'val': {'schedule': 'linear', 'n_timestep': 5,
                        'linear_start': 1e-6, 'linear_end': 0.4}},
            'diffusion': {'image_size': 32, 'channels': 3,
                          'conditional': True}},
        'train': {'optimizer': {'type': 'adamw', 'lr': 1e-3},
                  'ema_scheduler': None},
    }
    data = {'HR': np.full((2, 32, 32, 3), 0.3, np.float32),
            'SR': np.zeros((2, 32, 32, 3), np.float32)}

    results = []
    for pid in (0, 3):
        with mock.patch('jax.process_index', return_value=pid):
            tr = Trainer(opt, seed=0)
            tr.feed_data(data)
            tr.optimize_parameters()
            results.append((tr.log_dict['l_pix'],
                            jax.tree_util.tree_leaves(tr.state.params)))
    assert results[0][0] == results[1][0]
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bucketed_eval_step():
    """bucketed sampler: odd-size input handled, interior matches exact-shape
    eval away from the padded border."""
    from ucdir_tpu.train.step import make_eval_step
    module = tiny_module()
    state = make_state(module)
    sched = SCHED
    f_exact = make_eval_step(module, sched, pad=8, bucket=0)
    f_bucket = make_eval_step(module, sched, pad=8, bucket=16)
    x = jax.random.normal(KEY, (1, 20, 28, 3))
    a, _ = f_exact({'params': state.params}, x, KEY)
    b, _ = f_bucket({'params': state.params}, x, KEY)
    assert a.shape == b.shape == (1, 20, 28, 3)
    assert np.isfinite(np.asarray(b)).all()


def test_finetune_norm_freezes_and_zeroes():
    """finetune_norm (reference model.py:62-77): selected params start at
    zero and move; everything else is hard-frozen."""
    from ucdir_tpu.train.optim import finetune_mask, zero_finetune_params
    module = tiny_module()
    x_in = {'HR': jnp.ones((2, 16, 16, 3)) * 0.3,
            'SR': jnp.zeros((2, 16, 16, 3))}
    variables = jax.jit(module.init)(
        {'params': KEY, 'dropout': KEY}, x_in, jnp.ones((2, 1)) * 0.5,
        jnp.zeros((2, 16, 16, 3)))
    mask = finetune_mask(variables['params'], 'final_conv')
    assert any(jax.tree_util.tree_leaves(mask))
    params = zero_finetune_params(variables['params'], mask)
    tx = make_optimizer({'type': 'adamw', 'lr': 1e-2}, mask=mask)
    state = create_train_state(params, tx, None)
    step = make_train_step(module, SCHED, donate=False)
    state2, _ = step(state, x_in, KEY)

    flat0 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(state2.params))
    maskf = dict(jax.tree_util.tree_leaves_with_path(mask))
    moved = frozen_moved = 0
    for path, p0 in flat0:
        p2, m = flat2[path], maskf[path]
        if m:
            assert float(jnp.max(jnp.abs(p0))) == 0.0  # zero-initialized
            moved += float(jnp.max(jnp.abs(p2 - p0))) > 0
        else:
            frozen_moved += float(jnp.max(jnp.abs(p2 - p0))) > 0
    assert moved > 0 and frozen_moved == 0

    with pytest.raises(ValueError, match='finetune_norm'):
        finetune_mask(variables['params'], 'transformer')


def test_segmented_eval_bit_identical():
    """seg_steps splits the reverse process into several device executions;
    the RNG stream, snapshot slots and math are shared with the single-scan
    program, so results must be bit-identical (incl. a non-dividing last
    segment)."""
    from ucdir_tpu.train.step import make_eval_step
    module = tiny_module()
    state = make_state(module)
    x = jax.random.normal(KEY, (1, 20, 24, 3))
    one = make_eval_step(module, SCHED, pad=8, continous=True)
    seg = make_eval_step(module, SCHED, pad=8, continous=True, seg_steps=4)
    a = one({'params': state.params}, x, KEY)
    b = seg({'params': state.params}, x, KEY)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
