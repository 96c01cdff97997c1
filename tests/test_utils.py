"""Small-utility coverage: color conversions, prefetcher, dist helpers,
registry, profiler timer."""
import numpy as np
import pytest

import jax.numpy as jnp

from ucdir_tpu.utils import color
from ucdir_tpu.utils.dist import get_dist_info, master_only
from ucdir_tpu.utils.registry import Registry
from ucdir_tpu.utils.profiler import StepTimer
from ucdir_tpu.data.prefetcher import DevicePrefetcher


def test_color_roundtrips(rng):
    rgb = jnp.asarray(rng.random((4, 4, 3)), jnp.float32)
    lin = color.srgb_to_linear(rgb)
    np.testing.assert_allclose(np.asarray(color.linear_to_srgb(lin)),
                               np.asarray(rgb), atol=1e-5)
    lab = color.rgb_to_lab(rgb)
    back = color.lab_to_rgb(lab)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-3)
    yuv = color.rgb_to_yuv(rgb)
    np.testing.assert_allclose(np.asarray(color.yuv_to_rgb(yuv)),
                               np.asarray(rgb), atol=1e-4)
    # pure gray has zero chroma
    gray = jnp.full((2, 2, 3), 0.5)
    assert float(jnp.max(jnp.abs(color.rgb_to_yuv(gray)[..., 1:]))) < 1e-5


def test_device_prefetcher_order():
    batches = [{'x': np.full((2, 2), i, np.float32)} for i in range(5)]
    pre = DevicePrefetcher(batches, depth=2)
    out = [float(b['x'][0, 0]) for b in pre]
    assert out == [0., 1., 2., 3., 4.]
    assert len(pre) == 5


def test_dist_info_single_process():
    rank, ws = get_dist_info()
    assert rank == 0 and ws == 1
    calls = []

    @master_only
    def record():
        calls.append(1)
        return 'ran'

    assert record() == 'ran'
    assert calls == [1]


def test_registry():
    reg = Registry('test')

    @reg.register()
    class Thing:
        pass

    assert reg.get('Thing') is Thing
    assert 'Thing' in reg
    with pytest.raises(KeyError):
        reg.get('Missing')
    with pytest.raises(AssertionError):
        reg.register(Thing)


def test_step_timer():
    import time
    t = StepTimer(alpha=1.0)
    with t:
        time.sleep(0.01)
    assert t.avg >= 0.01
    assert t.steps_per_sec > 0
