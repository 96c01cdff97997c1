"""Trace a model/op run on TPU and print the per-HLO-op time table.

Usage:
  python tools/trace_ops.py block_pallas|block_densified|model [size] [C]

Parses the xplane with xprof/tensorboard-plugin-profile (both in the image)
and prints top ops by self time — the tool VERDICT r1 asked for (profile-backed
perf claims instead of guesses).
"""
import sys, os, time, glob, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

TRACE_DIR = '/tmp/ucdir_trace'


def run_traced(fn, *args):
    out = fn(*args)                       # compile outside the trace
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return out


def print_op_table(top=25):
    paths = glob.glob(TRACE_DIR + '/**/*.xplane.pb', recursive=True)
    assert paths, 'no xplane written'
    from xprof.convert import raw_to_tool_data as rtd
    data = None
    for tool in ('hlo_op_stats', 'hlo_stats'):
        try:
            data, _ = rtd.xspace_to_tool_data(paths, tool, {})
            if data is not None:  # unknown tools return None, not raise
                break
        except Exception as e:
            err = e
    if data is None:
        raise RuntimeError('no xprof tool produced data (last err: %r)'
                           % (err if 'err' in dir() else None))
    if isinstance(data, bytes):
        data = data.decode('utf-8', 'replace')
    # hlo_stats arrives as gviz JSON-ish; fall back to raw dump on surprise
    try:
        rows = _gviz_rows(data)
    except Exception:
        print(data[:4000])
        return
    rows.sort(key=lambda r: -r['self_us'])
    tot = sum(r['self_us'] for r in rows)
    print('%-10s %6s  %s' % ('self_us', 'pct', 'op'))
    for r in rows[:top]:
        print('%-10.0f %5.1f%%  %s' % (r['self_us'], 100 * r['self_us'] / tot,
                                       r['name'][:110]))
    print('total accounted: %.0f us' % tot)


def _gviz_rows(data):
    obj = json.loads(data)
    cols = [c.get('label') or c.get('id') for c in obj['cols']]

    def col(*cands):
        for c in cands:
            for i, n in enumerate(cols):
                if n and c in n.lower():
                    return i
        raise KeyError(cands)
    i_name = col('hlo op name', 'op name', 'name')
    i_self = col('self time (us)', 'self-time', 'self time')
    try:
        i_cat = col('category')
    except KeyError:
        i_cat = None
    rows = []
    for r in obj['rows']:
        c = r['c']
        name = str(c[i_name]['v'])
        if i_cat is not None:
            name = '[%s] %s' % (c[i_cat]['v'], name)
        rows.append({'name': name, 'self_us': float(c[i_self]['v'] or 0)})
    return rows


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else 'block_densified'
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    N = 10

    if what.startswith('block'):
        from ucdir_tpu.models.akgm import ResnetBlockDY3h
        m = ResnetBlockDY3h(C, C, nl_emb_dim=64, norm_groups=1,
                            use_pallas=what.endswith('pallas'))
        x = jax.random.normal(key, (1, S, S, C), dt)
        t = jax.random.normal(key, (1, 64), dt)
        g = jax.random.normal(key, (1, S, S, 3), dt)
        v = jax.eval_shape(m.init, {'params': key}, x, t, g)
        v = jax.tree_util.tree_map(lambda a: jnp.full(a.shape, 0.01, dt), v)
        fn = jax.jit(lambda v, x, t, g: jax.lax.scan(
            lambda c, _: (m.apply(v, c, t, g), None), x, None, length=N)[0])
        run_traced(fn, v, x, t, g)
    elif what == 'model':
        from ucdir_tpu.models.dy3h import DY3h
        m = DY3h(in_channel=6, out_channel=3, inner_channel=64,
                 channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
                 dropout=0.0, norm_groups=1, image_size=128,
                 use_pallas=os.environ.get('UCDIR_TPU_PALLAS') == '1')
        xin = jax.random.normal(key, (1, S, S, 6), dt)
        nl = jnp.full((1, 1), 0.5, dt)
        gd = jax.random.normal(key, (1, S, S, 3), dt)
        v = jax.eval_shape(m.init, {'params': key, 'dropout': key}, xin, nl, gd)
        v = jax.tree_util.tree_map(
            lambda a: jax.random.normal(key, a.shape, dt) * 0.05, v)

        def f(v, x, nl, g):
            def step6(c, _):
                y = m.apply(v, c, nl, g)
                return jnp.concatenate([c[..., :3], y.astype(dt)], -1), None
            return jax.lax.scan(step6, x, None, length=N)[0]
        run_traced(jax.jit(f), v, xin, nl, gd)
    elif what == 'sid':
        # INTEGRATED SID eval segment: the real CLI program (resident tiled
        # sampler, bf16, 64-px pad) on a 3-step schedule — per-step op costs
        # match the 50-step production program, the trace stays small.
        from ucdir_tpu.config import parse
        from ucdir_tpu.models.factory import define_G
        from ucdir_tpu.schedule import make_schedule
        from ucdir_tpu.train.step import make_eval_step
        cfg = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'ucdir_tpu', 'configs', 'sid.yaml')
        opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                    make_dirs=False)
        module = define_G(opt, use_pallas=os.environ.get(
            'UCDIR_TPU_PALLAS', '1') == '1')
        so = dict(opt['model']['beta_schedule']['val'])
        so['n_timestep'] = 3
        sched = make_schedule(so)
        x0 = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32, -1, 1)
        v = jax.jit(module.init)({'params': key, 'dropout': key},
                                 {'HR': x0, 'SR': x0},
                                 jnp.ones((1, 1), jnp.float32) * 0.5,
                                 jnp.zeros_like(x0))
        h, w = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 \
            else (1424, 2128)
        x = jax.random.uniform(key, (1, h, w, 3), jnp.float32, -1, 1)
        ev = make_eval_step(module, sched, pad=64, compute_dtype=jnp.bfloat16)
        run_traced(lambda: ev(v, x, key))
    else:
        raise SystemExit('unknown target %s' % what)
    print_op_table()


if __name__ == '__main__':
    main()
